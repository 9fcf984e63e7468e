package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_pcm_stats on hand payloads: every statistic computed by
  * hand, plus the null/empty edges and codegen-vs-interpreted
  * agreement through the SQL registration. */
class PcmStatsSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(bytes: Array[Byte]): Seq[Long] = {
    Seq(Tuple1(bytes)).toDF("media")
      .select(call_function("graft_pcm_stats", $"media").as("st"))
      .as[Seq[Long]].collect().head
  }

  test("hand payload: counts, peak, and exact energy") {
    // samples 128 (dev 0, silent), 255 (dev 127, clip), 0 (dev 128,
    // clip), 130 (dev 2, silent), 200 (dev 72)
    val st = statsOf(Array(128, 255, 0, 130, 200).map(_.toByte))
    assert(st === Seq(5L, 2L, 2L, 128L,
      0L + 127L * 127 + 128L * 128 + 2L * 2 + 72L * 72))
  }

  test("silence band boundary: dev 15 silent, dev 16 not") {
    val st = statsOf(Array(128 + 15, 128 + 16, 128 - 15, 128 - 16).map(_.toByte))
    assert(st(1) === 2L) // exactly the two dev-15 samples
  }

  test("empty payload yields all-zero stats; null yields null") {
    assert(statsOf(Array.emptyByteArray) === Seq(0L, 0L, 0L, 0L, 0L))
    val n = Seq(Tuple1(null: Array[Byte])).toDF("media")
      .select(call_function("graft_pcm_stats", $"media").as("st"))
      .filter($"st".isNull).count()
    assert(n === 1L)
  }
}
