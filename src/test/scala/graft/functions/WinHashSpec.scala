package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** graft_winhash60 (the c16 primitive): equivalence with the
  * built-in HOF form, code-point window semantics on multi-byte
  * text, and the stride guarantee exact-substring detection rests
  * on: a shared run of W+s−1 characters ALWAYS aligns some
  * corpus-strided window with an eval window, whatever the offset. */
class WinHashSpec extends SparkSpec {
  import spark.implicits._

  private def strided(text: String, w: Int, s: Int): Seq[Long] =
    WinHash60.hashes(UTF8String.fromString(text), w, s)
      .toLongArray().toSeq

  test("native strided hashes equal the built-in HOF form") {
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].take(30).toSeq :+
      "中文多字节窗口口径与 substr 一致 abc def ghi jkl mno pqr" :+
      "short"
    val df = texts.toDF("text")
    val got = df.select(call_function("graft_winhash60",
      col("text"), lit(8), lit(3)).as("h")).as[Seq[Long]].collect()
    val want = df.selectExpr(
      """CASE WHEN length(text) >= 8 THEN
        |  transform(sequence(1, length(text) - 7, 3),
        |    i -> graft_h60(substring(text, i, 8)))
        |ELSE array() END AS h""".stripMargin)
      .as[Seq[Long]].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("windows count code points: len < w yields empty, exact w yields one") {
    assert(strided("ab", 3, 1).isEmpty)
    assert(strided("多字节", 3, 1).size === 1)
    assert(strided("abcd", 4, 8).size === 1)
  }

  test("a W+s-1 shared run is detected at EVERY alignment; W+s-2 can miss") {
    val (w, s) = (40, 8)
    def randish(tag: String, n: Int): String =
      (0 until n).map(i => ('a' + (H60.hash(UTF8String.fromString(s"$tag:$i")) % 26)).toChar).mkString
    val sharedHit = randish("hit", w + s - 1)
    val sharedMiss = randish("miss", w + s - 2)
    val evalHit = s"${randish("e1", 13)}$sharedHit${randish("e2", 9)}"
    val evalMiss = s"${randish("e1", 13)}$sharedMiss${randish("e2", 9)}"
    val hitAll = strided(evalHit, w, 1).toSet
    val missAll = strided(evalMiss, w, 1).toSet
    val misses = (0 until 2 * s).count { off =>
      val corpus = s"${randish("c", off)}$sharedMiss${randish("t", 11)}"
      strided(corpus, w, s).toSet.intersect(missAll).isEmpty
    }
    (0 until 2 * s).foreach { off =>
      val corpus = s"${randish("c", off)}$sharedHit${randish("t", 11)}"
      assert(strided(corpus, w, s).toSet.intersect(hitAll).nonEmpty,
        s"guarantee-length run missed at offset $off")
    }
    assert(misses > 0,
      "below the guarantee length at least one alignment should miss " +
        "(otherwise the stride guarantee is vacuous at this fixture)")
  }
}
