package graft.operators

import graft.SparkSpec
import graft.functions.H60
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** c19 within-corpus exact-substring pairs: the operator-level
  * contract — a guarantee-length (40-char) verbatim run between two
  * documents is always reported, unrelated documents are not, a
  * boilerplate run shared by many docs yields every pair
  * (output-proportional hot key, the c02-band-join bound), and
  * identical docs share their whole fingerprint set. */
class SubstringSelfdupSpec extends SparkSpec {
  import spark.implicits._

  private val G = DedupOps.SELF_W + DedupOps.SELF_K - 1 // 40

  private def randish(tag: String, n: Int): String =
    (0 until n).map(i =>
      ('a' + (H60.hash(UTF8String.fromString(s"$tag:$i")) % 26)).toChar).mkString

  private def pairs(docs: Seq[(Long, String)]): Map[(Long, Long), Long] =
    DedupOps.c19SubstringSelfdupOf(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("a 40-char shared run is reported; unrelated docs are not") {
    val shared = randish("run", G)
    val docs = Seq(
      1L -> s"${randish("a", 57)}$shared${randish("b", 23)}",
      2L -> s"${randish("c", 31)}$shared${randish("d", 49)}",
      3L -> randish("e", 160))
    val got = pairs(docs)
    assert(got.contains((1L, 2L)), "guarantee-length shared run missed")
    assert(got.keySet === Set((1L, 2L)), s"spurious pairs: ${got.keySet}")
  }

  test("a footer shared by 5 docs yields all 10 pairs") {
    val footer = randish("footer", 64)
    val docs = (1L to 5L).map(i => i -> s"${randish(s"body$i", 80)}$footer")
    val got = pairs(docs)
    val want = (for (a <- 1L to 5L; b <- a + 1 to 5L) yield (a, b)).toSet
    assert(got.keySet === want)
  }

  test("identical docs share every fingerprint; null/short text is inert") {
    val text = randish("twin", 200)
    val docs = Seq(1L -> text, 2L -> text, 3L -> null.asInstanceOf[String],
      4L -> randish("tiny", DedupOps.SELF_W - 1))
    val got = pairs(docs)
    assert(got.keySet === Set((1L, 2L)))
    // both sides fingerprint identically, so n_shared = |fp set|
    val fpCount = Seq(1L -> text).toDF("doc_id", "text")
      .select(explode(array_distinct(call_function("graft_slidemin",
        call_function("graft_winhash60", col("text"),
          lit(DedupOps.SELF_W), lit(1)), lit(DedupOps.SELF_K)))))
      .count()
    assert(got((1L, 2L)) === fpCount)
  }

  test("c19b dup_frac: identical docs score 1.0, a unique doc scores 0") {
    val twin = randish("twin", 200)
    val docs = Seq(1L -> twin, 2L -> twin, 3L -> randish("solo", 200))
    val got = DedupOps.c19bSubstringDupfracOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) === 1.0 && got(2L) === 1.0,
      "every fingerprint of an identical pair is shared")
    assert(got(3L) === 0.0, "a unique doc must score 0")
  }
}
