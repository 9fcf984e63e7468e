package graft.operators

import graft.SparkSpec

/** t38 — intra-document run-collapse: consecutive duplicate tokens
  * collapse to one occurrence, non-adjacent repeats survive, and
  * only changed documents are reported. */
class DerepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Seq[(Long, Long, Long, String)] =
    TextOps.derepetitionOf(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().toSeq

  test("collapses runs, keeps non-adjacent repeats, skips unchanged docs") {
    val out = run(
      (1L, "a a b b b c a"), // runs collapse; the final 'a' is not adjacent
      (2L, "x y z"),         // unchanged → not reported
      (3L, "go go go go"),   // one long run → one token
      (4L, "end end"))
    assert(out === Seq(
      (1L, 7L, 4L, "a b c a"),
      (3L, 4L, 1L, "go"),
      (4L, 2L, 1L, "end")))
  }

  test("a run at the very start collapses (the i=0 predecessor probe is safe)") {
    assert(run((1L, "dup dup rest")) === Seq((1L, 3L, 2L, "dup rest")))
  }

  test("fixture pass emits only strictly-shrinking rewrites") {
    val out = TextOps.t38Derepetition(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.nonEmpty) // the synthetic corpus stutters ("batch batch batch")
    out.foreach { case (_, nTok, nKept, clean) =>
      assert(nKept < nTok)
      assert(clean.split(" ").length.toLong === nKept)
      // idempotent: re-collapsing a collapsed text changes nothing
      assert(clean.split(" ").sliding(2).forall(w =>
        w.length < 2 || w(0) != w(1)))
    }
  }
}
