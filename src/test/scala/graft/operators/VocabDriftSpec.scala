package graft.operators

import graft.SparkSpec

/** t32 vocabulary drift on a hand corpus: exact cross-multiplied
  * drift ranking, both shares, and the one-sided-token edges.
  *
  * Snapshot A = even doc_id, B = odd. Fixture:
  *   doc 0 (A): "x x y"   doc 2 (A): "x z"
  *   doc 1 (B): "y y z"
  * → cA: x=3, y=1, z=1 (totA 5); cB: y=2, z=1 (totB 3).
  */
class VocabDriftSpec extends SparkSpec {
  import spark.implicits._

  test("drift = |cA·totB − cB·totA| ranks exactly; shares divide") {
    val docs = Seq((0L, "x x y"), (1L, "y y z"), (2L, "x z"))
      .toDF("doc_id", "text")
    val got = TextOps.vocabDrift(docs)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // drift: x = |3·3 − 0·5| = 9, y = |1·3 − 2·5| = 7, z = |3 − 5| = 2
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ===
      Seq(("x", 3L, 0L, 9L), ("y", 1L, 2L, 7L), ("z", 1L, 1L, 2L)))
    val x = got.head
    assert(x._5 === 3.0 / 5.0 && x._6 === 0.0)
  }

  test("a token present in only one snapshot gets full-share drift") {
    val docs = Seq((0L, "only_a"), (1L, "only_b")).toDF("doc_id", "text")
    val got = TextOps.vocabDrift(docs)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("only_a")._4 === 1L) // |1·1 − 0·1|
    assert(got("only_a")._5 === 1.0 && got("only_a")._6 === 0.0)
    assert(got("only_b")._5 === 0.0 && got("only_b")._6 === 1.0)
  }
}
