package graft.operators

import graft.SparkSpec

/** t15 bigram-LM scoring: in-distribution text outscores shuffled
  * and unseen text, and the add-one smoothing floor is exact. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("predictable text outscores noise; smoothing floor is exact") {
    val ref = Seq.tabulate(20)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val target = Seq(
      (100L, "the quick brown fox"),    // in-distribution bigrams
      (101L, "fox the over dog quick"), // known words, unseen bigrams
      (102L, "zz yy xx ww"))            // fully out-of-vocabulary
      .toDF("doc_id", "text")
    val got = TextOps.lmScore(ref, target)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(got(100L)._2 > got(101L)._2,
      "in-distribution text must outscore shuffled text")
    assert(got(100L)._2 > got(102L)._2,
      "in-distribution text must outscore out-of-vocabulary text")
    // Known first-word + unseen continuation is PENALIZED BELOW the
    // pure-OOV floor (the c1 mass in the denominator says "this word
    // has many observed continuations and yours is not one of them")
    assert(got(101L)._2 < got(102L)._2)
    // exact floor: V = 8 distinct ref words; every OOV bigram gets
    // q = (0+1)*2^30 div (0+8), so the mean is exactly 1/8
    assert(got(102L) === ((3L, 0.125)))
  }

  test("empty reference corpus: smoothing ceiling 1.0, not divide-by-zero") {
    // v = 0 and c1 null for every bigram — the greatest(..., 1) guard
    // makes each q exactly 2^30 (score 1.0) instead of a 0 denominator
    // (null rows, or an ANSI error)
    val ref = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val target = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = TextOps.lmScore(ref, target)
      .as[(Long, Long, Double)].collect()
    assert(got === Array((1L, 2L, 1.0)))
  }

  test("OOV first word scores exactly 1/v — c1 mass absent, only smoothing") {
    val ref = Seq.tabulate(5)(i => (i.toLong, "aa bb")).toDF("doc_id", "text")
    // w1 = 'zz' is out-of-vocabulary: c1 null, c2 null, v = 2
    val target = Seq((7L, "zz bb")).toDF("doc_id", "text")
    val got = TextOps.lmScore(ref, target).as[(Long, Long, Double)].collect()
    assert(got === Array((7L, 1L, 0.5)))
  }
}
