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
}
