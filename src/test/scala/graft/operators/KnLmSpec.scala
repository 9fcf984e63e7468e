package graft.operators

import graft.SparkSpec

/** t31 Kneser–Ney bigram model on a hand corpus where every
  * sufficient statistic and the smoothed probability are computed by
  * hand (D = 0.75).
  *
  * Corpus: "a b a b", "a c" →
  *   c2: (a,b)=2 (b,a)=1 (a,c)=1; c1(a)=3 c1(b)=1;
  *   N1+(a,·)=2 N1+(b,·)=1; N1+(·,b)=1 N1+(·,a)=1 N1+(·,c)=1; B=3.
  */
class KnLmSpec extends SparkSpec {
  import spark.implicits._

  test("statistics and smoothed probabilities match the hand model") {
    val docs = Seq("a b a b", "a c").toDF("text")
    val got = TextOps.knLm(docs)
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().map(r => ((r._1, r._2), r)).toMap
    assert(got.keySet === Set(("a", "b"), ("b", "a"), ("a", "c")))
    val (_, _, c2ab, c1a, n1ra, n1lb, pab) = got(("a", "b"))
    assert((c2ab, c1a, n1ra, n1lb) === ((2L, 3L, 2L, 1L)))
    // P(b|a) = (max(2-.75,0) + .75·2·1/3) / 3 = 1.75/3
    assert(pab === (1.25 + 0.75 * 2.0 * 1.0 / 3.0) / 3.0)
    // P(a|b) = (.25 + .75·1·1/3) / 1 = 0.5
    assert(got(("b", "a"))._7 === 0.5)
    // P(c|a) = (.25 + .75·2·1/3) / 3 = 0.25
    assert(got(("a", "c"))._7 === 0.25)
  }

  test("conditional mass over observed continuations stays below 1") {
    val docs = Seq("x y", "x z", "x y", "y x").toDF("text")
    val sums = TextOps.knLm(docs)
      .groupBy($"w1").sum("p_kn")
      .as[(String, Double)].collect().toMap
    sums.values.foreach(s => assert(s > 0.0 && s <= 1.0))
  }

  test("bigram ranking is by raw count with (w1, w2) tie-break") {
    val docs = Seq("m n m n m n", "p q").toDF("text")
    val rows = TextOps.knLm(docs).select($"w1", $"w2", $"c2")
      .as[(String, String, Long)].collect().toSeq
    assert(rows.head === (("m", "n", 3L)))
    // ties (count 2 and 1 group) in lexical order
    assert(rows === rows.sortBy(r => (-r._3, r._1, r._2)))
  }
}
