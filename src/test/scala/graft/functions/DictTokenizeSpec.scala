package graft.functions

import graft.SparkSpec

/** The dictionary-tokenizer Generator (A24): phrase merge, positions,
  * null/edge handling, and availability through the SQL function
  * registered by GraftExtensions. */
class DictTokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def tokenize(text: String): Seq[(String, Long)] =
    Seq(text).toDF("t")
      .selectExpr("graft_tokenize(t) AS (token, pos)")
      .as[(String, Long)].collect().toSeq

  test("plain tokens pass through with consecutive positions") {
    assert(tokenize("fast row scan") ===
      Seq(("fast", 0L), ("row", 1L), ("scan", 2L)))
  }

  test("dictionary pairs merge and consume both tokens") {
    assert(tokenize("big hash join now") ===
      Seq(("big", 0L), ("hash_join", 1L), ("now", 2L)))
  }

  test("greedy left-to-right: first match wins, no overlap") {
    // "table table scan": first pair not a phrase, second is
    assert(tokenize("table table scan") ===
      Seq(("table", 0L), ("table_scan", 1L)))
    // phrase tail cannot start a phrase (dict invariant) — chain stops
    assert(tokenize("hash join join") ===
      Seq(("hash_join", 0L), ("join", 1L)))
  }

  test("whitespace runs and empties are dropped; null yields no rows") {
    assert(tokenize("  fast   scan  ") === Seq(("fast", 0L), ("scan", 1L)))
    val n = Seq[Option[String]](None).toDF("t")
      .selectExpr("graft_tokenize(t) AS (token, pos)").count()
    assert(n === 0L)
  }

  test("dict invariant holds: phrase heads and tails are disjoint") {
    val heads = DictTokenize.phrases.map(_._1)
    val tails = DictTokenize.phrases.map(_._2)
    assert(heads.intersect(tails).isEmpty)
  }
}
