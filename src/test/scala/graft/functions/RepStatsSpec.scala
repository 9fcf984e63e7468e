package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{call_function, expr}

/** graft_rep_stats: the fused t08 signal bundle must match the HOF
  * formulation it replaced — max token frequency, distinct counts,
  * and duplicate-adjacent-bigram counts, with the null-text → null
  * struct contract. */
class RepStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(toksSql: String): Row =
    Seq(1).toDF("x")
      .select(call_function("graft_rep_stats", expr(toksSql)).as("r"))
      .select("r.*").collect()(0)

  test("counts: n_tok, n_distinct, top frequency, bigram duplicates") {
    // "a b a b a": toks 5, distinct 2, top(a)=3, bigrams [ab,ba,ab,ba] → 2 dups
    assert(stats("array('a','b','a','b','a')") === Row(5L, 2L, 3L, 4L, 2L))
    // all distinct: no dup bigrams
    assert(stats("array('x','y','z')") === Row(3L, 3L, 1L, 2L, 0L))
    // single token: zero bigrams
    assert(stats("array('q')") === Row(1L, 1L, 1L, 0L, 0L))
    assert(stats("CAST(array() AS ARRAY<STRING>)") === Row(0L, 0L, 0L, 0L, 0L))
  }

  test("non-adjacent repeated bigram counts as duplicate; distinct pairs do not") {
    // "a b c a b": bigrams [a b, b c, c a, a b] → one duplicate
    assert(stats("array('a','b','c','a','b')") === Row(5L, 3L, 2L, 4L, 1L))
  }

  test("null array yields a null struct (null text contract)") {
    val r = Seq(1).toDF("x")
      .select(call_function("graft_rep_stats",
        expr("CAST(NULL AS ARRAY<STRING>)")).as("r"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("matches the HOF formulation on random-ish token arrays") {
    val arrays = Seq(
      "array('the','the','the','end')",
      "array('','a','','a','')", // empty-string tokens (leading-space splits)
      "array('p','q','p','q','p','q','p')")
    for (a <- arrays) {
      val hof = Seq(1).toDF("x").select(
        expr(s"size($a)").cast("long").as("n_tok"),
        expr(s"size(array_distinct($a))").cast("long").as("n_distinct"),
        expr(
          s"""aggregate(array_sort($a),
             |  struct('' AS prev, 0L AS run, 0L AS best),
             |  (acc, x) -> struct(x AS prev,
             |    CASE WHEN x = acc.prev THEN acc.run + 1L ELSE 1L END AS run,
             |    greatest(acc.best,
             |      CASE WHEN x = acc.prev THEN acc.run + 1L ELSE 1L END) AS best),
             |  acc -> acc.best)""".stripMargin).as("top_tok_ct"),
        expr(s"size($a) - 1").cast("long").as("n_bigram"),
        expr(
          s"""CAST(size($a) - 1 AS BIGINT) - CAST(size(array_distinct(
             |  transform(sequence(1, CAST(size($a) AS INT) - 1),
             |    i -> concat(element_at($a, i), ' ', element_at($a, i + 1)))))
             |  AS BIGINT)""".stripMargin).as("n_dup_bigram"))
        .collect()(0)
      assert(stats(a) === hof, s"for $a")
    }
  }

  test("interpreted path matches the codegen path") {
    // bigrams of r,r,s,r,s = [rr, rs, sr, rs] → one duplicate
    val toks = Seq("r", "r", "s", "r", "s")
    val interp = RepStats(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        toks,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
    assert((0 to 4).map(interp.getLong) === Seq(5L, 2L, 3L, 4L, 1L))
    assert(stats("array('r','r','s','r','s')") === Row(5L, 2L, 3L, 4L, 1L))
  }
}
