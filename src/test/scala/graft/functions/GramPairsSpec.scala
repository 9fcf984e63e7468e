package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{call_function, col, expr}

/** graft_gram_pairs: the fused adjacent-pair kernel must be
  * bit-identical to the HOF formulation it replaced
  * (`transform(sequence(0, size - 2), i -> struct(toks[i], toks[i+1]))`)
  * — the bigram-LM joins (t15/t22), Kneser-Ney counts (t31) and BPE
  * pair counts (t20/t26) key on exactly these rows. */
class GramPairsSpec extends SparkSpec {
  import spark.implicits._

  private def kernel(toksSql: String): Seq[(Option[String], Option[String])] =
    Seq(1).toDF("x")
      .select(call_function("graft_gram_pairs", expr(toksSql)).as("p"))
      .selectExpr("inline(p)")
      .as[(Option[String], Option[String])].collect().toSeq

  private def hof(toksSql: String): Seq[(Option[String], Option[String])] =
    Seq(1).toDF("x")
      .select(expr(
        s"transform(sequence(0, size($toksSql) - 2), " +
          s"i -> struct($toksSql[i] AS w1, $toksSql[i + 1] AS w2)) AS p"))
      .selectExpr("inline(p)")
      .as[(Option[String], Option[String])].collect().toSeq

  test("matches the HOF pair-for-pair, in order") {
    val toks = "array('a', 'b', 'c', 'd')"
    assert(kernel(toks) === hof(toks))
    assert(kernel(toks) === Seq(
      (Some("a"), Some("b")), (Some("b"), Some("c")), (Some("c"), Some("d"))))
  }

  test("null elements pass through as null FIELDS (struct semantics, not concat_ws)") {
    val toks = "array('a', CAST(NULL AS STRING), 'b')"
    assert(kernel(toks) === hof(toks))
    assert(kernel(toks) === Seq(
      (Some("a"), None), (None, Some("b"))))
  }

  test("fewer than 2 tokens → empty; null array → null; grouping over the kernel equals the HOF") {
    assert(kernel("array('only')") === Seq.empty)
    val r = Seq(1).toDF("x")
      .select(call_function("graft_gram_pairs",
        expr("CAST(NULL AS ARRAY<STRING>)")))
      .collect()(0)
    assert(r.isNullAt(0))
    // the production shape: explode + groupBy (w1, w2) counts agree
    val texts = Seq("a b a b c", "b c b c", "x")
    def counts(viaKernel: Boolean) = {
      val pairs =
        if (viaKernel) "graft_gram_pairs(toks)"
        else "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
      texts.toDF("text")
        .selectExpr("split(text, ' ') AS toks")
        .where("size(toks) >= 2")
        .selectExpr(s"explode($pairs) AS p")
        .groupBy(col("p.w1"), col("p.w2")).count()
        .as[(String, String, Long)].collect().sorted.toSeq
    }
    assert(counts(viaKernel = true) === counts(viaKernel = false))
  }
}
