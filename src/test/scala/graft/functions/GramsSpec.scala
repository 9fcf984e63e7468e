package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, expr}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** graft_grams: the fused string-shingle kernel must be bit-identical
  * to the HOF formulation it replaced
  * (`transform(sequence(0, size - n), i -> concat_ws(' ',
  * slice(toks, i + 1, n)))`) — t13's bigram frequency table and
  * t17's DSIR features key on these exact strings, and the DuckDB
  * oracles replay the HOF form. */
class GramsSpec extends SparkSpec {
  import spark.implicits._

  private def kernel(toksSql: String, n: Int): Seq[String] =
    Seq(1).toDF("x")
      .select(call_function("graft_grams",
        expr(toksSql), expr(n.toString)).as("g"))
      .collect()(0).getSeq[String](0).toSeq

  private def hof(toksSql: String, n: Int): Seq[String] =
    Seq(1).toDF("x")
      .select(expr(
        s"transform(sequence(0, size($toksSql) - $n), " +
          s"i -> concat_ws(' ', slice($toksSql, i + 1, $n))) AS g"))
      .collect()(0).getSeq[String](0).toSeq

  test("matches the HOF gram-for-gram across widths, incl. the split-artifact empty token") {
    // "" first element = what split('\\s+') yields on leading
    // whitespace — the gram must keep the leading space
    val toks = "array('', 'the', 'quick', 'brown', 'fox')"
    for (n <- Seq(1, 2, 3, 5)) assert(kernel(toks, n) === hof(toks, n),
      s"divergence at n=$n")
    assert(kernel(toks, 2) ===
      Seq(" the", "the quick", "quick brown", "brown fox"))
  }

  test("fewer than n tokens → empty; null elements skip like concat_ws; null array → null") {
    assert(kernel("array('a')", 2) === Seq.empty)
    val withNull = "array('a', CAST(NULL AS STRING), 'b')"
    assert(kernel(withNull, 2) === hof(withNull, 2))
    assert(kernel(withNull, 2) === Seq("a", "b")) // concat_ws skips nulls
    val r = Seq(1).toDF("x")
      .select(call_function("graft_grams",
        expr("CAST(NULL AS ARRAY<STRING>)"), expr("2")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("codegen and interpreted agree; multi-byte tokens keep their bytes") {
    val toks = "array('naïve', 'żółć', '😀emoji')"
    val fromDf = kernel(toks, 2)
    assert(fromDf === hof(toks, 2))
    val interp = Grams(
      Literal.create(Seq("naïve", "żółć", "😀emoji"),
        ArrayType(StringType)), Literal(2))
      .eval(null).asInstanceOf[ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(_.toString).toSeq
    assert(interp === fromDf)
  }

  test("bigram equivalence used by t17: concat(a, ' ', b) over split tokens") {
    // the production sites guard size >= 2 before the transform (the
    // HOF's sequence(0, size-2) is ill-formed below that)
    val texts = Seq("the quick brown fox", "  leading space",
      "a  b   c", "tab\tand\nnewline separators")
    val viaKernel = texts.toDF("text")
      .where("size(split(text, '\\\\s+')) >= 2")
      .selectExpr("graft_grams(split(text, '\\\\s+'), 2) AS g")
      .as[Seq[String]].collect().toSeq
    val viaConcat = texts.toDF("text")
      .where("size(split(text, '\\\\s+')) >= 2")
      .selectExpr("transform(sequence(0, size(split(text, '\\\\s+')) - 2), " +
        "i -> concat(split(text, '\\\\s+')[i], ' ', " +
        "split(text, '\\\\s+')[i + 1])) AS g")
      .as[Seq[String]].collect().toSeq
    assert(viaKernel === viaConcat)
    assert(viaKernel.nonEmpty && viaKernel.forall(_.nonEmpty))
  }
}
