package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{call_function, expr}

/** graft_scrub_spans: span-excision semantics at the expression
  * grain — empty starts, overlapping/unsorted/duplicate starts,
  * spans running past the end of the array, and a brute-force
  * parity check against the HOF formulation it replaced. */
class ScrubSpansSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(toksSql: String, startsSql: String, n: Int): Seq[String] =
    Seq(1).toDF("x")
      .select(call_function("graft_scrub_spans",
        expr(toksSql), expr(startsSql), expr(n.toString)).as("r"))
      .collect()(0).getSeq[String](0).toSeq

  test("no starts keeps everything; one span drops exactly [st, st+n)") {
    assert(scrub("array('a','b','c','d')", "CAST(array() AS ARRAY<INT>)", 2)
      === Seq("a", "b", "c", "d"))
    assert(scrub("array('a','b','c','d')", "array(1)", 2) === Seq("a", "d"))
    assert(scrub("CAST(array() AS ARRAY<STRING>)", "array(0)", 2) === Seq.empty)
  }

  test("overlapping, duplicate, and unsorted starts merge into one cover") {
    // spans [1,3) and [2,4) merge to [1,4); order and dups irrelevant
    assert(scrub("array('a','b','c','d','e')", "array(2,1,2)", 2) === Seq("a", "e"))
    // span past the end just truncates
    assert(scrub("array('a','b','c')", "array(2)", 8) === Seq("a", "b"))
    // full cover → empty result
    assert(scrub("array('a','b')", "array(0)", 2) === Seq.empty)
  }

  test("null starts elements are ignored; null tokens pass through uncovered") {
    assert(scrub("array('a','b','c')", "array(CAST(NULL AS INT), 1)", 1)
      === Seq("a", "c"))
    assert(scrub("array('a', CAST(NULL AS STRING), 'c')",
      "CAST(array() AS ARRAY<INT>)", 2) === Seq("a", null, "c"))
  }

  test("codegen path matches the interpreted path and the HOF formulation") {
    val toks = "array('t0','t1','t2','t3','t4','t5','t6','t7','t8','t9')"
    val starts = "array(7, 2, 3)"
    val n = 3
    val fromDf = scrub(toks, starts, n) // whole-stage codegen path
    val hof = Seq(1).toDF("x")
      .select(expr(
        s"transform(filter(sequence(0, size($toks) - 1), " +
          s"p -> NOT exists($starts, st -> st <= p AND p < st + $n)), " +
          s"p -> element_at($toks, p + 1)) AS r"))
      .collect()(0).getSeq[String](0).toSeq
    val interp = ScrubSpans(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        (0 to 9).map(i => s"t$i"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(7, 2, 3),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)),
      org.apache.spark.sql.catalyst.expressions.Literal(n))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType)
      .map(u => if (u == null) null else u.toString).toSeq
    assert(fromDf === Seq("t0", "t1", "t6")) // cover = [2,6) ∪ [7,10)
    assert(hof === fromDf)
    assert(interp === fromDf)
  }
}
