package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, expr}
import org.apache.spark.sql.types.{ArrayType, StringType}

/** graft_para_runs: the fused non-overlapping-run kernel must be
  * bit-identical to the HOF formulation it replaced
  * (`transform(sequence(0, ceil(size/p)-1),
  * i -> concat_ws(' ', slice(toks, i*p + 1, p)))`) — the DuckDB
  * oracle twins join the same run strings. */
class ParaRunsSpec extends SparkSpec {
  import spark.implicits._

  private def runs(toksSql: String, p: Int): Seq[String] =
    Seq(1).toDF("x")
      .select(call_function("graft_para_runs",
        expr(toksSql), expr(p.toString)).as("r"))
      .collect()(0).getSeq[String](0).toSeq

  private def hofRuns(toksSql: String, p: Int): Seq[String] =
    Seq(1).toDF("x")
      .select(expr(
        s"transform(sequence(0, CAST(ceil(size($toksSql) / ${p}.0) AS INT) - 1), " +
          s"i -> concat_ws(' ', slice($toksSql, i * $p + 1, $p))) AS r"))
      .collect()(0).getSeq[String](0).toSeq

  test("matches the HOF formulation run-for-run, in order, incl. trailing partial") {
    val toks = "array('a','b','c','d','e','f','g')"
    for (p <- Seq(1, 2, 3, 7, 10)) assert(runs(toks, p) === hofRuns(toks, p))
    assert(runs(toks, 3) === Seq("a b c", "d e f", "g"))
  }

  test("empty array gives NO runs (the phantom-run hazard the HOF guard existed for)") {
    assert(runs("CAST(array() AS ARRAY<STRING>)", 4) === Seq.empty)
  }

  test("null elements skip like concat_ws; null array is null") {
    assert(runs("array('a', CAST(NULL AS STRING), 'b')", 3) === Seq("a b"))
    assert(runs("array('a', CAST(NULL AS STRING), 'b')", 3) ===
      hofRuns("array('a', CAST(NULL AS STRING), 'b')", 3))
    val r = Seq(1).toDF("x")
      .select(call_function("graft_para_runs",
        expr("CAST(NULL AS ARRAY<STRING>)"), expr("4")).as("r"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("codegen and interpreted paths agree; long tokens grow the buffer") {
    val big = "x" * 300
    val fromDf = runs(s"array('$big','$big','y')", 2) // whole-stage codegen
    val interp = ParaRuns(
      Literal.create(Seq(big, big, "y"), ArrayType(StringType)),
      Literal(2))
      .eval(null).asInstanceOf[ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(_.toString).toSeq
    assert(fromDf === Seq(s"$big $big", "y"))
    assert(interp === fromDf)
  }
}
