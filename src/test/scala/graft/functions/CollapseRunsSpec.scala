package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{call_function, expr}

/** graft_collapse_runs: adjacent-run collapse semantics at the
  * expression grain — empty/singleton arrays, null-run collapse
  * (the `<=>` contract), and non-adjacent repeats preserved. */
class CollapseRunsSpec extends SparkSpec {
  import spark.implicits._

  private def collapse(arraySql: String): Seq[String] =
    Seq(1).toDF("x")
      .select(call_function("graft_collapse_runs", expr(arraySql)).as("r"))
      .collect()(0).getSeq[String](0).toSeq

  test("runs collapse to their first element; non-adjacent repeats survive") {
    assert(collapse("array('a','a','a','b','a')") === Seq("a", "b", "a"))
    assert(collapse("array('x')") === Seq("x"))
    assert(collapse("CAST(array() AS ARRAY<STRING>)") === Seq.empty)
  }

  test("null runs collapse null-safely, mirroring the <=> formulation") {
    assert(collapse("array('a', CAST(NULL AS STRING), CAST(NULL AS STRING), 'a')")
      === Seq("a", null, "a"))
    assert(collapse("array(CAST(NULL AS STRING), 'a', 'a')") === Seq(null, "a"))
  }

  test("codegen and interpreted paths agree") {
    val arr = "array('q','q','r','r','r','q','','','s')"
    val fromDf = collapse(arr) // whole-stage codegen path
    val interp = CollapseRuns(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("q", "q", "r", "r", "r", "q", "", "", "s"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType)
      .map(u => if (u == null) null else u.toString).toSeq
    assert(fromDf === Seq("q", "r", "q", "", "s"))
    assert(interp === fromDf)
  }
}
