package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{call_function, expr}

/** graft_gram_h60: fused n-gram hashing must be bit-identical to the
  * HOF formulation it replaced (`transform(sequence(0, size - n),
  * i -> graft_h60(concat_ws(' ', slice(toks, i + 1, n))))`) — the
  * DuckDB oracle twins hash the same concatenated gram strings. */
class GramH60Spec extends SparkSpec {
  import spark.implicits._

  private def grams(toksSql: String, n: Int): Seq[Long] =
    Seq(1).toDF("x")
      .select(call_function("graft_gram_h60",
        expr(toksSql), expr(n.toString)).as("r"))
      .collect()(0).getSeq[Long](0).toSeq

  private def hofGrams(toksSql: String, n: Int): Seq[Long] =
    Seq(1).toDF("x")
      .select(expr(
        s"transform(sequence(0, size($toksSql) - $n), " +
          s"i -> graft_h60(concat_ws(' ', slice($toksSql, i + 1, $n)))) AS r"))
      .collect()(0).getSeq[Long](0).toSeq

  test("matches the HOF formulation gram-for-gram, in order") {
    val toks = "array('the','quick','brown','fox','jumps','over','lazy','dog','x')"
    for (n <- Seq(1, 2, 3, 8)) assert(grams(toks, n) === hofGrams(toks, n))
  }

  test("single gram equals graft_h60 of the joined string") {
    val one = Seq(1).toDF("x")
      .select(call_function("graft_h60", expr("'a b c'")).as("h"))
      .collect()(0).getLong(0)
    assert(grams("array('a','b','c')", 3) === Seq(one))
    assert(grams("array('a','b','c')", 3).head === H60.hashString("a b c"))
  }

  test("fewer than n tokens gives an empty array; nulls skip like concat_ws") {
    assert(grams("array('a','b')", 3) === Seq.empty)
    assert(grams("CAST(array() AS ARRAY<STRING>)", 2) === Seq.empty)
    // concat_ws(' ', ['a', NULL, 'b']) = 'a b' — null skipped, one sep
    assert(grams("array('a', CAST(NULL AS STRING), 'b')", 3)
      === Seq(H60.hashString("a b")))
    assert(grams("array('a', CAST(NULL AS STRING), 'b')", 3)
      === hofGrams("array('a', CAST(NULL AS STRING), 'b')", 3))
  }

  test("codegen and interpreted paths agree; long tokens grow the buffer") {
    val big = "x" * 200
    val toksSql = s"array('$big','$big','y')"
    val fromDf = grams(toksSql, 2) // whole-stage codegen
    val interp = GramH60(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(big, big, "y"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(2))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(fromDf === Seq(H60.hashString(s"$big $big"), H60.hashString(s"$big y")))
    assert(interp === fromDf)
  }
}
