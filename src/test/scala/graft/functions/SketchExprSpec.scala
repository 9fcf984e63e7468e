package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The three native sketch expressions (graft_simhash60,
  * graft_minhash60, graft_winnow60) against their built-in/relational
  * twins over real document text — the same equivalences that pin the
  * DuckDB oracle's relational form to the one-pass Spark plans. */
class SketchExprSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("simhash60 equals the relational tf-weighted pipeline") {
    val expected = docs
      .select($"doc_id", explode(split($"text", "\\s+")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("freq"))
      .withColumn("h", Portable.h60($"tok"))
      .groupBy($"doc_id")
      .agg((0 until 60).map(j =>
        sum($"freq" * (shiftright($"h", j).bitwiseAND(1) * 2 - 1)).as(s"s$j")).head,
        (0 until 60).map(j =>
          sum($"freq" * (shiftright($"h", j).bitwiseAND(1) * 2 - 1)).as(s"s$j")).tail: _*)
      .select($"doc_id", (0 until 60).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _).as("fp"))
    val native = docs.select($"doc_id", Portable.simhash60($"text").as("fp"))
    assert(native.join(expected, "doc_id")
      .filter(native("fp") =!= expected("fp")).count() === 0L)
  }

  test("simhash60 keeps Spark's split semantics (trailing empties, empty text)") {
    val weird = Seq("", "  ", "a", "a  b ", "的 是 的").toDF("text")
    val viaExpr = weird.select(Portable.simhash60($"text")).as[Long].collect()
    val direct = weird.as[String].collect().map(SimHash60.fingerprintString)
    assert(viaExpr.toSeq === direct.toSeq)
  }

  test("minhash60 equals per-hash MIN over the exploded distinct shingles") {
    val sh = docs
      .withColumn("toks", split($"text", "\\s+"))
      .where(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))"))
        .as("sh"))
      .distinct()
    val k = MinHash60.K
    val mins = sh
      .withColumn("hm", Portable.h60($"sh") % MinHash60.P)
      .groupBy($"doc_id")
      .agg(
        (0 until k).map(i =>
          min(($"hm" * MinHash60.A(i) + MinHash60.B(i)) % MinHash60.P).as(s"m$i")).head,
        (0 until k).map(i =>
          min(($"hm" * MinHash60.A(i) + MinHash60.B(i)) % MinHash60.P).as(s"m$i")).tail: _*)
    val native = docs
      .withColumn("toks", split($"text", "\\s+"))
      .where(size($"toks") >= 3)
      .select($"doc_id", call_function("graft_minhash60", expr(
        "array_distinct(transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3))))"))
        .as("ms"))
    val joined = native.join(mins, "doc_id")
    val bad = (0 until k).map(i =>
      joined.filter(col("ms").getItem(i) =!= col(s"m$i")).count()).sum
    assert(bad === 0L)
  }

  test("minhash60 over pre-hashed longs equals the string form") {
    val arrs = docs
      .withColumn("toks", split($"text", "\\s+"))
      .where(size($"toks") >= 3)
      .select($"doc_id",
        expr("array_distinct(transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3))))")
          .as("strs"))
      .withColumn("hs", expr("transform(strs, x -> graft_h60(x))"))
    val bad = arrs.select(
      call_function("graft_minhash60", $"strs").as("a"),
      call_function("graft_minhash60", $"hs").as("b"))
      .filter($"a" =!= $"b").count()
    assert(bad === 0L)
  }

  test("winnow60 equals the HOF sliding-window form incl. multi-byte text") {
    val hof = expr(
      """array_min(transform(sequence(1, int(greatest(length(text) - 7, 1))),
        |  i -> graft_h60(substring(text, i, 8))))""".stripMargin)
    val mismatch = docs
      .select(call_function("graft_winnow60", $"text").as("native"), hof.as("builtin"))
      .filter($"native" =!= $"builtin").count()
    assert(mismatch === 0L)
    val edge = Seq("", "short", "exactly8", "的是在了和的是在了和", "nine char").toDF("text")
    assert(edge
      .select(call_function("graft_winnow60", $"text").as("native"), hof.as("builtin"))
      .filter($"native" =!= $"builtin").count() === 0L)
  }
}
