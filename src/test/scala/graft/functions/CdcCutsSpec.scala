package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, col, expr, length, lit}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.unsafe.types.UTF8String

/** graft_cdc_cuts: the fused content-defined-chunking kernel must be
  * bit-identical to the four-HOF chain it replaced (window transform →
  * null/len filter → CDC_MIN predecessor-candidate thin → CDC_MAX
  * per-gap forced-cut fill over `graft_winhash60` output) — the c42
  * DuckDB oracle replays that exact formulation, so any divergence is
  * an oracle break, not a perf tweak. */
class CdcCutsSpec extends SparkSpec {
  import spark.implicits._

  /** The HOF formulation, verbatim from the pre-kernel chunkRowsOf. */
  private def hofCuts(texts: Seq[String], w: Int, div: Long,
      cmin: Int, cmax: Int): Seq[Seq[Int]] = {
    import org.apache.spark.sql.functions._
    val n = length(col("text"))
    val wins = call_function("graft_winhash60", col("text"), lit(w), lit(1))
    val cuts = filter(
      transform(wins, (h, i) => when(h % div === 0L, i + lit(w + 1))),
      c => c.isNotNull && c <= n)
    texts.toDF("text")
      .withColumn("cl0", cuts)
      .withColumn("cmin", filter(col("cl0"), (c, i) =>
        c - when(i === 0, lit(1)).otherwise(element_at(col("cl0"), i))
          >= cmin))
      .withColumn("posts", concat(array(lit(1)), col("cmin"), array(n + 1)))
      .withColumn("cl", array_sort(concat(col("cmin"), flatten(transform(
        slice(col("posts"), lit(1), size(col("posts")) - 1), (p, j) => {
          val q = element_at(col("posts"), j + 2)
          when(q - p > cmax, sequence(p + lit(cmax), q - 1, lit(cmax)))
            .otherwise(array().cast("array<int>"))
        })))))
      .select(col("cl")).as[Seq[Int]].collect().toSeq
  }

  private def kernelCuts(texts: Seq[String], w: Int, div: Long,
      cmin: Int, cmax: Int): Seq[Seq[Int]] =
    texts.toDF("text")
      .select(call_function("graft_cdc_cuts", col("text"),
        lit(w), lit(div), lit(cmin), lit(cmax)).as("cl"))
      .as[Seq[Int]].collect().toSeq

  private val corpus: Seq[String] = Seq(
    "", "a", "ab", "short text under the window width",
    "x" * 300, // low-entropy: every window hashes alike → forced cuts
    ("the quick brown fox jumps over the lazy dog. " * 20).trim,
    "наша сторінка üñïçødé ऐक्सेस 😀😀 mixed multi-byte text " * 8,
    Seq.tabulate(40)(i => s"paragraph $i with varied content ${i * 37}")
      .mkString("\n"))

  test("matches the HOF chain cut-for-cut at the c42 constants") {
    val (w, div, cmin, cmax) = (graft.operators.DedupOps.CDC_W,
      graft.operators.DedupOps.CDC_DIV, graft.operators.DedupOps.CDC_MIN,
      graft.operators.DedupOps.CDC_MAX)
    assert(kernelCuts(corpus, w, div, cmin, cmax) ===
      hofCuts(corpus, w, div, cmin, cmax))
  }

  test("matches the HOF chain across parameter corners (tiny windows, tight bounds)") {
    for ((w, div, cmin, cmax) <- Seq((2, 4L, 1, 8), (4, 2L, 3, 5),
        (8, 16L, 16, 64), (3, 1L, 2, 4))) // div=1: EVERY window cuts
      assert(kernelCuts(corpus, w, div, cmin, cmax) ===
        hofCuts(corpus, w, div, cmin, cmax),
        s"divergence at w=$w div=$div cmin=$cmin cmax=$cmax")
  }

  test("codegen and interpreted paths agree; null text is null") {
    val text = ("content defined chunking " * 30).trim
    val fromDf = kernelCuts(Seq(text), 16, 64L, 16, 256).head
    val interp = CdcCuts(Literal(UTF8String.fromString(text)),
      16, 64L, 16, 256)
      .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
    assert(interp === fromDf)
    val r = Seq(1).toDF("x")
      .select(call_function("graft_cdc_cuts",
        expr("CAST(NULL AS STRING)"), lit(16), lit(64L), lit(16), lit(256)))
      .collect()(0)
    assert(r.isNullAt(0))
    // SQL-text face resolves too (registered, not dead code)
    assert(spark.sql(
      "SELECT graft_cdc_cuts('x', 16, 64, 16, 256)").count() === 1L)
  }

  test("non-literal parameters are rejected loudly") {
    val e = intercept[Exception] {
      Seq(("abc", 4)).toDF("text", "w")
        .select(call_function("graft_cdc_cuts", col("text"),
          col("w"), lit(64L), lit(16), lit(256)))
        .collect()
    }
    assert(e.getMessage.contains("must be an int literal"))
  }
}
