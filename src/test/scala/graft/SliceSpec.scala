package graft

import graft.streaming.Sinks
import org.apache.spark.sql.functions._

/** End-to-end slice (SURVEY.md §5 #4): DWS stats flow through the
  * warehouse sink (A27, with @TransientSink-style column dropping),
  * then the ADS layer answers queries from the WRITTEN stats dirs —
  * the reference's ClickHouse round-trip, parquet-backed. Plus the
  * routing DDL side-effect (A11's checkTable).
  */
class SliceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("stats sink → ADS query over the written warehouse dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dws").toString + "/visitor_stats"
    val stats = operators.DwsWindows.a20TumbleVisitor(spark, sf)
      .withColumn("userIdSet", array(lit(1L))) // agg-state column, must not be sunk
    Sinks.writeStatsBatch(stats, dir, transientCols = Seq("userIdSet"))

    val back = spark.read.parquet(dir)
    assert(!back.columns.contains("userIdSet"))

    // ADS B6 shape, answered from the sink output...
    def b6(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"is_new")
        .agg(sum($"uv_ct").as("uv"), sum($"pv_ct").as("pv"),
          sum($"sv_ct").as("sv"), sum($"uj_ct").as("uj"))
        .orderBy($"is_new")
        .collect().toSeq
    // ...must equal the same query over the pre-sink stats.
    val fromSink = b6(back)
    assert(fromSink === b6(operators.DwsWindows.a20TumbleVisitor(spark, sf)))

    // checkpoint-replay idempotence: re-writing the same batch must
    // not change the answer (dynamic partition overwrite).
    Sinks.writeStatsBatch(stats, dir, transientCols = Seq("userIdSet"))
    assert(b6(spark.read.parquet(dir)) === fromSink)
  }

  test("routing config DDL side-effect is created and idempotent") {
    operators.DwdOps.ensureSinkTables(spark)
    assert(spark.catalog.tableExists("dim_user"))
    val cols = spark.table("dim_user").columns
    assert(cols.head == "user_id") // sink_pk leads, per checkTable
    operators.DwdOps.ensureSinkTables(spark) // IF NOT EXISTS ⇒ no-op
    assert(spark.catalog.tableExists("dim_user"))
  }
}
