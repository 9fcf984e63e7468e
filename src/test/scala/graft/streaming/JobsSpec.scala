package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The full reference pipeline, job-wired: raw JSON log lines →
  * BaseLogApp twin (parse, dirty side-channel, is_new repair, 3-way
  * split, per-topic dirs) → VisitorStatsApp twin (measures, 10s
  * tumble, stats dir) → ADS read — all through streaming execution
  * with AvailableNow triggers, asserted against hand-derived facts
  * and batch parity. */
class JobsSpec extends SparkSpec {
  import spark.implicits._

  // t0 = 2024-01-01T00:00:00Z, epoch ms
  private val t0 = 1704067200000L
  private val day2 = t0 + 86400000L

  // FIXTURES.md §1 lines: mid_a claims is_new=1 on two dates (repair
  // flips day 2); mid_b entry (sv); displays fan out; one start
  // record; one dirty row; a far-future sentinel page view pushes the
  // event-time watermark past every earlier window so Append emits
  // them (its own window stays open and is excluded below).
  private val cutoff = "2024-01-02 00:00:20"
  private val lines = Seq(
    s"""{"common":{"mid":"mid_a","is_new":"1"},"page":{"page_id":"home","last_page_id":"","during_time":1000},"ts":$t0}""",
    s"""{"common":{"mid":"mid_a","is_new":"1"},"page":{"page_id":"good_detail","last_page_id":"home","during_time":2000},"displays":[{"display_type":"promo","item":"sku1","item_type":"sku_id","order":1},{"display_type":"rec","item":"sku2","item_type":"sku_id","order":2}],"ts":${t0 + 5000}}""",
    s"""{"common":{"mid":"mid_a","is_new":"1"},"page":{"page_id":"home","last_page_id":"","during_time":3000},"ts":$day2}""",
    s"""{"common":{"mid":"mid_b","is_new":"0"},"page":{"page_id":"home","last_page_id":"","during_time":4000},"ts":${t0 + 12000}}""",
    s"""{"common":{"mid":"mid_c"},"start":{"entry":"icon"},"ts":${t0 + 3000}}""",
    """this line is not json""",
    s"""{"common":{"mid":"mid_z","is_new":"0"},"page":{"page_id":"home","last_page_id":"x","during_time":1},"ts":${day2 + 3600000}}""")

  /** Batch twin of the whole DWD+DWS pipeline over the same lines. */
  private def batchStats = {
    val parsed = spark.read.schema(Sources.logSchema)
      .json(spark.createDataset(lines))
      .filter($"common".isNotNull) // dirty rows out, as parseWithDirty does
    val page = Jobs.splitLog(parsed)._2
    Jobs.visitorStats10s(Jobs.visitorMeasures(
      Jobs.repairIsNew(spark, Jobs.toPageLog(spark, page))))
  }

  test("BaseLogApp twin → VisitorStats twin → ADS, streaming end-to-end") {
    val root = java.nio.file.Files.createTempDirectory("jobs").toString
    val inDir = s"$root/ods_base_log"
    new java.io.File(inDir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$inDir/part-0.txt"),
      lines.mkString("\n").getBytes)

    // ---- BaseLogApp twin: three streaming queries off one source ----
    val rawText = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .format("text").load(inDir)
    val (clean, dirty) = Sources.parseWithDirty(rawText, Sources.logSchema)

    // stateless split of start/display topics per micro-batch
    val qSplit = clean.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_split")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (start, _, displays) = Jobs.splitLog(batch)
        start.select(col("common")("mid").as("mid"), col("ts"))
          .write.mode("append").parquet(s"$root/dwd_start_log")
        displays.write.mode("append").parquet(s"$root/dwd_display_log")
      }.start()
    // stateful is_new repair ON THE STREAM (state survives batches)
    val repaired = Jobs.repairIsNew(spark,
      Jobs.toPageLog(spark, Jobs.splitLog(clean.toDF())._2))
    val qPage = repaired.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_page")
      .format("parquet").option("path", s"$root/dwd_page_log").start()
    val qDirty = dirty.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_dirty")
      .format("parquet").option("path", s"$root/dirty").start()
    assert(qSplit.awaitTermination(120000))
    assert(qPage.awaitTermination(120000))
    assert(qDirty.awaitTermination(120000))

    // split correctness: 1 start, 5 page, 2 displays w/ parent, 1 dirty
    assert(spark.read.parquet(s"$root/dwd_start_log").count() === 1L)
    val pageLog = spark.read.parquet(s"$root/dwd_page_log")
    assert(pageLog.count() === 5L)
    val disp = spark.read.parquet(s"$root/dwd_display_log").collect()
    assert(disp.length === 2 &&
      disp.forall(_.getAs[String]("page_id") == "good_detail"))
    assert(spark.read.parquet(s"$root/dirty").count() === 1L)

    // is_new repair: mid_a stays 1 on day 1 (both rows), flips on day 2
    val isNew = pageLog.select($"mid", $"ts", $"is_new")
      .as[(String, java.sql.Timestamp, String)].collect()
      .map { case (m, ts, f) => (m, ts.getTime) -> f }.toMap
    assert(isNew(("mid_a", t0)) === "1")
    assert(isNew(("mid_a", t0 + 5000)) === "1")
    assert(isNew(("mid_a", day2)) === "0")
    assert(isNew(("mid_b", t0 + 12000)) === "0")

    // ---- VisitorStatsApp twin (streaming from the dwd dir) ----
    val pageStream = spark.readStream.schema(pageLog.schema)
      .parquet(s"$root/dwd_page_log").as[PageLog]
    val stats = Jobs.visitorStats10s(
      Jobs.visitorMeasures(pageStream).withWatermark("ts", "1 second"))
    val qStats = stats.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_stats")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.writeStatsBatch(batch, s"$root/visitor_stats", Nil)
      }.start()
    assert(qStats.awaitTermination(120000))

    // ---- KeywordStatsApp twin (entry point 3): the good_detail
    // page's item phrase tokenized laterally, counted per window ----
    val kwPages = spark.read.schema(Sources.logSchema)
      .json(spark.createDataset(lines))
      .filter($"common".isNotNull && $"start".isNull)
      .select(timestamp_millis($"ts").as("ts"),
        concat_ws(" ", lit("hash"), lit("join"), $"page"("page_id")).as("item"))
    val kw = Jobs.keywordStats10s(kwPages)
      .groupBy($"keyword").agg(sum($"ct").as("ct"))
      .as[(String, Long)].collect().toMap
    // 5 page rows (incl. sentinel): phrase merges per the dictionary
    assert(kw("hash_join") === 5L)
    assert(kw("home") === 4L)
    assert(kw("good_detail") === 1L)

    // ADS over the written stats dir equals the batch twin (both
    // restricted to closed windows — the sentinel's stays open).
    def ads(df: org.apache.spark.sql.DataFrame) =
      df.filter($"stt" < cutoff)
        .groupBy($"is_new")
        .agg(sum($"pv_ct").as("pv"), sum($"sv_ct").as("sv"),
          sum($"dur_sum").as("dur"))
        .as[(String, Long, Long, Long)].collect().toSet
    val fromSink = ads(spark.read.parquet(s"$root/visitor_stats")
      .drop("dt"))
    assert(fromSink === ads(batchStats))
    // hand-derived: is_new=1 rows are mid_a's two day-1 views
    assert(fromSink.contains(("1", 2L, 1L, 3000L)))
  }
}
