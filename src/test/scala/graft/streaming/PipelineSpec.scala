package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.Row

/** Interval join, windowed aggregation, source parsing and sink specs
  * — streaming results asserted equal to the equivalent batch
  * computation on the same data. */
class PipelineSpec extends SparkSpec {
  import Fixtures._
  import spark.implicits._

  // ---- A14 interval join ------------------------------------------

  private val joinFixture = Seq(
    ev(1, 100, 1, "purchase", 50.0),  // clicks at 95, 98 qualify (−300..0)
    ev(2, 95, 1, "click"),
    ev(3, 98, 1, "click"),
    ev(4, 401, 1, "click"),           // next purchase@700: 401 < 700−300+1? 700−300=400 → 401 qualifies
    ev(5, 700, 1, "purchase", 70.0),
    ev(6, 99, 2, "click"),            // other user — no purchase
    ev(7, 710, 3, "purchase", 30.0))  // no clicks for u3

  test("interval join: batch form matches hand expectation") {
    val df = spark.createDataset(joinFixture).toDF()
    val purchases = df.filter($"event_type" === "purchase")
    val clicks = df.filter($"event_type" === "click")
    val got = IntervalJoins.purchaseWithClicks(purchases, clicks)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 3L), (5L, 4L)))
  }

  test("interval join: watermarked stream-stream join matches batch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val src = mem.toDF()
    val purchases = src.filter($"event_type" === "purchase")
      .withWatermark("ts", "10 minutes")
    val clicks = src.filter($"event_type" === "click")
      .withWatermark("ts", "10 minutes")
    val q = IntervalJoins.purchaseWithClicks(purchases, clicks)
      .select("purchase_id", "click_id")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(joinFixture)
      q.processAllAvailable()
      // push watermark far past all events so all joins emit
      mem.addData(Seq(ev(99, 7200, 9, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ij_out").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 3L), (5L, 4L)))
  }

  // ---- A19-A21 windowed aggregation -------------------------------

  test("windowed visitor stats: streaming append matches batch") {
    implicit val sq = spark.sqlContext
    val data = Seq(
      ev(1, 0, 1, "view", 10.0), ev(2, 3, 2, "view", 5.5),
      ev(3, 9, 1, "signup"), ev(4, 12, 2, "error"),
      ev(5, 15, 3, "view", 2.25))
    val batch = WindowedAggs.visitorStats(spark.createDataset(data).toDF())
      .orderBy("stt", "is_new").collect().toSeq

    val mem = MemoryStream[EventRow]
    val q = WindowedAggs.visitorStats(
        mem.toDF().withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("wv_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(data)
      q.processAllAvailable()
      mem.addData(Seq(ev(99, 3600, 9, "click"))) // close all windows
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("wv_out")
      .filter($"stt" < "2024-01-01 01:00:00") // drop the sentinel's window
      .orderBy("stt", "is_new").collect().toSeq
    assert(streamed === batch)
  }

  test("sliding visitor stats: streaming append matches batch, 2 windows per event") {
    implicit val sq = spark.sqlContext
    val data = Seq(
      ev(1, 0, 1, "view", 10.0), ev(2, 3, 2, "view", 5.5),
      ev(3, 9, 1, "signup"), ev(4, 12, 2, "error"),
      ev(5, 15, 3, "view", 2.25))
    val batch = WindowedAggs.visitorStatsSliding(spark.createDataset(data).toDF())
      .orderBy("stt", "is_new").collect().toSeq
    // hopping invariant: every event contributes to exactly 2 windows
    assert(batch.map(r => r.getLong(3) + r.getLong(4) + r.getLong(5)).sum
      === 2L * data.size)

    val mem = MemoryStream[EventRow]
    val q = WindowedAggs.visitorStatsSliding(
        mem.toDF().withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("ws_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(data)
      q.processAllAvailable()
      mem.addData(Seq(ev(99, 3600, 9, "click"))) // close all windows
      q.processAllAvailable()
    } finally q.stop()
    // exclude BOTH sentinel hop windows (00:59:50 and 01:00:00) by a
    // margin - the earlier one only stays unemitted by watermark
    // timing, which another trigger cycle would change
    val streamed = spark.table("ws_out")
      .filter($"stt" < "2024-01-01 00:50:00")
      .orderBy("stt", "is_new").collect().toSeq
    assert(streamed === batch)
  }

  test("windowed product stats: streaming append matches batch") {
    implicit val sq = spark.sqlContext
    val data = Seq(
      ev(1, 0, 1, "click"), ev(2, 3, 2, "view"),
      ev(3, 9, 1, "purchase", 42.5), ev(4, 12, 2, "purchase", 10.0),
      ev(5, 15, 1, "purchase", 7.25))
    val batch = WindowedAggs.productStats(spark.createDataset(data).toDF())
      .orderBy("stt", "sku_id").collect().toSeq

    val mem = MemoryStream[EventRow]
    val q = WindowedAggs.productStats(
        mem.toDF().withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("wp_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(data)
      q.processAllAvailable()
      mem.addData(Seq(ev(99, 3600, 9, "noop"))) // close all windows
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("wp_out")
      .filter($"stt" < "2024-01-01 01:00:00")
      .orderBy("stt", "sku_id").collect().toSeq
    assert(streamed === batch)
  }

  test("session windows merge across micro-batches (streaming = batch)") {
    implicit val sq = spark.sqlContext
    // u1: events at 0s, 100s, 400s — the 400s event sits EXACTLY 5min
    // after 100s and still merges (session_window's boundary is
    // inclusive; the DuckDB oracle twin encodes gap > 5min for a new
    // session accordingly) — then 701s opens a second session (gap
    // 301s). u2: single event.
    val data = Seq(
      ev(1, 0, 1, "view"), ev(2, 100, 1, "click"),
      ev(3, 400, 1, "view"), ev(5, 701, 1, "view"),
      ev(4, 50, 2, "view"))
    def sessions(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(session_window($"ts", "5 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"user_id", $"session_window.start".cast("string").as("s"), $"n")
    val batch = sessions(spark.createDataset(data).toDF())
      .as[(Long, String, Long)].collect().toSet

    val mem = MemoryStream[EventRow]
    val q = sessions(mem.toDF().withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // split delivery: session continuation arrives in a later batch
      mem.addData(Seq(ev(1, 0, 1, "view"), ev(4, 50, 2, "view")))
      q.processAllAvailable()
      mem.addData(Seq(ev(2, 100, 1, "click"), ev(3, 400, 1, "view"),
        ev(5, 701, 1, "view")))
      q.processAllAvailable()
      mem.addData(Seq(ev(99, 7200, 9, "noop"))) // close all sessions
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_out")
      .filter($"user_id" =!= 9)
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === batch.filter(_._1 != 9))
    // u1: events 0/100/400 merged into one session (even split across
    // micro-batches, and across the exact-5min boundary); 701 opens
    // the second
    assert(streamed.count(_._1 == 1L) === 2)
    assert(streamed.contains((1L, "2024-01-01 00:00:00", 3L)))
  }

  test("multi-stream union feeds one windowed aggregation (A17)") {
    // The reference unions up to 7 per-source measure streams before
    // the 10s tumble (ProductStatsApp.java:186-189). Two independent
    // sources here, projected to the common measure schema.
    implicit val sq = spark.sqlContext
    val memA = MemoryStream[EventRow]
    val memB = MemoryStream[EventRow]
    def measures(df: org.apache.spark.sql.DataFrame, src: String) =
      df.select($"ts", lit(src).as("src"), lit(1L).as("ct"))
    val unioned = measures(memA.toDF(), "a")
      .unionByName(measures(memB.toDF(), "b"))
      .withWatermark("ts", "1 second")
      .groupBy(window($"ts", "10 seconds"), $"src")
      .agg(sum($"ct").as("ct"))
    val q = unioned.writeStream.format("memory").queryName("un_out")
      .outputMode(OutputMode.Append).start()
    try {
      memA.addData(Seq(ev(1, 0, 1, "view"), ev(2, 3, 1, "view")))
      memB.addData(Seq(ev(3, 5, 2, "click")))
      q.processAllAvailable()
      memA.addData(Seq(ev(99, 3600, 9, "noop"))) // advance watermark
      memB.addData(Seq(ev(98, 3600, 9, "noop")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("un_out")
      .filter($"window.start" < "2024-01-01 01:00:00")
      .select($"src", $"ct").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 1L))
  }

  test("tokenizer UDTF runs inside a streaming windowed count") {
    // A24+A25 in streaming form: LATERAL tokenize → 10s tumble count.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val words = mem.toDF()
      .withColumn("text", concat_ws(" ", lit("hash"), lit("join"), $"event_type"))
      .withWatermark("ts", "1 second")
      .selectExpr("ts", "graft_tokenize(text) AS (token, pos)")
    val q = words
      .groupBy(window($"ts", "10 seconds"), $"token")
      .count()
      .writeStream.format("memory").queryName("tok_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Seq(ev(1, 0, 1, "view"), ev(2, 3, 1, "click")))
      q.processAllAvailable()
      mem.addData(Seq(ev(99, 3600, 9, "noop")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tok_out")
      .filter($"window.start" < "2024-01-01 01:00:00")
      .select($"token", $"count").as[(String, Long)].collect().toMap
    // "hash join" merges into one phrase token per event
    assert(got === Map("hash_join" -> 2L, "view" -> 1L, "click" -> 1L))
  }

  // ---- A5/A6/A12 source parsing + split ---------------------------

  test("log parse + dirty side-channel + displays fan-out") {
    val lines = Seq(
      """{"common":{"mid":"m1","is_new":"1"},"page":{"page_id":"home"},"ts":1000}""",
      """{"common":{"mid":"m2"},"start":{"entry":"icon"},"ts":2000}""",
      """{"common":{"mid":"m1"},"page":{"page_id":"good_detail"},"displays":[{"display_type":"promo","item":"sku1","item_type":"sku","order":1},{"display_type":"rec","item":"sku2","item_type":"sku","order":2}],"ts":3000}""",
      """not json at all""")
    val raw = lines.toDF("value")
    val (clean, dirty) = Sources.parseWithDirty(raw, Sources.logSchema)
    assert(dirty.count() === 1)
    // 3-way split (BaseLogApp.java:95-134): start / page / display fan-out
    val cleanDf = clean.cache()
    val startRows = cleanDf.filter($"start".isNotNull)
    val pageRows = cleanDf.filter($"start".isNull)
    val displayRows = cleanDf
      .filter($"displays".isNotNull)
      .select($"common"("mid").as("mid"), $"page"("page_id").as("page_id"),
        explode($"displays").as("d"))
      .select($"mid", $"page_id", $"d.item", $"d.order")
    assert(startRows.count() === 1)
    assert(pageRows.count() === 2)
    val d = displayRows.orderBy($"d.order").collect()
    assert(d.length === 2)
    assert(d.map(_.getAs[String]("item")).toSet === Set("sku1", "sku2"))
    assert(d.forall(_.getAs[String]("page_id") == "good_detail"))
  }

  // ---- A13/A27 sinks ----------------------------------------------

  test("stats sink drops transient columns and partitions by day") {
    val dir = java.nio.file.Files.createTempDirectory("stats").toString
    val stats = Seq(
      ("2024-01-01 00:00:00", "2024-01-01 00:00:10", 5L, Seq(1L, 2L)),
      ("2024-01-02 00:00:00", "2024-01-02 00:00:10", 3L, Seq(3L)))
      .toDF("stt", "edt", "order_ct", "orderIdSet")
    Sinks.writeStatsBatch(stats, s"$dir/out", Seq("orderIdSet"))
    val back = spark.read.parquet(s"$dir/out")
    assert(!back.columns.contains("orderIdSet")) // @TransientSink mirror
    assert(back.columns.contains("dt"))
    assert(back.count() === 2)
    // idempotent: re-writing the same batch must not duplicate
    Sinks.writeStatsBatch(stats, s"$dir/out", Seq("orderIdSet"))
    assert(spark.read.parquet(s"$dir/out").count() === 2)
  }

  test("dim upsert merges by key, last version wins") {
    val dir = java.nio.file.Files.createTempDirectory("dim").toString + "/dim_user"
    val v1 = Seq((1L, "alice", 1L), (2L, "bob", 1L)).toDF("id", "name", "ver")
    v1.write.parquet(dir)
    val updates = Seq((2L, "bobby", 2L), (3L, "carol", 2L)).toDF("id", "name", "ver")
    Sinks.upsertDim(spark, updates, dir, "id", "ver")
    val got = spark.read.parquet(dir).as[(Long, String, Long)]
      .collect().map(r => r._1 -> r._2).toMap
    assert(got === Map(1L -> "alice", 2L -> "bobby", 3L -> "carol"))
  }

  test("routed sink fans rows out to per-route directories") {
    val dir = java.nio.file.Files.createTempDirectory("route").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val routed = mem.toDF()
      .withColumn("sink_table", concat(lit("dwd_"), $"event_type"))
    val q = Sinks.routedSink(routed, s"$dir/topics", s"$dir/ckpt", "sink_table").start()
    try {
      mem.addData(Seq(ev(1, 0, 1, "view"), ev(2, 1, 1, "click"), ev(3, 2, 2, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val view = spark.read.parquet(s"$dir/topics").filter($"sink_table" === "dwd_view")
    assert(view.count() === 2)
    val click = spark.read.parquet(s"$dir/topics").filter($"sink_table" === "dwd_click")
    assert(click.count() === 1)
  }
}
