package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{Dataset, Encoder}

/** Parity specs for the stateful streaming operators: each runs the
  * SAME fixture through (a) batch execution and (b) a MemoryStream
  * micro-batch pipeline, asserting both match the hand-computed
  * expectation — including the exactly-10s bounce boundary.
  */
class StatefulOpsSpec extends SparkSpec with StreamRunner {
  import Fixtures._

  // ---- A16 bounce -------------------------------------------------
  import spark.implicits._

  test("bounce: batch execution matches hand-computed expectation") {
    val ds = spark.createDataset(bounceEvents)
    val got = StatefulOps.detectBounce(spark, ds).collect()
      .map(h => h.event_id -> h.reason).toMap
    assert(got === expectedBounceIds)
  }

  test("bounce: streaming matches batch (watermark-driven timeouts)") {
    // Sentinel event (user 99, far future) pushes the global watermark
    // past every pending entry's ts+10s so timeouts fire before stop.
    val sentinel = ev(999, 3600, 99, "click")
    val got = runStream(Seq(bounceEvents, Seq(sentinel))) { ds: Dataset[EventRow] =>
      StatefulOps.detectBounce(spark, ds.withWatermark("ts", "0 seconds"))
    }
    val gotMap = got.map(h => h.event_id -> h.reason).toMap
    assert(gotMap === expectedBounceIds)
  }

  test("bounce: split delivery across micro-batches preserves state") {
    val (b1, b2) = bounceEvents.sortBy(_.ts.getTime).splitAt(4)
    // Watermark delay is 1h, so the sentinel must sit > 1h past every
    // pending entry's ts+10s for the event-time timeouts to fire.
    val sentinel = ev(999, 7300, 99, "click")
    val got = runStream(Seq(b1, b2, Seq(sentinel))) { ds: Dataset[EventRow] =>
      StatefulOps.detectBounce(spark, ds.withWatermark("ts", "1 hour"))
    }
    assert(got.map(h => h.event_id -> h.reason).toMap === expectedBounceIds)
  }

  // ---- A9 is_new repair -------------------------------------------

  test("is_new repair: batch execution") {
    val got = StatefulOps.repairIsNew(spark, spark.createDataset(isNewEvents))
      .collect().map(r => r.event_id -> r.is_new).toMap
    assert(got === expectedIsNew)
  }

  test("is_new repair: streaming across micro-batches") {
    val batches = isNewEvents.grouped(2).toSeq
    val got = runStream(batches) { ds: Dataset[EventRow] =>
      StatefulOps.repairIsNew(spark, ds)
    }
    assert(got.map(r => r.event_id -> r.is_new).toMap === expectedIsNew)
  }

  test("is_new repair: parity with the batch twin over real data") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).as[EventRow]
    val streamingForm = StatefulOps.repairIsNew(spark, ev)
      .collect().map(r => r.event_id -> r.is_new).toMap
    val batchTwin = graft.operators.DwdOps.a09IsNewRepair(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(streamingForm === batchTwin)
  }

  // ---- A10 daily-first-visit --------------------------------------

  test("daily-first-visit: batch execution") {
    val got = StatefulOps.dailyFirstVisit(spark, spark.createDataset(uvEvents))
      .collect().map(_.event_id).toSet
    assert(got === expectedUvIds)
  }

  test("daily-first-visit: streaming across micro-batches") {
    val batches = uvEvents.grouped(2).toSeq
    val got = runStream(batches) { ds: Dataset[EventRow] =>
      StatefulOps.dailyFirstVisit(spark, ds, ttl = None)
    }
    assert(got.map(_.event_id).toSet === expectedUvIds)
  }

  test("daily-first-visit: TTL mode ingests continuously (sink-synchronized)") {
    // With ProcessingTimeTimeout the engine busy-loops batches and
    // processAllAvailable may never return — so feed everything and
    // poll the sink for the expected rows instead.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = StatefulOps.dailyFirstVisit(spark, mem.toDS(), ttl = Some("1 day"))
      .writeStream.format("memory").queryName("uv_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      uvEvents.grouped(2).foreach(mem.addData(_))
      val deadline = System.currentTimeMillis() + 90000
      var ids = Set.empty[Long]
      while (ids != expectedUvIds && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        ids = spark.table("uv_ttl").collect().map(_.getLong(0)).toSet
      }
      assert(ids === expectedUvIds)
    } finally q.stop()
  }

  test("daily-first-visit: parity with the batch twin over real data") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).as[EventRow]
    val streamingForm = StatefulOps.dailyFirstVisit(spark, ev)
      .collect().map(_.event_id).toSet
    val batchTwin = graft.operators.DwdOps.a10DailyFirstVisit(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(streamingForm === batchTwin)
  }

  test("bounce: parity with the batch twin over real data") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).as[EventRow]
    val streamingForm = StatefulOps.detectBounce(spark, ev)
      .collect().map(h => h.event_id -> h.reason).toMap
    val batchTwin = graft.operators.DwsWindows.a16Bounce(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(streamingForm === batchTwin)
  }
}
