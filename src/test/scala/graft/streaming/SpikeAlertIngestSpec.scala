package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The standing spike-alert job: partial hourly counts per
  * micro-batch (an hour's events split across batches must still sum
  * to the batch answer), alerts re-flagged from bucket grain, and
  * drained-stream equality with batch b16 over real data.
  */
class SpikeAlertIngestSpec extends SparkSpec {
  import spark.implicits._

  test("drained stream equals batch b16, hours split across batches") {
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("spike_ingest").toString
    val events = graft.Tables.events(spark, sf).as[EventRow]
      .collect().toSeq.sortBy(_.ts.getTime)
    // split mid-stream: many hours straddle the boundary
    val (b1, b2) = events.splitAt(events.size / 2)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = Jobs.spikeAlertIngest(spark, mem.toDS(), dir)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val batch = graft.operators.AdsQueries.b16SpikeDetect(spark, sf)
    val stream = spark.read.parquet(s"$dir/alerts")
    assert(stream.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(stream).count() === 0L)
    assert(batch.count() > 0L)
  }
}
