package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The standing PageRank job: edge store merged per micro-batch
  * (crash-safe swap), scores re-ranked from the store, and — after
  * draining — both equal the batch computation over the same events
  * (restricted to edge-participating pages: the store holds edges,
  * so view-only pages rank only in the batch form).
  */
class PagerankIngestSpec extends SparkSpec {
  import Fixtures._
  import spark.implicits._

  test("drained stream: edge store and scores equal the batch forms") {
    val dir = java.nio.file.Files.createTempDirectory("pr_ingest").toString
    // ev() page = event_id % 10; u1 walks 1→2→5, u2 walks 7→8;
    // split mid-walk so the 2→5 edge spans the batch boundary.
    val events = Seq(
      ev(1, 0, 1, "view"), ev(2, 5, 1, "view"),
      ev(7, 3, 2, "view"),
      ev(15, 9, 1, "view"), ev(18, 12, 2, "view"))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = Jobs.pagerankIngest(spark, mem.toDS(), dir)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(3)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val batchEvents = spark.createDataset(events).toDF()
    val batchEdges = graft.operators.AdsQueries.pageEdges(batchEvents)
    // the store is per-batchId partitions (idempotent replay target);
    // its aggregate is the edge list
    val storeEdges = spark.read.parquet(s"$dir/edges")
      .groupBy($"src", $"dst").agg(sum($"wt").as("wt"))
    assert(storeEdges.exceptAll(batchEdges).count() === 0L)
    assert(batchEdges.exceptAll(storeEdges).count() === 0L)
    // both micro-batches own their partition
    val parts = new java.io.File(s"$dir/edges").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(parts === Set("batch=0", "batch=1"))

    val nodes = batchEdges.select($"src".as("page"))
      .union(batchEdges.select($"dst".as("page"))).distinct()
    val batchScores = graft.operators.AdsQueries
      .pagerankEdges(nodes, batchEdges)
    val storeScores = spark.read.parquet(s"$dir/scores")
    assert(storeScores.exceptAll(batchScores).count() === 0L)
    assert(batchScores.exceptAll(storeScores).count() === 0L)
    // sanity: the walked graph ranks 2 and 5 above their base
    val m = storeScores.as[(Long, Long)].collect().toMap
    assert(m.keySet === Set(1L, 2L, 5L, 7L, 8L))
    assert(m(5L) > 150000L && m(2L) > 150000L && m(1L) === 150000L)
  }
}
