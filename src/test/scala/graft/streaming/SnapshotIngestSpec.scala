package graft.streaming

import graft.SparkSpec
import graft.operators.ScaleOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streaming ingest into the versioned snapshot store: one committed
  * version per micro-batch, replays absorbed by the committed-tag
  * check, and standing readers isolated from live ingest. */
class SnapshotIngestSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_snapingest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a drained stream commits one version per batch; content is the union") {
    val root = freshRoot("drain")
    fs(root).delete(new Path(root), true)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocRow]
    val q = Jobs.snapshotIngest(spark, mem.toDS(), root)
      .option("checkpointLocation", root + "_ckpt").start()
    try {
      mem.addData(Seq(DocRow(1L, "alpha"), DocRow(2L, "beta")))
      q.processAllAvailable()
      mem.addData(Seq(DocRow(3L, "gamma")))
      q.processAllAvailable()
    } finally q.stop()
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L, 2L))
    assert(ScaleOps.committedTags(spark, root) === Seq("batch:0", "batch:1"))
    assert(ScaleOps.readSnapshot(spark, root)
      .as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // a reader pinned at v1 keeps answering batch 0 only
    assert(ScaleOps.readSnapshot(spark, root, Some(1L)).count() === 2L)
  }

  test("a replayed batch tag is absorbed — no duplicate version, no duplicate rows") {
    val root = freshRoot("replay")
    fs(root).delete(new Path(root), true)
    val b0 = Seq((10L, "a"), (11L, "b")).toDF("doc_id", "text")
    assert(ScaleOps.snapshotAppendOnce(spark, root, b0, "batch:0") === Some(1L))
    // at-least-once replay of the SAME batch: same tag, same data
    assert(ScaleOps.snapshotAppendOnce(spark, root, b0, "batch:0") === None)
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L))
    assert(ScaleOps.snapshotAppendOnce(spark, root,
      Seq((12L, "c")).toDF("doc_id", "text"), "batch:1") === Some(2L))
    assert(ScaleOps.readSnapshot(spark, root).count() === 3L)
  }

  test("crash debris (tag without manifest) is invisible and retried cleanly") {
    val root = freshRoot("crash")
    fs(root).delete(new Path(root), true)
    ScaleOps.snapshotAppendOnce(spark, root,
      Seq((1L, "a")).toDF("doc_id", "text"), "batch:0")
    // simulate a crash between the v2 tag commit and the manifest
    // rename: tag + data exist, manifest does not
    Seq((2L, "b")).toDF("doc_id", "text")
      .write.parquet(new Path(root, "data-v2").toString)
    val tagP = new Path(root, "_manifests/v2.tag")
    val out = fs(root).create(tagP, true)
    try out.write("batch:1".getBytes("UTF-8")) finally out.close()
    // the orphan tag does NOT count as committed
    assert(ScaleOps.committedTags(spark, root) === Seq("batch:0"))
    // the replay claims v2 cleanly over the debris
    assert(ScaleOps.snapshotAppendOnce(spark, root,
      Seq((2L, "b")).toDF("doc_id", "text"), "batch:1") === Some(2L))
    assert(ScaleOps.readSnapshot(spark, root)
      .orderBy(col("doc_id")).as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
  }
}
