package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streaming CDC chunk-store ingest: after a drain the standing dup
  * report equals batch c42 bit-for-bit, replays rewrite their own
  * partition instead of double-counting, and each batch's work is
  * batch-proportional (chunking never re-reads the corpus). */
class ChunkIngestSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_chunkingest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dupsOf(dir: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(s"$dir/dups")
      .select(col("chunk_h"), col("chunk_len"), col("n_occ"), col("n_docs"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("a drained stream's dup report equals batch c42 over the same corpus") {
    val sf = "/root/testdata/sf0.001"
    val dir = freshRoot("drain")
    fs(dir).delete(new Path(dir), true)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[DocRow].collect().toSeq
    // three uneven batches; every document arrives exactly once
    val batches = Seq(docs.take(40), docs.slice(40, 55), docs.drop(55))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocRow]
    val q = Jobs.chunkDedupIngest(spark, mem.toDS(), dir)
      .option("checkpointLocation", new Path(dir, "_ckpt").toString).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val want = DedupOps.c42CdcDedup(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(want.nonEmpty, "fixture lost its recurring chunks")
    assert(dupsOf(dir) === want)
  }

  test("an at-least-once replay rewrites its own partition — no double counting") {
    val dir = freshRoot("replay")
    fs(dir).delete(new Path(dir), true)
    val t = "the quick brown fox jumps over the lazy dog " * 40
    val b0 = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    Jobs.chunkIngestBatch(spark, b0, 0L, dir)
    val once = dupsOf(dir)
    assert(once.nonEmpty)
    // the SAME batch replays (foreachBatch at-least-once): partials
    // land in the same batch=0 partition, the report is unchanged
    Jobs.chunkIngestBatch(spark, b0, 0L, dir)
    assert(dupsOf(dir) === once)
    // a genuinely new batch extends the counts instead
    Jobs.chunkIngestBatch(spark, Seq((3L, t)).toDF("doc_id", "text"), 1L, dir)
    val grown = dupsOf(dir)
    assert(grown.map(_._3).sum > once.map(_._3).sum)
    assert(grown.forall(_._4 === 3L), "all three docs share every chunk")
  }

  test("per-batch partials are batch-proportional, not corpus-proportional") {
    val dir = freshRoot("delta")
    fs(dir).delete(new Path(dir), true)
    val big = (1L to 60L).map(i =>
      (i, s"document number $i with some shared boilerplate text " * 20))
    Jobs.chunkIngestBatch(spark, big.toDF("doc_id", "text"), 0L, dir)
    Jobs.chunkIngestBatch(spark,
      Seq((100L, "one tiny late arrival")).toDF("doc_id", "text"), 1L, dir)
    // the second batch's own partition holds only ITS chunks — the
    // ingest never re-chunked the 60-doc history
    val p0 = spark.read.parquet(s"$dir/chunks/batch=0").count()
    val p1 = spark.read.parquet(s"$dir/chunks/batch=1").count()
    assert(p1 <= 2L, s"late batch wrote $p1 chunk rows")
    assert(p0 > 20L * p1)
  }
}
