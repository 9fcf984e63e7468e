package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Incremental downstream consumer over the snapshot change feed:
  * pure appends fold only the file delta (counter-pinned), rewrite
  * and delete hops fall back to a full recompute, state commits are
  * crash-safe, and the derived profile always equals the batch
  * profile of the synced version. */
class ChangeFeedSyncSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_cfs_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  /** The batch profile the sync must always agree with. */
  private def batchProfile(root: String): Seq[(String, Long, Long)] = {
    import org.apache.spark.sql.functions._
    ScaleOps.readSnapshot(spark, root)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"))
      .as[(String, Long, Long)].collect().sorted.toSeq
  }

  private def state(out: String): Seq[(String, Long, Long)] =
    ScaleOps.readSyncedState(spark, out)
      .as[(String, Long, Long)].collect().sorted.toSeq

  test("appends fold incrementally; state always matches the batch profile") {
    val root = freshDir("app")
    val out = freshDir("app_out")
    fs(root).delete(new Path(root), true)
    fs(out).delete(new Path(out), true)
    ScaleOps.publishSnapshot(spark, root,
      docs((1L, "en", "hello"), (2L, "de", "hallo welt")))
    // bootstrap: a full read by nature, not a recompute fallback
    val c0 = ScaleOps.syncRecomputes.get()
    assert(ScaleOps.changeFeedSync(spark, root, out) === Seq(1L))
    assert(ScaleOps.syncRecomputes.get() === c0)
    assert(state(out) === batchProfile(root))
    // two appends, one sync: both hops take the incremental path
    ScaleOps.appendSnapshot(spark, root, docs((3L, "en", "more text")))
    ScaleOps.appendSnapshot(spark, root, docs((4L, "fr", "bonjour")))
    assert(ScaleOps.changeFeedSync(spark, root, out) === Seq(2L, 3L))
    assert(ScaleOps.syncRecomputes.get() === c0)
    assert(state(out) === batchProfile(root))
    // caught up: nothing to consume, state untouched
    assert(ScaleOps.changeFeedSync(spark, root, out) === Nil)
    assert(state(out) === batchProfile(root))
  }

  test("a rewrite hop falls back to full recompute and stays correct") {
    val root = freshDir("rw")
    val out = freshDir("rw_out")
    fs(root).delete(new Path(root), true)
    fs(out).delete(new Path(out), true)
    ScaleOps.publishSnapshot(spark, root, docs((1L, "en", "hello")))
    ScaleOps.changeFeedSync(spark, root, out)
    // a compaction-style rewrite: parent's files are NOT a subset
    ScaleOps.publishSnapshot(spark, root,
      docs((1L, "en", "hello"), (2L, "zh", "ni hao")))
    val c0 = ScaleOps.syncRecomputes.get()
    assert(ScaleOps.changeFeedSync(spark, root, out) === Seq(2L))
    assert(ScaleOps.syncRecomputes.get() === c0 + 1)
    assert(state(out) === batchProfile(root))
  }

  test("a copy-on-write delete hop recomputes and drops the deleted rows") {
    val root = freshDir("del")
    val out = freshDir("del_out")
    fs(root).delete(new Path(root), true)
    fs(out).delete(new Path(out), true)
    ScaleOps.publishSnapshot(spark, root,
      docs((1L, "en", "keep"), (2L, "en", "drop me"), (3L, "de", "bleibt"))
        .repartitionByRange(2, org.apache.spark.sql.functions.col("doc_id")),
      statsCol = Some("doc_id"))
    ScaleOps.changeFeedSync(spark, root, out)
    ScaleOps.deleteFromSnapshot(spark, root, "doc_id", 2L, 2L)
    val c0 = ScaleOps.syncRecomputes.get()
    assert(ScaleOps.changeFeedSync(spark, root, out) === Seq(2L))
    assert(ScaleOps.syncRecomputes.get() === c0 + 1)
    assert(state(out) === batchProfile(root))
  }

  test("crash debris (state written, rename never reached) is invisible and reclaimed") {
    val root = freshDir("crash")
    val out = freshDir("crash_out")
    fs(root).delete(new Path(root), true)
    fs(out).delete(new Path(out), true)
    ScaleOps.publishSnapshot(spark, root, docs((1L, "en", "hello")))
    ScaleOps.changeFeedSync(spark, root, out)
    val good = state(out)
    // simulate the crash window: a data-complete state dir that never
    // got its commit rename
    docs((9L, "xx", "bogus")).write
      .parquet(new Path(out, ".tmp-state-v99-dead").toString)
    assert(state(out) === good) // committed state wins
    ScaleOps.appendSnapshot(spark, root, docs((2L, "de", "hallo")))
    ScaleOps.changeFeedSync(spark, root, out)
    assert(state(out) === batchProfile(root))
    assert(!fs(out).exists(new Path(out, ".tmp-state-v99-dead")))
  }
}
