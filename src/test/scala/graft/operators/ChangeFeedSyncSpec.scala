package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Incremental downstream consumer over the snapshot change feed:
  * pure appends fold only the file delta, delete/merge/compact hops
  * fold their committed change feeds (both counter-pinned — zero
  * recomputes), only a feed-less rewrite falls back to a full
  * recompute, state commits are crash-safe, and the derived profile
  * always equals the batch profile of the synced version. */
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

  test("a feed-less rewrite hop falls back to full recompute and stays correct") {
    val root = freshDir("rw")
    val out = freshDir("rw_out")
    fs(root).delete(new Path(root), true)
    fs(out).delete(new Path(out), true)
    ScaleOps.publishSnapshot(spark, root, docs((1L, "en", "hello")))
    ScaleOps.changeFeedSync(spark, root, out)
    // a full re-publish writes no change feed: parent's files are NOT
    // a subset and there is nothing to fold — the documented fallback
    ScaleOps.publishSnapshot(spark, root,
      docs((1L, "en", "hello"), (2L, "zh", "ni hao")))
    val c0 = ScaleOps.syncRecomputes.get()
    assert(ScaleOps.changeFeedSync(spark, root, out) === Seq(2L))
    assert(ScaleOps.syncRecomputes.get() === c0 + 1)
    assert(state(out) === batchProfile(root))
  }

  test("a copy-on-write delete hop folds its change feed — no recompute") {
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
    assert(ScaleOps.syncRecomputes.get() === c0)
    assert(state(out) === batchProfile(root))
  }

  test("a mixed append/delete/merge/compact history syncs with ZERO recomputes") {
    val root = freshDir("mix")
    val out = freshDir("mix_out")
    fs(root).delete(new Path(root), true)
    fs(out).delete(new Path(out), true)
    def ranged(df: org.apache.spark.sql.DataFrame) =
      df.repartitionByRange(2, org.apache.spark.sql.functions.col("doc_id"))
    ScaleOps.publishSnapshot(spark, root,
      ranged(docs((1L, "en", "one"), (2L, "de", "zwei"), (3L, "en", "three"))),
      statsCol = Some("doc_id"))
    ScaleOps.changeFeedSync(spark, root, out) // bootstrap (not a fallback)
    val c0 = ScaleOps.syncRecomputes.get()
    // v2 append, v3 delete, v4 merge (update id 3 + insert id 9),
    // v5 compact — then ONE sync folds every hop kind
    ScaleOps.appendSnapshot(spark, root,
      ranged(docs((4L, "fr", "quatre"), (5L, "de", "fuenf"))),
      statsCol = Some("doc_id"))
    ScaleOps.deleteFromSnapshot(spark, root, "doc_id", 2L, 2L)
    ScaleOps.mergeIntoSnapshot(spark, root, "doc_id",
      docs((3L, "en", "three updated"), (9L, "zh", "jiu")))
    val v5 = ScaleOps.compactSnapshot(spark, root, targetBytes = 1L << 30,
      statsCol = Some("doc_id"))
    assert(v5 === 5L) // tiny files: the compaction genuinely rewrote
    assert(ScaleOps.changeFeedSync(spark, root, out) === Seq(2L, 3L, 4L, 5L))
    assert(ScaleOps.syncRecomputes.get() === c0)
    assert(state(out) === batchProfile(root))
    // a lang whose only doc was deleted must drop out of the profile
    ScaleOps.deleteFromSnapshot(spark, root, "doc_id", 9L, 9L)
    assert(ScaleOps.changeFeedSync(spark, root, out) === Seq(6L))
    assert(ScaleOps.syncRecomputes.get() === c0)
    assert(state(out) === batchProfile(root))
    assert(!state(out).exists(_._1 == "zh"))
  }

  test("vacuum reclaims expired versions' change feeds with their manifests") {
    import org.apache.spark.sql.functions.col
    val root = freshDir("vacfeed")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root,
      docs((1L, "en", "one"), (2L, "de", "zwei"))
        .repartitionByRange(2, col("doc_id")),
      statsCol = Some("doc_id"))
    ScaleOps.deleteFromSnapshot(spark, root, "doc_id", 2L, 2L)   // v2 + feed
    ScaleOps.mergeIntoSnapshot(spark, root, "doc_id",
      docs((1L, "en", "one neu")))                               // v3 + feed
    assert(fs(root).exists(new Path(root, "changes-v2")))
    assert(fs(root).exists(new Path(root, "changes-v3")))
    ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    // v2 expired → its feed went with it; the retained v3's stays
    assert(!fs(root).exists(new Path(root, "changes-v2")))
    assert(fs(root).exists(new Path(root, "changes-v3")))
    assert(ScaleOps.snapshotChangeFiles(spark, root, 3L).isDefined)
  }

  test("the change-feed read returns each rewrite's exact row delta") {
    import org.apache.spark.sql.functions.col
    val root = freshDir("cfr")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root,
      docs((1L, "en", "one"), (2L, "de", "zwei"))
        .repartitionByRange(2, col("doc_id")),
      statsCol = Some("doc_id"))
    ScaleOps.appendSnapshot(spark, root, docs((3L, "fr", "trois")),
      statsCol = Some("doc_id"))
    ScaleOps.deleteFromSnapshot(spark, root, "doc_id", 2L, 2L)
    ScaleOps.mergeIntoSnapshot(spark, root, "doc_id",
      docs((3L, "fr", "trois bis"), (7L, "zh", "qi")))
    val feed = ScaleOps.readSnapshotChangeFeed(spark, root, 1L, 4L)
      .select("_commit_version", "_change_type", "doc_id", "text")
      .as[(Long, String, Long, String)].collect().sorted.toSeq
    assert(feed === Seq(
      (2L, "insert", 3L, "trois"),        // the appended file's rows
      (3L, "delete", 2L, "zwei"),         // the deleted slice
      (4L, "delete", 3L, "trois"),        // merge preimage
      (4L, "insert", 3L, "trois bis"),    // merge postimage
      (4L, "insert", 7L, "qi")))          // merge insert
    // pre-feed rewrites refuse instead of answering wrong: fake one
    // by removing the committed feed
    fs(root).delete(new Path(root, "changes-v3"), true)
    val e = intercept[IllegalStateException] {
      ScaleOps.readSnapshotChangeFeed(spark, root, 1L, 4L).count()
    }
    assert(e.getMessage.contains("no committed change feed"))
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
