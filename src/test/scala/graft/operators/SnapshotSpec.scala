package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Versioned corpus snapshots: manifest-commit atomicity, reader
  * isolation from concurrent publishes, and time travel by version.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_snaptest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a reader pinned to version N is isolated from a later publish") {
    val root = freshRoot("iso")
    fs(root).delete(new Path(root), true)
    val v1 = ScaleOps.publishSnapshot(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    assert(v1 === 1L)
    // resolve the reader BEFORE the next publish — its manifest file
    // list must keep answering v1 afterwards
    val pinned = ScaleOps.readSnapshot(spark, root, Some(1L))
    val latestBefore = ScaleOps.readSnapshot(spark, root)
    val v2 = ScaleOps.publishSnapshot(spark, root,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "s"))
    assert(v2 === 2L)
    assert(pinned.as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b")))
    assert(latestBefore.as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // a NEW latest-read sees v2; a pinned v1 read still answers v1
    assert(ScaleOps.readSnapshot(spark, root).count() === 4L)
    assert(ScaleOps.readSnapshot(spark, root, Some(1L)).count() === 2L)
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L, 2L))
  }

  test("an uncommitted publish (no manifest rename) is invisible") {
    val root = freshRoot("crash")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a")).toDF("id", "s"))
    // simulate a crash AFTER data landed but BEFORE the manifest
    // commit: data dir + tmp manifest exist, committed manifest does not
    Seq((9L, "x")).toDF("id", "s")
      .write.parquet(new Path(root, "data-v2").toString)
    val tmp = new Path(root, "_manifests/.tmp-v2")
    val out = fs(root).create(tmp, true)
    try out.write("bogus".getBytes("UTF-8")) finally out.close()
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L))
    assert(ScaleOps.readSnapshot(spark, root).count() === 1L)
    // the next real publish claims v2 cleanly over the debris
    val v = ScaleOps.publishSnapshot(spark, root, Seq((2L, "b"), (3L, "c")).toDF("id", "s"))
    assert(v === 2L)
    assert(ScaleOps.readSnapshot(spark, root).count() === 2L)
  }

  test("s03 is stable across calls and its versions differ as published") {
    val sf = "/root/testdata/sf0.001"
    val a = ScaleOps.s03SnapshotRead(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    val b = ScaleOps.s03SnapshotRead(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(a === b) // no rebuild while the corpus token matches
    val v1docs = a.filter(_._1 == 1L).map(_._3).sum
    val v2docs = a.filter(_._1 == 2L).map(_._3).sum
    assert(v2docs === graft.Tables.documents(spark, sf).count())
    assert(v1docs > 0L && v1docs < v2docs) // the half split is proper
  }
}
