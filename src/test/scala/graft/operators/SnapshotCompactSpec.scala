package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** OPTIMIZE as a snapshot version: undersized files bin-pack into
  * fewer right-sized ones, right-sized files are reused verbatim,
  * content is bit-identical to the parent, and the compacted files'
  * freshly-collected zone-map stats keep pruned reads sharp. */
class SnapshotCompactSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_opttest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** v1 = one BIG file (ids 0-1999), then two small appends (the
    * streaming-ingest tail): ids 2000-2009 and 2010-2019, one file
    * each. Returns (root, big file's byte length). */
  private def seed(root: String): Long = {
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root,
      (0L until 2000L).map(i => (i, s"row$i-" + "x" * 40)).toDF("id", "s")
        .coalesce(1), statsCol = Some("id"))
    ScaleOps.appendSnapshot(spark, root,
      (2000L until 2010L).map(i => (i, s"row$i")).toDF("id", "s").coalesce(1),
      statsCol = Some("id"))
    ScaleOps.appendSnapshot(spark, root,
      (2010L until 2020L).map(i => (i, s"row$i")).toDF("id", "s").coalesce(1),
      statsCol = Some("id"))
    val big = ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.head
    fs(root).getFileStatus(new Path(big)).getLen
  }

  test("compaction bin-packs the small tail, reuses the big file, keeps content") {
    val root = freshRoot("pack")
    val bigLen = seed(root)
    val v3Files = ScaleOps.readSnapshot(spark, root, Some(3L)).inputFiles.toSet
    assert(v3Files.size === 3)
    // target = big file's size: big is right-sized (≥ target/2), the
    // two appended files are far under target/2 → they pack into one
    val v4 = ScaleOps.compactSnapshot(spark, root, bigLen, Some("id"))
    assert(v4 === 4L)
    val v4Files = ScaleOps.readSnapshot(spark, root, Some(4L)).inputFiles.toSet
    assert(v4Files.size === 2)
    assert((v3Files intersect v4Files).size === 1) // the big file, reused
    // content is bit-identical to the parent version
    val before = ScaleOps.readSnapshot(spark, root, Some(3L))
      .as[(Long, String)].collect().sorted.toSeq
    val after = ScaleOps.readSnapshot(spark, root, Some(4L))
      .as[(Long, String)].collect().sorted.toSeq
    assert(after === before)
    // parent versions untouched (isolation)
    assert(ScaleOps.readSnapshot(spark, root, Some(3L)).inputFiles.toSet === v3Files)
  }

  test("fewer than two undersized files is a no-op") {
    val root = freshRoot("noop")
    val bigLen = seed(root)
    ScaleOps.compactSnapshot(spark, root, bigLen, Some("id"))
    val v = ScaleOps.compactSnapshot(spark, root, bigLen, Some("id"))
    assert(v === 4L) // already compact — nothing committed
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L, 2L, 3L, 4L))
  }

  test("the compacted file's fresh stats keep pruned reads sharp") {
    val root = freshRoot("stats")
    val bigLen = seed(root)
    ScaleOps.compactSnapshot(spark, root, bigLen, Some("id"))
    // the small tail's ids [2000,2019] live only in the compacted
    // file; a pruned read over them must skip the big file entirely
    val tail = ScaleOps.readSnapshotPruned(spark, root, Some(4L),
      "id", 2000L, 2019L)
    assert(tail.inputFiles.length === 1)
    assert(tail.count() === 20L)
    // and a head read must open only the reused big file
    val head = ScaleOps.readSnapshotPruned(spark, root, Some(4L),
      "id", 0L, 10L)
    assert(head.inputFiles.length === 1)
    assert(head.count() === 11L)
  }

  test("vacuum after compaction reclaims the superseded small files") {
    val root = freshRoot("vac")
    val bigLen = seed(root)
    ScaleOps.compactSnapshot(spark, root, bigLen, Some("id"))
    val kept = ScaleOps.readSnapshot(spark, root, Some(4L)).inputFiles.toSet
    val (nDeleted, _) = ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    assert(nDeleted === 2L) // the two pre-compaction small files
    kept.foreach(f => assert(fs(root).exists(new Path(f))))
    assert(ScaleOps.readSnapshot(spark, root).count() === 2020L)
  }
}
