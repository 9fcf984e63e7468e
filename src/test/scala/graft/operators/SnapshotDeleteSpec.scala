package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Copy-on-write DELETE over the snapshot store: zone maps decide
  * which files are rewritten, untouched files' manifest lines carry
  * forward verbatim, older versions stay isolated, and vacuum — not
  * the delete — is what reclaims the deleted bytes from disk. */
class SnapshotDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_deltest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Two range-separated files: ids 0-9 and 100-109. */
  private def seed(root: String): Unit = {
    fs(root).delete(new Path(root), true)
    val df = ((0L to 9L) ++ (100L to 109L)).map(i => (i, s"r$i"))
      .toDF("id", "s")
    ScaleOps.publishSnapshot(spark, root,
      df.repartitionByRange(2, col("id")), statsCol = Some("id"))
  }

  test("delete rewrites only intersecting files; the rest are reused verbatim") {
    val root = freshRoot("cow")
    seed(root)
    val v1Files = ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.toSet
    assert(v1Files.size === 2)
    val v2 = ScaleOps.deleteFromSnapshot(spark, root, "id", 100L, 105L)
    assert(v2 === 2L)
    val v2Files = ScaleOps.readSnapshot(spark, root, Some(2L)).inputFiles.toSet
    // the [0,9] file is PROVABLY untouched → same physical file; the
    // [100,109] file intersects → rewritten under a new path
    assert((v1Files intersect v2Files).size === 1)
    assert((v2Files -- v1Files).size === 1)
    assert(ScaleOps.readSnapshot(spark, root, Some(2L))
      .as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      ((0L to 9L) ++ (106L to 109L)))
    // snapshot isolation: the pre-delete version still answers in full
    assert(ScaleOps.readSnapshot(spark, root, Some(1L)).count() === 20L)
  }

  test("a range that provably intersects no file is a no-op") {
    val root = freshRoot("noop")
    seed(root)
    ScaleOps.deleteFromSnapshot(spark, root, "id", 100L, 105L)
    val v = ScaleOps.deleteFromSnapshot(spark, root, "id", 500L, 600L)
    assert(v === 2L) // current version returned, nothing committed
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L, 2L))
  }

  test("the rewritten file's fresh stats keep pruned reads sharp") {
    val root = freshRoot("stats")
    seed(root)
    ScaleOps.deleteFromSnapshot(spark, root, "id", 100L, 105L)
    // a low-range read must open ONLY the reused [0,9] file …
    val lo = ScaleOps.readSnapshotPruned(spark, root, Some(2L), "id", 0L, 5L)
    assert(lo.inputFiles.length === 1)
    assert(lo.count() === 6L)
    // … and a high-range read ONLY the rewritten survivor file, whose
    // recollected bounds are [106,109]
    val hi = ScaleOps.readSnapshotPruned(spark, root, Some(2L), "id", 106L, 109L)
    assert(hi.inputFiles.length === 1)
    assert(hi.count() === 4L)
  }

  test("files without stats are conservatively rewritten") {
    val root = freshRoot("nostats")
    fs(root).delete(new Path(root), true)
    val df = ((0L to 9L) ++ (100L to 109L)).map(i => (i, s"r$i"))
      .toDF("id", "s")
    ScaleOps.publishSnapshot(spark, root,
      df.repartitionByRange(2, col("id"))) // no statsCol
    val v1Files = ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.toSet
    ScaleOps.deleteFromSnapshot(spark, root, "id", 100L, 105L)
    val v2Files = ScaleOps.readSnapshot(spark, root, Some(2L)).inputFiles.toSet
    // absence can't be proven without bounds → every file rewritten
    assert((v1Files intersect v2Files).isEmpty)
    assert(ScaleOps.readSnapshot(spark, root, Some(2L)).count() === 14L)
  }

  test("vacuum after the delete reclaims the pre-delete bytes") {
    val root = freshRoot("reclaim")
    seed(root)
    ScaleOps.deleteFromSnapshot(spark, root, "id", 100L, 105L)
    val kept = ScaleOps.readSnapshot(spark, root, Some(2L)).inputFiles.toSet
    val (nDeleted, bytes) = ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    // exactly the superseded [100,109] original goes; the reused file
    // is referenced by the retained manifest and survives
    assert(nDeleted === 1L && bytes > 0L)
    kept.foreach(f => assert(fs(root).exists(new Path(f))))
    assert(ScaleOps.readSnapshot(spark, root).count() === 14L)
  }
}
