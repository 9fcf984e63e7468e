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

  test("append reuses the parent's files; vacuum reclaims only unreferenced ones") {
    val root = freshRoot("vac")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    ScaleOps.appendSnapshot(spark, root, Seq((3L, "c")).toDF("id", "s"))
    // v2 = v1 ∪ append, reading through a manifest that REUSES v1's
    // physical files (no rewrite): every v1 data file still exists
    // exactly once and v2 sees all three rows
    assert(ScaleOps.readSnapshot(spark, root, Some(2L)).count() === 3L)
    val v1Dirs = fs(root).listStatus(new Path(root))
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("data-v1"))
    assert(v1Dirs.nonEmpty)
    val v1Files = v1Dirs.flatMap(d => fs(root).listStatus(d.getPath))
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    assert(v1Files.nonEmpty)
    // compaction rewrite: same content, all-new files
    ScaleOps.publishSnapshot(spark, root,
      ScaleOps.readSnapshot(spark, root, Some(2L)))
    assert(ScaleOps.readSnapshot(spark, root, Some(3L)).count() === 3L)

    // vacuum keep=2 retains v2 (which references v1's files) and v3:
    // NOTHING is reclaimable even though v1 itself expires
    val (n1, b1) = ScaleOps.vacuumSnapshots(spark, root, keep = 2)
    assert(n1 === 0L && b1 === 0L)
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(2L, 3L))
    assert(ScaleOps.readSnapshot(spark, root, Some(2L)).count() === 3L)

    // resolve a v3 reader BEFORE the next vacuum: it must survive it
    val pinned = ScaleOps.readSnapshot(spark, root, Some(3L))
    // vacuum keep=1 retains only v3 (all-new files): v1+v2's files
    // are now unreferenced and ARE reclaimed
    val (n2, b2) = ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    assert(n2 > 0L && b2 > 0L)
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(3L))
    assert(pinned.count() === 3L)
    assert(ScaleOps.readSnapshot(spark, root).count() === 3L)
    // the expired versions' data files are gone from disk — the
    // orphan sweep also removes the now-empty attempt directories
    assert(fs(root).listStatus(new Path(root))
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("data-v1"))
      .flatMap(d => fs(root).listStatus(d.getPath))
      .forall(!_.getPath.getName.startsWith("part-")))
    intercept[IllegalArgumentException] {
      ScaleOps.vacuumSnapshots(spark, root, keep = 0)
    }
  }

  test("incremental reads resolve at file grain: append delta, rewrite full, self empty") {
    val sf = "/root/testdata/sf0.001"
    val root = ScaleOps.ensureSnapshots(spark, sf)
    val full = ScaleOps.readSnapshot(spark, root, Some(2L))
    // v1→v2 was a pure append: the change read opens ONLY the
    // appended half's files (4 of v2's 8), no join, no v1 scan
    val delta = ScaleOps.readSnapshotChanges(spark, root, 1L, 2L)
    assert(delta.inputFiles.length === full.inputFiles.length / 2,
      s"delta read ${delta.inputFiles.length} files")
    val v1Count = ScaleOps.readSnapshot(spark, root, Some(1L)).count()
    assert(delta.count() === full.count() - v1Count)
    // v2→v3 was a compaction REWRITE: no shared files, so the
    // file-grain delta is v3's whole content (the documented limit —
    // s04's content diff is the tool for that hop)
    assert(ScaleOps.readSnapshotChanges(spark, root, 2L, 3L).count() ===
      full.count())
    // no-op hop: empty frame, schema intact
    val none = ScaleOps.readSnapshotChanges(spark, root, 2L, 2L)
    assert(none.count() === 0L && none.columns.contains("lang"))
    intercept[IllegalArgumentException] {
      ScaleOps.readSnapshotChanges(spark, root, 3L, 1L)
    }
  }

  test("s05's plan matches the fixture history: append adds, compaction adds zero") {
    val sf = "/root/testdata/sf0.001"
    val rows = ScaleOps.s05VacuumPlan(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === Seq(1L, 2L, 3L))
    assert(rows.map(_._2) === Seq("expired", "retained", "retained"))
    val total = graft.Tables.documents(spark, sf).count()
    val Seq(r1, r2, r3) = rows
    assert(r1._3 === r1._4)            // v1: everything is new
    assert(r2._3 === total)            // v2 = the full corpus
    assert(r2._4 === total - r1._3)    // append added exactly the other half
    assert(r3._3 === total && r3._4 === 0L) // compaction adds nothing
  }
}
