package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Delta-encoded manifests on the snapshot store: the streaming
  * append hot path writes O(batch) metadata (a `#parent:` pointer
  * plus its own lines), every CHECKPOINT_EVERY-th version and every
  * rewrite op writes a resolved full listing, reads walk the bounded
  * chain, and vacuum materializes `.full` listings for retained
  * versions before deleting expired chain links. */
class ManifestDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_deltaman_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rawLines(root: String, name: String): Seq[String] = {
    val in = fs(root).open(new Path(root, s"_manifests/$name"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def df1(id: Long) = Seq((id, s"row$id")).toDF("id", "s").coalesce(1)

  test("appends write O(batch) delta manifests; reads resolve the chain") {
    val root = freshRoot("delta")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, df1(1L), statsCol = Some("id"))
    ScaleOps.appendSnapshot(spark, root, df1(2L), statsCol = Some("id"),
      tag = Some("batch:1"))
    ScaleOps.appendSnapshot(spark, root, df1(3L), statsCol = Some("id"))
    // v2's raw manifest: tag header, parent pointer, ONE data line —
    // O(batch), not O(live files)
    val v2 = rawLines(root, "v2.manifest")
    assert(v2.head === "#tag:batch:1")
    assert(v2(1) === "#parent:1")
    assert(v2.count(!_.startsWith("#")) === 1)
    assert(rawLines(root, "v3.manifest").count(!_.startsWith("#")) === 1)
    // the chain resolves: v3 reads all three rows, v2 reads two
    assert(ScaleOps.readSnapshot(spark, root, Some(3L))
      .as[(Long, String)].collect().map(_._1).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(ScaleOps.readSnapshot(spark, root, Some(2L)).count() === 2L)
    // the tag probe still reads the raw first line of a delta
    assert(ScaleOps.manifestTag(spark, root, 2L) === Some("batch:1"))
  }

  test("a rewrite op commits a full listing — the chain collapses") {
    val root = freshRoot("rewrite")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, df1(1L), statsCol = Some("id"))
    ScaleOps.appendSnapshot(spark, root, df1(2L), statsCol = Some("id"))
    ScaleOps.mergeIntoSnapshot(spark, root, "id", df1(9L))
    val v3 = rawLines(root, "v3.manifest")
    assert(!v3.exists(_.startsWith("#parent:")))
    assert(v3.count(!_.startsWith("#")) >= 2) // carried + new files
    assert(ScaleOps.readSnapshot(spark, root, Some(3L)).count() === 3L)
  }

  test("vacuum materializes .full for retained deltas before dropping expired parents") {
    val root = freshRoot("vac")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, df1(1L), statsCol = Some("id"))
    (2L to 5L).foreach(i =>
      ScaleOps.appendSnapshot(spark, root, df1(i), statsCol = Some("id")))
    ScaleOps.vacuumSnapshots(spark, root, keep = 2)
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(4L, 5L))
    // expired chain links are gone; the retained deltas read via .full
    assert(!fs(root).exists(new Path(root, "_manifests/v1.manifest")))
    assert(fs(root).exists(new Path(root, "_manifests/v5.full")))
    assert(ScaleOps.readSnapshot(spark, root, Some(5L))
      .as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(ScaleOps.readSnapshot(spark, root, Some(4L)).count() === 4L)
    // re-vacuum is a no-op on an already-clean store
    ScaleOps.vacuumSnapshots(spark, root, keep = 2)
    assert(ScaleOps.readSnapshot(spark, root, Some(5L)).count() === 5L)
  }

  test("the checkpoint cadence writes a full listing and resets the chain") {
    val root = freshRoot("ckpt")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, df1(1L), statsCol = Some("id"))
    (2L to 17L).foreach(i =>
      ScaleOps.appendSnapshot(spark, root, df1(i), statsCol = Some("id")))
    // v16 is the cadence checkpoint: full listing, no parent pointer
    val v16 = rawLines(root, "v16.manifest")
    assert(!v16.exists(_.startsWith("#parent:")))
    assert(v16.count(!_.startsWith("#")) === 16)
    // v17 chains off the checkpoint, one hop deep
    val v17 = rawLines(root, "v17.manifest")
    assert(v17.exists(_.startsWith("#parent:16")))
    assert(ScaleOps.readSnapshot(spark, root, Some(17L)).count() === 17L)
    // zone-map stats survive the whole chain: a pruned point read
    // over range-disjoint single-row files opens exactly one file
    val pruned = ScaleOps.readSnapshotPruned(spark, root, Some(17L), "id", 9L, 9L)
    assert(pruned.inputFiles.length === 1)
    assert(pruned.count() === 1L)
  }
}
