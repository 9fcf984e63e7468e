package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Named refs over the snapshot store: atomic retarget, rollback by
  * re-pointing, crash-debris invisibility, and the vacuum pin — a
  * ref'd version survives keep-newest retention with its files. */
class RefSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_reftest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("retarget switches readers atomically; rollback is a re-point") {
    val root = freshRoot("move")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a")).toDF("id", "s"))
    ScaleOps.publishSnapshot(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    ScaleOps.setRef(spark, root, "prod", 1L)
    assert(ScaleOps.readSnapshotAt(spark, root, "prod").count() === 1L)
    ScaleOps.setRef(spark, root, "prod", 2L)
    assert(ScaleOps.resolveRef(spark, root, "prod") === 2L)
    assert(ScaleOps.readSnapshotAt(spark, root, "prod").count() === 2L)
    // rollback: point back — no data moves, the old bytes still answer
    ScaleOps.setRef(spark, root, "prod", 1L)
    assert(ScaleOps.readSnapshotAt(spark, root, "prod").count() === 1L)
    // an uncommitted target is refused
    intercept[IllegalArgumentException] {
      ScaleOps.setRef(spark, root, "prod", 9L)
    }
  }

  test("crashed retarget debris is invisible and swept") {
    val root = freshRoot("crash")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a")).toDF("id", "s"))
    ScaleOps.setRef(spark, root, "prod", 1L)
    // a retarget that died between write and rename
    val dir = new Path(root, "_refs/prod")
    val out = fs(root).create(new Path(dir, ".tmp-r2-dead"), true)
    try out.write("9".getBytes("UTF-8")) finally out.close()
    assert(ScaleOps.resolveRef(spark, root, "prod") === 1L)
    ScaleOps.publishSnapshot(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    ScaleOps.setRef(spark, root, "prod", 2L) // sweeps the debris
    assert(!fs(root).exists(new Path(dir, ".tmp-r2-dead")))
    assert(ScaleOps.resolveRef(spark, root, "prod") === 2L)
  }

  test("a ref pins its target against vacuum, files included") {
    val root = freshRoot("pin")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a")).toDF("id", "s"))
    // two REWRITE publishes (no file sharing) so v1's files are
    // reclaimable the moment v1 expires
    ScaleOps.publishSnapshot(spark, root,
      Seq((2L, "b")).toDF("id", "s"))
    ScaleOps.publishSnapshot(spark, root,
      Seq((3L, "c")).toDF("id", "s"))
    ScaleOps.setRef(spark, root, "golden", 1L)
    val (n, _) = ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    // v2 expired (nobody pins it); v1 survives with its data
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L, 3L))
    assert(n === 1L)
    assert(ScaleOps.readSnapshotAt(spark, root, "golden")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a")))
    // un-pin and vacuum again: now v1 goes
    ScaleOps.setRef(spark, root, "golden", 3L)
    ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(3L))
  }
}
