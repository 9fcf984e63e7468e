package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Release reports committed against snapshot versions: visible
  * atomically with (and only with) their version's manifest, crash
  * debris invisible and retried cleanly, reclaimed by vacuum with
  * their version. */
class ReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_reltest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def report(n: Long) =
    Seq(("stats", 0L, "k", null.asInstanceOf[String], "m", n))
      .toDF("section", "grain", "k1", "k2", "metric", "lv")

  test("a release can only be published for a committed version") {
    val root = freshRoot("gate")
    fs(root).delete(new Path(root), true)
    intercept[IllegalArgumentException] {
      ScaleOps.publishRelease(spark, root, 1L, report(1L))
    }
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a")).toDF("id", "s"))
    intercept[IllegalArgumentException] {
      ScaleOps.publishRelease(spark, root, 2L, report(1L)) // future slot
    }
    assert(ScaleOps.publishRelease(spark, root, 1L, report(7L)))
    assert(ScaleOps.hasRelease(spark, root, 1L))
    assert(ScaleOps.readRelease(spark, root, 1L)
      .select(col("lv")).as[Long].collect().toSeq === Seq(7L))
    // re-publish is an absorbed no-op, content unchanged
    assert(!ScaleOps.publishRelease(spark, root, 1L, report(9L)))
    assert(ScaleOps.readRelease(spark, root, 1L)
      .select(col("lv")).as[Long].collect().toSeq === Seq(7L))
  }

  test("crash debris (report data without pointer) is invisible and retried cleanly") {
    val root = freshRoot("crash")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a")).toDF("id", "s"))
    // simulate a crash between the report write and the pointer
    // rename: an attempt dir exists, the .release pointer does not
    val debris = new Path(root, "release-v1-deadbeef")
    report(1L).write.parquet(debris.toString)
    assert(!ScaleOps.hasRelease(spark, root, 1L))
    intercept[IllegalArgumentException] {
      ScaleOps.readRelease(spark, root, 1L)
    }
    // the retry claims the release cleanly beside the debris
    assert(ScaleOps.publishRelease(spark, root, 1L, report(3L)))
    assert(ScaleOps.readRelease(spark, root, 1L)
      .select(col("lv")).as[Long].collect().toSeq === Seq(3L))
    // the orphan attempt is vacuum's to reclaim — but only past the
    // grace period (an attempt this young could be an IN-FLIGHT
    // publish; the grace keeps the sweep off the publish window)
    ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    assert(fs(root).exists(debris),
      "vacuum swept a release attempt inside the grace period")
    ScaleOps.vacuumSnapshots(spark, root, keep = 1, releaseGraceMs = 0L)
    assert(!fs(root).exists(debris),
      "vacuum left the crashed release attempt behind")
    assert(ScaleOps.readRelease(spark, root, 1L).count() === 1L)
  }

  test("vacuum reclaims an expired version's release and keeps the retained one") {
    val root = freshRoot("vac")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a")).toDF("id", "s"))
    ScaleOps.publishSnapshot(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    ScaleOps.publishRelease(spark, root, 1L, report(1L))
    ScaleOps.publishRelease(spark, root, 2L, report(2L))
    val (_, bytes) =
      ScaleOps.vacuumSnapshots(spark, root, keep = 1, releaseGraceMs = 0L)
    assert(bytes > 0L)
    assert(!ScaleOps.hasRelease(spark, root, 1L))
    assert(!fs(root).exists(new Path(root, "_manifests/v1.release")))
    // v1's release attempt dir is fully reclaimed with its version
    assert(fs(root).listStatus(new Path(root))
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("release-v1"))
      .isEmpty)
    assert(ScaleOps.hasRelease(spark, root, 2L))
    assert(ScaleOps.readRelease(spark, root, 2L)
      .select(col("lv")).as[Long].collect().toSeq === Seq(2L))
  }

  test("s07: the committed report equals the report recomputed from the pinned read") {
    val sf = "/root/testdata/sf0.001"
    val got = ScaleOps.s07ReleaseReport(spark, sf).collect().toSeq
    assert(got.nonEmpty)
    val root = ScaleOps.ensureRelease(spark, sf)
    val recomputed = ScaleOps.releaseReportOf(spark,
      ScaleOps.readSnapshot(spark, root, Some(2L)))
      .orderBy(col("section"), col("grain"), col("k1"), col("k2"),
        col("metric")).collect().toSeq
    assert(got === recomputed)
    // all four sections are present
    assert(got.map(_.getString(0)).distinct.sorted ===
      Seq("card", "decon", "mix", "tokens"))
  }
}
