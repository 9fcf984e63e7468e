package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Zone-map sidecars on the snapshot store: pruned reads open only
  * the files whose [min,max] can satisfy the predicate, appends
  * carry the parent's stats forward, and stats-less stores degrade
  * to full reads — never to wrong answers. */
class SnapshotPruneSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_prunetest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rangedDf(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))

  test("a range read plans only the overlapping files and answers exactly") {
    val root = freshRoot("zm")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 400),
      statsCol = Some("id"))
    val pruned = ScaleOps.readSnapshotPruned(spark, root, Some(1L), "id", 10L, 60L)
    val full = ScaleOps.readSnapshot(spark, root, Some(1L))
      .filter(col("id") >= 10L && col("id") <= 60L)
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"no pruning: ${pruned.inputFiles.length} of ${full.inputFiles.length} files")
    assert(pruned.as[(Long, String)].collect().sorted.toSeq ===
      full.as[(Long, String)].collect().sorted.toSeq)
  }

  test("append carries parent stats; the v2 pruned read skips files of both writes") {
    val root = freshRoot("carry")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 200),
      statsCol = Some("id"))
    ScaleOps.appendSnapshot(spark, root, rangedDf(200 until 400),
      statsCol = Some("id"))
    val pruned = ScaleOps.readSnapshotPruned(spark, root, Some(2L), "id", 190L, 210L)
    val full = ScaleOps.readSnapshot(spark, root, Some(2L))
    assert(full.inputFiles.length === 8) // 4 reused + 4 appended
    // the straddling range needs one file from each publish
    assert(pruned.inputFiles.length < 8)
    assert(pruned.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (190L to 210L).toSeq)
  }

  test("a store published without stats still answers range reads (no sidecar, no pruning)") {
    val root = freshRoot("nostats")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 100))
    val pruned = ScaleOps.readSnapshotPruned(spark, root, Some(1L), "id", 5L, 20L)
    assert(pruned.inputFiles.length ===
      ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.length)
    assert(pruned.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (5L to 20L).toSeq)
  }

  test("a fully out-of-range predicate returns empty, pruning everything") {
    val root = freshRoot("empty")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 100),
      statsCol = Some("id"))
    val pruned = ScaleOps.readSnapshotPruned(spark, root, Some(1L), "id", 500L, 600L)
    assert(pruned.count() === 0L)
  }

  test("stats ride the manifest: vacuum drops them with expired versions, keeps them live") {
    val root = freshRoot("vacstats")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 50),
      statsCol = Some("id"))
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 100),
      statsCol = Some("id"))
    ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    assert(!fs(root).exists(new Path(root, "_manifests/v1.manifest")))
    // the surviving version's stats are INSIDE its manifest — pruning
    // still plans from metadata after the expired history is gone
    val pruned = ScaleOps.readSnapshotPruned(spark, root, Some(2L), "id", 5L, 20L)
    assert(pruned.inputFiles.length <
      ScaleOps.readSnapshot(spark, root, Some(2L)).inputFiles.length)
    assert(pruned.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (5L to 20L).toSeq)
  }

  test("an all-NULL stats column degrades to no bounds for that file, not a failed commit") {
    val root = freshRoot("nullstats")
    fs(root).delete(new Path(root), true)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true), StructField("s", StringType)))
    def part(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    // one file holds only NULL ids: its min/max are NULL and it must
    // simply get no zone-map entry (always kept), never an NPE
    val df = part(Seq(Row(null, "n1"), Row(null, "n2")))
      .union(part(Seq(Row(5L, "a"), Row(6L, "b"))))
    val v = ScaleOps.publishSnapshot(spark, root, df, statsCol = Some("id"))
    assert(v === 1L)
    val pruned = ScaleOps.readSnapshotPruned(spark, root, Some(1L), "id", 0L, 10L)
    assert(pruned.collect().map(_.getString(1)).sorted.toSeq === Seq("a", "b"))
  }

  test("a positional line never answers for a DIFFERENT column in a multi-column store") {
    // v1 is published single-column (positional stats for doc_id);
    // later commits declare (doc_id, quality). A constraint on
    // `quality` must NOT resolve v1's positional doc_id bounds — that
    // would prune v1's files with the WRONG column's min/max and
    // silently drop rows. The positional fallback is only sound when
    // the store's declared stats set is exactly the one column.
    val root = freshRoot("mixpos")
    fs(root).delete(new Path(root), true)
    // v1: doc_id 0-9, quality 100-109 — high quality, low ids
    val v1df = (0 until 10).map(i => (i.toLong, 100L + i, s"old$i"))
      .toDF("doc_id", "quality", "s").coalesce(1)
    ScaleOps.publishSnapshot(spark, root, v1df, statsCol = Some("doc_id"))
    // v2: doc_id 10-19, quality 0-9 — low quality, high ids
    val v2df = (10 until 20).map(i => (i.toLong, i.toLong - 10L, s"new$i"))
      .toDF("doc_id", "quality", "s").coalesce(1)
    ScaleOps.appendSnapshot(spark, root, v2df,
      statsCol = Some("doc_id,quality"))
    // quality >= 100 lives ONLY in v1's positional-stats file; under
    // the buggy fallback its doc_id bounds [0,9] "prove" it out
    val got = spark.read.format("graft-snapshot").load(root)
      .filter(col("quality") >= 100L)
    assert(got.count() === 10L,
      "rows vanished: positional doc_id stats answered a quality constraint")
    // and the sound single-column case still prunes: doc_id <= 9
    // needs only v1's file
    val prunedStill = spark.read.format("graft-snapshot").load(root)
      .filter(col("doc_id") <= 5L)
    assert(prunedStill.count() === 6L)
  }

  test("s06 prunes the fixture store and matches the raw-corpus slice") {
    val sfDir = "/root/testdata/sf0.001"
    val agg = ScaleOps.s06PrunedRead(spark, sfDir)
    val got = agg.as[(String, Long, Long)].collect().toSeq
    val docs = graft.Tables.documents(spark, sfDir)
    val mx = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .as[Long].collect()(0)
    val want = docs
      .filter(col("doc_id") >= mx * 2 / 10 && col("doc_id") <= mx * 4 / 10)
      .groupBy(col("lang"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(col("text")))
          .cast("long").as("ch"))
      .orderBy(col("lang")).as[(String, Long, Long)].collect().toSeq
    assert(got === want)
    // the aggregated frame's scan reads fewer than the version's files
    assert(agg.inputFiles.length < 8,
      s"s06 read ${agg.inputFiles.length} files — zone maps not pruning")
  }
}
