package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Bloom fingerprints on the snapshot store: point lookups skip
  * files proven key-free even when every file's zone-map interval
  * spans the id space, fingerprint-less stores degrade to full
  * reads, appends carry parent fingerprints forward — and pruning
  * never loses a requested key (the publish-side and probe-side
  * hash agree by construction: same Catalyst expression). */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_bloomtest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** ids hash-scattered over 8 files: each file's [min,max] id
    * interval spans ~the whole range, so zone maps keep everything
    * and any skipping is the Bloom field's doing. */
  private def scatteredDf(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(8, col("id"))

  test("a point lookup opens a fraction of the files and never loses its key") {
    val root = freshRoot("skip")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, scatteredDf(0 until 400),
      statsCol = Some("id"), statsBloom = true)
    val full = ScaleOps.readSnapshot(spark, root, Some(1L))
    assert(full.inputFiles.length === 8)
    for (k <- Seq(0L, 137L, 399L)) {
      val hit = ScaleOps.readSnapshotKeyLookup(spark, root, Some(1L), "id", Seq(k))
      assert(hit.inputFiles.length < 8,
        s"key $k: no skipping (${hit.inputFiles.length} of 8 files)")
      assert(hit.as[(Long, String)].collect().toSeq === Seq((k, s"row$k")),
        s"key $k lost by Bloom planning")
    }
    // multi-key lookup: one scan over the union of surviving files
    val multi = ScaleOps.readSnapshotKeyLookup(spark, root, Some(1L), "id",
      Seq(0L, 137L, 399L))
    assert(multi.inputFiles.length < 8)
    assert(multi.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      Seq(0L, 137L, 399L))
  }

  test("an absent key inside every zone-map interval returns empty without a full scan") {
    val root = freshRoot("absent")
    fs(root).delete(new Path(root), true)
    // even ids only: odd keys are inside every [min,max] but in no file
    val even = (0 until 800 by 2).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(8, col("id"))
    ScaleOps.publishSnapshot(spark, root, even,
      statsCol = Some("id"), statsBloom = true)
    val miss = ScaleOps.readSnapshotKeyLookup(spark, root, Some(1L), "id", Seq(333L))
    assert(miss.count() === 0L)
    // 4096-bit filter at ~50 keys/file: false-keep is the rare
    // exception, so the miss must open well under half the files
    assert(miss.inputFiles.length < 4,
      s"absent key opened ${miss.inputFiles.length} of 8 files")
  }

  test("a store without fingerprints degrades to keeping every file, never to wrong answers") {
    val root = freshRoot("degrade")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, scatteredDf(0 until 100),
      statsCol = Some("id")) // stats, but no bloom
    val hit = ScaleOps.readSnapshotKeyLookup(spark, root, Some(1L), "id", Seq(37L))
    assert(hit.inputFiles.length ===
      ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.length)
    assert(hit.as[(Long, String)].collect().toSeq === Seq((37L, "row37")))
  }

  test("append carries parent fingerprints; lookups skip across both publishes") {
    val root = freshRoot("carry")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, scatteredDf(0 until 200),
      statsCol = Some("id"), statsBloom = true)
    ScaleOps.appendSnapshot(spark, root, scatteredDf(200 until 400),
      statsCol = Some("id"), statsBloom = true)
    val full = ScaleOps.readSnapshot(spark, root, Some(2L))
    assert(full.inputFiles.length === 16)
    // one key from each publish: the v1 key's fingerprint was carried
    // forward by the append, not recomputed
    val hit = ScaleOps.readSnapshotKeyLookup(spark, root, Some(2L), "id",
      Seq(55L, 355L))
    assert(hit.inputFiles.length < 16,
      s"no skipping across publishes (${hit.inputFiles.length} of 16)")
    assert(hit.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      Seq(55L, 355L))
  }
}
