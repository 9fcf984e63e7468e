package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Copy-on-write MERGE on the snapshot store: interval-planned file
  * rewrites, untouched files carried verbatim, unmatched update keys
  * become inserts, parent versions stay isolated, and duplicate-key
  * update batches are refused. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_mergetest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rangedDf(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.as[(Long, String)].collect().sortBy(_._1).toSeq

  test("merge rewrites only interval-hit files and carries the rest verbatim") {
    val root = freshRoot("plan")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 400),
      statsCol = Some("id"))
    val v1Files = ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.toSet
    // updates confined to the low quarter + one insert above the range
    val batch = (Seq((5L, "UPD5"), (17L, "UPD17"), (1000L, "INS1000")))
      .toDF("id", "s")
    val v2 = ScaleOps.mergeIntoSnapshot(spark, root, "id", batch)
    assert(v2 === 2L)
    val v2Files = ScaleOps.readSnapshot(spark, root, Some(2L)).inputFiles.toSet
    val carried = v1Files.intersect(v2Files)
    assert(carried.size === 3, // 4 range files, only the low one hit
      s"expected 3 carried files, got ${carried.size}")
    val expected = (0 until 400).map(i => (i.toLong,
      if (i == 5) "UPD5" else if (i == 17) "UPD17" else s"row$i")) :+
      (1000L, "INS1000")
    assert(rows(ScaleOps.readSnapshot(spark, root, Some(2L))) ===
      expected.sortBy(_._1))
    // parent isolation: v1 still answers the original content
    assert(rows(ScaleOps.readSnapshot(spark, root, Some(1L))) ===
      (0 until 400).map(i => (i.toLong, s"row$i")))
  }

  test("a batch of only-new keys inserts without reading any base file") {
    val root = freshRoot("insert")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 100),
      statsCol = Some("id"))
    val v1Files = ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.toSet
    ScaleOps.mergeIntoSnapshot(spark, root, "id",
      Seq((500L, "a"), (501L, "b")).toDF("id", "s"))
    val v2 = ScaleOps.readSnapshot(spark, root, Some(2L))
    assert(v1Files.subsetOf(v2.inputFiles.toSet)) // every base file carried
    assert(v2.count() === 102L)
  }

  test("zone-map-pruned merge still replaces every matched key (scattered layout = all files touched)") {
    val root = freshRoot("scatter")
    fs(root).delete(new Path(root), true)
    // hash-scattered: every file's interval spans the range, so the
    // planner must touch all files — correctness over pruning
    ScaleOps.publishSnapshot(spark, root,
      (0 until 200).map(i => (i.toLong, s"row$i")).toDF("id", "s")
        .repartition(4, col("id")),
      statsCol = Some("id"))
    ScaleOps.mergeIntoSnapshot(spark, root, "id",
      Seq((3L, "U3"), (150L, "U150")).toDF("id", "s"))
    val got = rows(ScaleOps.readSnapshot(spark, root, Some(2L)))
    assert(got.length === 200)
    assert(got.find(_._1 == 3L).get._2 === "U3")
    assert(got.find(_._1 == 150L).get._2 === "U150")
  }

  test("duplicate keys in the update batch are refused") {
    val root = freshRoot("dup")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 50),
      statsCol = Some("id"))
    val e = intercept[IllegalArgumentException] {
      ScaleOps.mergeIntoSnapshot(spark, root, "id",
        Seq((1L, "a"), (1L, "b")).toDF("id", "s"))
    }
    assert(e.getMessage.contains("unique"))
  }

  test("a stats-less store degrades to rewriting everything, never to wrong answers") {
    val root = freshRoot("nostats")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 60)) // no stats
    ScaleOps.mergeIntoSnapshot(spark, root, "id",
      Seq((10L, "U10"), (99L, "I99")).toDF("id", "s"))
    val got = rows(ScaleOps.readSnapshot(spark, root, Some(2L)))
    assert(got.length === 61)
    assert(got.find(_._1 == 10L).get._2 === "U10")
    assert(got.find(_._1 == 99L).get._2 === "I99")
  }

  test("a batch with a new column is refused unless evolveSchema is set") {
    val root = freshRoot("evorefuse")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 40),
      statsCol = Some("id"))
    val batch = Seq((10L, "U10", 7L)).toDF("id", "s", "q")
    val e = intercept[IllegalArgumentException] {
      ScaleOps.mergeIntoSnapshot(spark, root, "id", batch)
    }
    assert(e.getMessage.contains("evolveSchema"))
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L)) // nothing committed
  }

  test("evolve-on-merge: new column lands for the batch, null-fills everywhere else") {
    val root = freshRoot("evo")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 40),
      statsCol = Some("id"))
    // update id 3 (rewrites its file), insert id 99 — both carry q
    val v2 = ScaleOps.mergeIntoSnapshot(spark, root, "id",
      Seq((3L, "U3", 30L), (99L, "I99", 990L)).toDF("id", "s", "q"),
      evolveSchema = true)
    assert(v2 === 2L)
    val got = ScaleOps.readSnapshotMerged(spark, root)
      .select("id", "s", "q")
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got.length === 41)
    assert(got.find(_._1 == 3L).get === ((3L, "U3", Some(30L))))
    assert(got.find(_._1 == 99L).get === ((99L, "I99", Some(990L))))
    // every carried row (rewritten-file survivors AND untouched
    // files' rows) null-fills
    assert(got.filterNot(r => r._1 == 3L || r._1 == 99L).forall(_._3.isEmpty))
    // untouched files stay physically column-free (carried verbatim)
    val v1Files = ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.toSet
    val carried = ScaleOps.readSnapshot(spark, root, Some(2L))
      .inputFiles.toSet.intersect(v1Files)
    assert(carried.nonEmpty)
    assert(!spark.read.parquet(carried.toSeq: _*).columns.contains("q"))
    // a FOLLOW-UP strict merge whose batch uses the evolved column
    // is legal now — the column is part of the store's merged schema
    val v3 = ScaleOps.mergeIntoSnapshot(spark, root, "id",
      Seq((5L, "U5", 50L)).toDF("id", "s", "q"))
    assert(v3 === 3L)
    val after = ScaleOps.readSnapshotMerged(spark, root)
      .select("id", "q").as[(Long, Option[Long])].collect().toMap
    assert(after(5L) === Some(50L))
    assert(after(3L) === Some(30L)) // earlier evolved value carried
    // and the change feed crosses the evolution hop: preimages
    // null-fill the column their files never had
    val feed = ScaleOps.readSnapshotChangeFeed(spark, root, 1L, 3L)
      .select("_commit_version", "_change_type", "id", "q")
      .as[(Long, String, Long, Option[Long])].collect().sorted.toSeq
    assert(feed === Seq(
      (2L, "delete", 3L, None),
      (2L, "insert", 3L, Some(30L)),
      (2L, "insert", 99L, Some(990L)),
      (3L, "delete", 5L, None),
      (3L, "insert", 5L, Some(50L))))
  }
}
