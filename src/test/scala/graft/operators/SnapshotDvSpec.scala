package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: point DML writes a tiny (file,
  * position) vector instead of rewriting files; every read path
  * anti-joins the vectors out; compaction materializes them away;
  * vacuum reclaims the dirs. Pins: the MoR/CoW content twin, the
  * ZERO-data-files write-amplification claim, DV merge on repeated
  * deletes, MoR UPDATE/MERGE, change-feed and time-travel semantics
  * across DV hops, compaction materialization, vacuum accounting. */
class SnapshotDvSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_dv_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** 400 rows range-clustered on id into 4 files, statscol id. */
  private def seeded(tag: String): String = {
    val root = freshRoot(tag)
    fs(root).delete(new Path(root), true)
    val df = (0L until 400L).map(i => (i, s"r$i", i % 10))
      .toDF("id", "s", "q").repartitionByRange(4, col("id"))
    ScaleOps.publishSnapshot(spark, root, df, statsCol = Some("id"))
    root
  }

  private def sortedRows(df: DataFrame): Seq[(Long, String, Long)] =
    df.select("id", "s", "q").as[(Long, String, Long)].collect()
      .sortBy(_._1).toSeq

  test("MoR point delete touches ZERO data files; CoW twin matches row-for-row") {
    val mor = seeded("mor1")
    val cow = seeded("cow1")
    val pred = col("id") >= 100L && col("id") <= 105L
    val cons = Seq(ScaleOps.ColConstraint("id", Some(100L), Some(105L), None))
    ScaleOps.deleteWhereSnapshot(spark, mor, pred, cons, mode = "mor")
    ScaleOps.deleteWhereSnapshot(spark, cow, pred, cons, mode = "cow")
    // write amplification: the MoR commit added NO data files and
    // dropped none — v2's file list IS v1's; the CoW twin rewrote
    val morV1 = ScaleOps.manifestFiles(spark, mor, 1L).toSet
    val morV2 = ScaleOps.manifestFiles(spark, mor, 2L).toSet
    assert(morV2 === morV1, "MoR delete changed the data file set")
    val cowV2 = ScaleOps.manifestFiles(spark, cow, 2L).toSet
    assert(cowV2 !== ScaleOps.manifestFiles(spark, cow, 1L).toSet)
    // the dv field landed on exactly the touched file(s), count right
    val dvs = ScaleOps.manifestDvs(spark, mor, 2L)
    assert(dvs.nonEmpty && dvs.values.map(_._2).sum === 6L,
      s"dv accounting wrong: $dvs")
    // content: the twins agree exactly, and match the relational truth
    val want = (0L until 400L).filterNot(i => i >= 100 && i <= 105)
      .map(i => (i, s"r$i", i % 10))
    assert(sortedRows(ScaleOps.readSnapshot(spark, mor)) === want)
    assert(sortedRows(ScaleOps.readSnapshot(spark, cow)) === want)
    // snapshot isolation: v1 still reads whole on both
    assert(ScaleOps.readSnapshot(spark, mor, Some(1L)).count() === 400L)
    // pruned/keyed reads mask too
    assert(ScaleOps.readSnapshotPruned(spark, mor, None, "id", 90L, 110L)
      .select("id").as[Long].collect().sorted.toSeq ===
      ((90L to 99L) ++ (106L to 110L)))
    assert(ScaleOps.readSnapshotKeyLookup(spark, mor, None, "id",
      Seq(100L, 107L)).count() === 1L)
  }

  test("auto mode picks MoR for a narrow delete and CoW for a broad one") {
    val root = seeded("auto")
    // narrow: 1 of 4 files touched (0.25 > default 0.2) — set the
    // threshold so the fraction gate is what's exercised
    spark.conf.set("spark.graft.snapshot.morMaxTouchedFraction", "0.3")
    try {
      ScaleOps.deleteWhereSnapshot(spark, root, col("id") === 7L,
        Seq(ScaleOps.ColConstraint("id", Some(7L), Some(7L), Some(Seq(7L)))),
        mode = "auto")
      assert(ScaleOps.snapshotHasDvs(spark, root, 2L), "narrow delete not MoR")
      // broad: every file touched — auto must rewrite (materializing
      // its own range, no DV debt)
      ScaleOps.deleteWhereSnapshot(spark, root, col("q") === 3L,
        Nil, mode = "auto")
      val dvs3 = ScaleOps.manifestDvs(spark, root, 3L)
      assert(dvs3.isEmpty, s"broad delete left DV debt: $dvs3")
      assert(!ScaleOps.snapshotHasDvs(spark, root, 3L))
      val want = (0L until 400L).filter(i => i != 7L && i % 10 != 3L)
      assert(ScaleOps.readSnapshot(spark, root).select("id")
        .as[Long].collect().sorted.toSeq === want)
    } finally
      spark.conf.unset("spark.graft.snapshot.morMaxTouchedFraction")
  }

  test("a second MoR delete on the same file merges the vectors (cumulative dir)") {
    val root = seeded("merge2")
    def del(lo: Long, hi: Long): Unit =
      ScaleOps.deleteWhereSnapshot(spark, root,
        col("id") >= lo && col("id") <= hi,
        Seq(ScaleOps.ColConstraint("id", Some(lo), Some(hi), None)),
        mode = "mor")
    del(10L, 12L)
    del(14L, 15L) // same file
    val dvs = ScaleOps.manifestDvs(spark, root, 3L)
    assert(dvs.values.map(_._2).sum === 5L, s"cumulative count wrong: $dvs")
    // one dir reference per line, and it is the NEWER commit's
    assert(dvs.values.map(_._1).toSet.size === 1)
    val got = ScaleOps.readSnapshot(spark, root).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got === (0L until 400L).filterNot(i =>
      (i >= 10 && i <= 12) || (i >= 14 && i <= 15)))
    // the intermediate version applies only ITS vectors
    assert(ScaleOps.readSnapshot(spark, root, Some(2L)).count() === 397L)
  }

  test("MoR UPDATE appends post-images only; MoR MERGE writes O(batch)") {
    val root = seeded("upd")
    ScaleOps.updateWhereSnapshot(spark, root, col("id") === 42L,
      Seq("s" -> lit("touched")),
      Seq(ScaleOps.ColConstraint("id", Some(42L), Some(42L), None)),
      mode = "mor")
    // v1's files all carried forward; one new appended file set
    val v1f = ScaleOps.manifestFiles(spark, root, 1L).toSet
    val v2f = ScaleOps.manifestFiles(spark, root, 2L).toSet
    assert(v1f.subsetOf(v2f), "MoR update rewrote a carried file")
    val rows = ScaleOps.readSnapshot(spark, root)
      .select("id", "s").as[(Long, String)].collect().toMap
    assert(rows.size === 400 && rows(42L) === "touched" && rows(41L) === "r41")
    // MoR MERGE: matched preimages DV'd, the whole batch appended
    val batch = Seq((42L, "merged42", 0L), (500L, "ins500", 1L))
      .toDF("id", "s", "q")
    ScaleOps.mergeIntoSnapshot(spark, root, "id", batch, mode = "mor")
    val v3f = ScaleOps.manifestFiles(spark, root, 3L).toSet
    assert(v2f.subsetOf(v3f), "MoR merge rewrote a carried file")
    val after = ScaleOps.readSnapshot(spark, root)
      .select("id", "s").as[(Long, String)].collect().toMap
    assert(after.size === 401 && after(42L) === "merged42" &&
      after(500L) === "ins500" && after(43L) === "r43")
    // CoW-twin equivalence for the same merge
    val twin = seeded("updtwin")
    ScaleOps.updateWhereSnapshot(spark, twin, col("id") === 42L,
      Seq("s" -> lit("touched")),
      Seq(ScaleOps.ColConstraint("id", Some(42L), Some(42L), None)),
      mode = "cow")
    ScaleOps.mergeIntoSnapshot(spark, twin, "id", batch, mode = "cow")
    assert(sortedRows(ScaleOps.readSnapshot(spark, root)) ===
      sortedRows(ScaleOps.readSnapshot(spark, twin)))
  }

  test("DSv2/SQL face reads DV'd versions through the resolution rule") {
    val root = seeded("dsv2")
    ScaleOps.deleteWhereSnapshot(spark, root,
      col("id") >= 200L && col("id") <= 220L,
      Seq(ScaleOps.ColConstraint("id", Some(200L), Some(220L), None)),
      mode = "mor")
    val got = spark.read.format("graft-snapshot").load(root)
    assert(got.count() === 379L)
    assert(got.filter(col("id").between(195L, 225L)).select("id")
      .as[Long].collect().sorted.toSeq ===
      ((195L to 199L) ++ (221L to 225L)))
    // SQL text over the same face
    got.createOrReplaceTempView("dv_t")
    assert(spark.sql("SELECT count(*) FROM dv_t WHERE id < 250")
      .as[Long].head() === 229L)
    // time travel: the pre-delete version reads whole
    assert(spark.read.format("graft-snapshot").option("version", "1")
      .load(root).count() === 400L)
  }

  test("change feed and incremental sync see a MoR delete as a delete hop") {
    val root = seeded("feed")
    ScaleOps.deleteWhereSnapshot(spark, root,
      col("id") >= 50L && col("id") <= 59L,
      Seq(ScaleOps.ColConstraint("id", Some(50L), Some(59L), None)),
      mode = "mor")
    val feed = ScaleOps.readSnapshotChangeFeed(spark, root, 1L, 2L)
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq === (50L to 59L))
    assert(feed.filter(col("_change_type") === "insert").count() === 0L)
  }

  test("compaction materializes DVs away; vacuum reclaims the dirs with byte accounting") {
    val root = seeded("compact")
    ScaleOps.deleteWhereSnapshot(spark, root,
      col("id") >= 300L && col("id") <= 310L,
      Seq(ScaleOps.ColConstraint("id", Some(300L), Some(310L), None)),
      mode = "mor")
    assert(ScaleOps.snapshotHasDvs(spark, root, 2L))
    val v3 = ScaleOps.compactSnapshot(spark, root, targetBytes = 1L << 30,
      statsCol = Some("id"))
    assert(v3 === 3L)
    // the rewrite dropped the DV'd rows physically and the field
    assert(!ScaleOps.snapshotHasDvs(spark, root, 3L))
    assert(ScaleOps.manifestDvs(spark, root, 3L).isEmpty)
    val want = (0L until 400L).filterNot(i => i >= 300 && i <= 310)
    assert(ScaleOps.readSnapshot(spark, root).select("id")
      .as[Long].collect().sorted.toSeq === want)
    // the dv dir is still referenced by v2 — vacuum keeping v2 must
    // keep it; expiring v2 must reclaim it (counted bytes)
    val dvDirs = fs(root).listStatus(new Path(root))
      .map(_.getPath.getName).filter(_.startsWith("dv-v")).toSeq
    assert(dvDirs.size === 1)
    ScaleOps.vacuumSnapshots(spark, root, keep = 2) // keeps v2, v3
    assert(fs(root).exists(new Path(root, dvDirs.head)),
      "vacuum swept a dv dir a retained manifest references")
    val (n, bytes) = ScaleOps.vacuumSnapshots(spark, root, keep = 1)
    assert(!fs(root).exists(new Path(root, dvDirs.head)),
      "vacuum left an unreferenced dv dir")
    assert(n >= 1L && bytes > 0L, s"dv reclaim unaccounted: ($n, $bytes)")
    // post-vacuum content intact
    assert(ScaleOps.readSnapshot(spark, root).count() === 389L)
  }

  test("the CDC upsert sink path picks MoR automatically: a small batch rewrites NO files") {
    // the round-12 scale-killer scenario: a store of many files takes
    // a steady stream of small upsert batches (snapshotMergeOnce is
    // the sink's commit). With auto-MoR the per-trigger write is
    // O(batch) — matched preimages become DV positions, the batch
    // appends — instead of rewriting every touched file forever.
    val root = freshRoot("sink")
    fs(root).delete(new Path(root), true)
    val df = (0L until 1000L).map(i => (i, s"r$i", i % 10))
      .toDF("id", "s", "q").repartitionByRange(10, col("id"))
    ScaleOps.publishSnapshot(spark, root, df, statsCol = Some("id"))
    val v1f = ScaleOps.manifestFiles(spark, root, 1L).toSet
    // batch 1: one update + one insert → touches 1/10 files → MoR
    val b1 = Seq((500L, "upd500", -1L), (2000L, "ins2000", -1L))
      .toDF("id", "s", "q")
    assert(ScaleOps.snapshotMergeOnce(spark, root, "id", b1, "batch:1")
      === Some(2L))
    val v2f = ScaleOps.manifestFiles(spark, root, 2L).toSet
    assert(v1f.subsetOf(v2f), "sink merge rewrote a carried file")
    assert(ScaleOps.snapshotHasDvs(spark, root, 2L))
    // replay absorbed (exactly-once), then a second batch composes
    assert(ScaleOps.snapshotMergeOnce(spark, root, "id", b1, "batch:1")
      === None)
    val b2 = Seq((500L, "upd500b", -2L)).toDF("id", "s", "q")
    assert(ScaleOps.snapshotMergeOnce(spark, root, "id", b2, "batch:2")
      === Some(3L))
    val rows = ScaleOps.readSnapshot(spark, root)
      .select("id", "s").as[(Long, String)].collect().toMap
    assert(rows.size === 1001)
    assert(rows(500L) === "upd500b" && rows(2000L) === "ins2000" &&
      rows(501L) === "r501")
  }

  /** Files the executed plan actually planned, across BOTH halves of
    * the composed merge-on-read read: the connector's clean half
    * ([[graft.sources.SnapshotScan.plannedFiles]]) plus the v1 DV'd
    * half ([[graft.sources.SnapshotPruningFileIndex]]'s last
    * listing). AQE off so the scans sit in the executed tree. */
  private def dvFilesOpened(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case g: graft.sources.SnapshotScan => g.plannedFiles.length
          case _ => 0
        }
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location match {
          case i: graft.sources.SnapshotPruningFileIndex =>
            i.lastPlanned.length
          case _ => 0
        }
    }.sum
  }

  test("round-14 pin: a selective SQL read over a DV'd version opens only zone-map-kept files") {
    val root = seeded("dvprune")
    // DV file 2 (ids 100-199): the store now carries vectors
    ScaleOps.deleteWhereSnapshot(spark, root, col("id").between(100L, 105L),
      Seq(ScaleOps.ColConstraint("id", Some(100L), Some(105L), None)),
      mode = "mor")
    assert(ScaleOps.snapshotHasDvs(spark, root, 2L))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // selective read AWAY from the DV'd file: the clean half keeps
      // exactly one file, the DV'd half prunes to ZERO — the pruning
      // outage the old unpruned composed read had is closed
      val q1 = spark.read.format("graft-snapshot").load(root)
        .filter(col("id").between(300L, 310L))
      assert(q1.select("id").as[Long].collect().sorted.toSeq ===
        (300L to 310L))
      assert(dvFilesOpened(q1) === 1,
        "a selective DV'd-version read planned more than the zone-map-kept file")
      // selective read INTO the DV'd file: the v1 half keeps exactly
      // that file, the clean half prunes to zero — and the vectors
      // still mask the deleted rows
      val q2 = spark.read.format("graft-snapshot").load(root)
        .filter(col("id").between(100L, 120L))
      assert(q2.select("id").as[Long].collect().sorted.toSeq ===
        (106L to 120L))
      assert(dvFilesOpened(q2) === 1,
        "the DV'd half lost manifest-grain pruning")
      // SQL text over the face prunes the same way
      spark.read.format("graft-snapshot").load(root)
        .createOrReplaceTempView("dvprune_t")
      val q3 = spark.sql(
        "SELECT sum(id) AS s FROM dvprune_t WHERE id BETWEEN 0 AND 50")
      assert(q3.as[Long].head() === (0L to 50L).sum)
      assert(dvFilesOpened(q3) === 1)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("round-14 regression: shared dv dirs never double-count re-pointed files") {
    val root = seeded("dvdirs")
    def morDelete(ids: Seq[Long]): Long =
      ScaleOps.deleteWhereSnapshot(spark, root, col("id").isin(ids: _*),
        Seq(ScaleOps.ColConstraint("id", Some(ids.min), Some(ids.max),
          Some(ids))), mode = "mor")
    // v2 deletes in files 1 AND 2 → one dir carries rows for both
    morDelete(Seq(10L, 110L))
    // v3 deletes in file 1 only → file 1 re-points to the new dir,
    // file 2 still references v2's dir, which HOLDS file 1's old row
    morDelete(Seq(20L))
    // v4 deletes in files 1 AND 2 again: the union read must take
    // file 1's rows ONLY from its own dir — the flat union-all-dirs
    // read returned id=10's position twice here, overcounting the
    // manifest and growing the dir
    morDelete(Seq(30L, 130L))
    val dvs = ScaleOps.manifestDvs(spark, root, 4L)
    assert(dvs.values.map(_._2).sum === 5L,
      s"dv accounting overcounts: $dvs")
    // the committed dir itself holds no duplicate (f, pos) rows
    val dirRows = dvs.values.map(_._1).toSeq.distinct.map(dir =>
      spark.read.parquet(new Path(root, dir).toString))
      .reduce(_ unionByName _).select("f", "pos")
    assert(dirRows.count() === dirRows.distinct().count())
    assert(dirRows.count() === 5L)
    // and the content is exactly the five deletions
    assert(ScaleOps.readSnapshot(spark, root).count() === 395L)
    assert(ScaleOps.readSnapshot(spark, root)
      .filter(col("id").isin(10L, 20L, 30L, 110L, 130L)).count() === 0L)
  }

  test("round-14 pin: a DV-carrying table as MERGE SOURCE never resurrects deleted rows") {
    val src = seeded("dvsrc")
    val dst = freshRoot("dvdst")
    fs(dst).delete(new Path(dst), true)
    // target starts with ids 0..49, stale strings
    ScaleOps.publishSnapshot(spark, dst,
      (0L until 50L).map(i => (i, "stale", 0L)).toDF("id", "s", "q"),
      statsCol = Some("id"))
    // MoR-delete ids 0..9 from the SOURCE, then merge source → target
    ScaleOps.deleteWhereSnapshot(spark, src, col("id") < 10L,
      Seq(ScaleOps.ColConstraint("id", None, Some(9L), None)), mode = "mor")
    ScaleOps.mergeIntoSnapshot(spark, dst, "id",
      spark.read.format("graft-snapshot").load(src)
        .filter(col("id") < 50L))
    val rows = ScaleOps.readSnapshot(spark, dst)
      .select("id", "s").as[(Long, String)].collect().toMap
    // ids 0..9 were deleted in the source BEFORE the merge: the
    // merge saw 40 source rows, so the stale target rows survive
    assert(rows.size === 50)
    (0L until 10L).foreach(i => assert(rows(i) === "stale",
      s"deleted source row $i resurrected into the merge"))
    (10L until 50L).foreach(i => assert(rows(i) === s"r$i"))
  }

  test("s22 fixture: the MoR store, the CoW twin and the relational truth agree") {
    val d = "/root/testdata/sf0.001"
    val (morRoot, cowRoot) = ScaleOps.ensureDvStores(spark, d)
    val got = ScaleOps.s22DvRead(spark, d)
      .as[(String, String, Long, Long)].collect().toSeq
    def profile(df: DataFrame) = df
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy(col("source"), col("lang"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === profile(ScaleOps.readSnapshot(spark, cowRoot)))
    assert(got === profile(graft.Tables.documents(spark, d)
      .filter(pmod(col("doc_id"), lit(31L)) =!= 0L)))
    // and the MoR store's data file set is its v1's (zero rewrites)
    assert(ScaleOps.manifestFiles(spark, morRoot, 2L).toSet ===
      ScaleOps.manifestFiles(spark, morRoot, 1L).toSet)
  }
}
