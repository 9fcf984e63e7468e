package graft.sources

import graft.SparkSpec
import graft.operators.ScaleOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** The snapshot store as a SQL catalog: CREATE TABLE / INSERT INTO /
  * INSERT OVERWRITE / df.writeTo(...).append() route through the
  * race-safe commit protocol (each write = one committed version),
  * SELECT prunes through the manifest, and the history stays
  * time-travelable on the path face. */
class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"),
    "graft_cat_spec").toString
  spark.conf.set("spark.sql.catalog.gcat",
    classOf[SnapshotCatalog].getName)
  spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)

  private def fs = new Path(wh)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def root(t: String) = new Path(wh, t).toString

  test("CREATE TABLE publishes an empty v1; INSERT INTO appends a version; SELECT reads both") {
    fs.delete(new Path(root("t1")), true)
    spark.sql("CREATE TABLE gcat.t1 (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('statscol' = 'id')")
    assert(ScaleOps.snapshotVersions(spark, root("t1")) === Seq(1L))
    assert(spark.sql("SELECT * FROM gcat.t1").count() === 0L)
    spark.sql("INSERT INTO gcat.t1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gcat.t1 VALUES (3, 'c')")
    assert(ScaleOps.snapshotVersions(spark, root("t1")) === Seq(1L, 2L, 3L))
    assert(spark.sql("SELECT * FROM gcat.t1").as[(Long, String)]
      .collect().sorted.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the created statscol property rode the #statscols: header and
    // the inserts kept writing stats under it
    val man = fs.open(new Path(root("t1"), "_manifests/v3.manifest"))
    val text = try scala.io.Source.fromInputStream(man, "UTF-8").mkString
      finally man.close()
    assert(text.contains("#statscols:id"))
  }

  test("writeTo(...).append() commits through the protocol; INSERT OVERWRITE is a new full version") {
    fs.delete(new Path(root("t2")), true)
    spark.sql("CREATE TABLE gcat.t2 (id BIGINT, s STRING)")
    (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s")
      .writeTo("gcat.t2").append()
    assert(ScaleOps.snapshotVersions(spark, root("t2")) === Seq(1L, 2L))
    spark.sql("INSERT OVERWRITE gcat.t2 VALUES (99, 'only')")
    assert(ScaleOps.snapshotVersions(spark, root("t2")) === Seq(1L, 2L, 3L))
    assert(spark.sql("SELECT * FROM gcat.t2").as[(Long, String)]
      .collect().toSeq === Seq((99L, "only")))
    // history is intact: the pre-overwrite version still reads whole
    assert(ScaleOps.readSnapshot(spark, root("t2"), Some(2L)).count() === 10L)
  }

  test("SELECT through the catalog prunes files via the header-declared stats columns") {
    fs.delete(new Path(root("t3")), true)
    spark.sql("CREATE TABLE gcat.t3 (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('statscol' = 'id')")
    (0L until 400L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
      .writeTo("gcat.t3").append()
    val pruned = spark.sql("SELECT * FROM gcat.t3 WHERE id BETWEEN 10 AND 60")
    pruned.collect()
    val scanned = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case g: SnapshotScan => g.plannedFiles
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.toSeq
          case _ => Seq.empty
        }
    }.flatten
    assert(scanned.length < 4,
      s"catalog read did not prune: ${scanned.length} files")
    assert(pruned.count() === 51L)
  }

  test("SQL DELETE routes to the zone-map-planned copy-on-write delete") {
    fs.delete(new Path(root("t5")), true)
    spark.sql("CREATE TABLE gcat.t5 (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('statscol' = 'id')")
    (0L until 400L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
      .writeTo("gcat.t5").append()
    spark.sql("DELETE FROM gcat.t5 WHERE id BETWEEN 100 AND 180")
    // one new committed version, exact surviving content
    assert(ScaleOps.snapshotVersions(spark, root("t5")) === Seq(1L, 2L, 3L))
    assert(spark.sql("SELECT count(*) FROM gcat.t5").as[Long].collect()(0)
      === 319L)
    assert(spark.sql(
      "SELECT count(*) FROM gcat.t5 WHERE id BETWEEN 100 AND 180")
      .as[Long].collect()(0) === 0L)
    // copy-on-write: untouched files carried forward verbatim — the
    // delete range clusters into 1-2 of the 4 files, so at least two
    // of v2's data files must survive INTO v3's manifest by path
    val v2Files = ScaleOps.manifestFiles(spark, root("t5"), 2L).toSet
    val v3Files = ScaleOps.manifestFiles(spark, root("t5"), 3L).toSet
    assert(v2Files.intersect(v3Files).size >= 2,
      "DELETE rewrote provably-untouched files")
    // the pre-delete version still reads whole (snapshot isolation)
    assert(ScaleOps.readSnapshot(spark, root("t5"), Some(2L)).count() === 400L)
    // the change feed carries exactly the dropped rows
    val feed = ScaleOps.readSnapshotChangeFeed(spark, root("t5"), 2L, 3L)
    assert(feed.filter(col("_change_type") === "delete").count() === 81L)
    // a DELETE whose predicate can touch nothing is a no-op version
    spark.sql("DELETE FROM gcat.t5 WHERE id > 5000")
    assert(ScaleOps.snapshotVersions(spark, root("t5")) === Seq(1L, 2L, 3L))
    // string predicates translate too (delete one surviving row)
    spark.sql("DELETE FROM gcat.t5 WHERE s = 'r300'")
    assert(spark.sql("SELECT count(*) FROM gcat.t5").as[Long].collect()(0)
      === 318L)
  }

  test("SQL MERGE INTO routes to the copy-on-write upsert") {
    fs.delete(new Path(root("t6")), true)
    spark.sql("CREATE TABLE gcat.t6 (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('statscol' = 'id')")
    (0L until 100L).map(i => (i, s"old$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
      .writeTo("gcat.t6").append()
    Seq((5L, "new5"), (42L, "new42"), (200L, "ins200"))
      .toDF("id", "s").createOrReplaceTempView("t6_updates")
    spark.sql("""MERGE INTO gcat.t6 AS t USING t6_updates AS u
                |ON t.id = u.id
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ScaleOps.snapshotVersions(spark, root("t6")) === Seq(1L, 2L, 3L))
    val rows = spark.sql("SELECT * FROM gcat.t6")
      .as[(Long, String)].collect().toMap
    assert(rows.size === 101)
    assert(rows(5L) === "new5" && rows(42L) === "new42" &&
      rows(200L) === "ins200" && rows(7L) === "old7")
    // pre-merge version intact
    assert(ScaleOps.readSnapshot(spark, root("t6"), Some(2L))
      .filter(col("s") === "old5").count() === 1L)
    // a general shape (WHEN MATCHED THEN DELETE) routes to the
    // general executor and deletes exactly the matched keys
    spark.sql("""MERGE INTO gcat.t6 AS t USING t6_updates AS u
                |ON t.id = u.id
                |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gcat.t6").as[Long].head() === 98L)
    assert(spark.sql("SELECT count(*) FROM gcat.t6 WHERE id IN (5, 42, 200)")
      .as[Long].head() === 0L)
    // the mirror-sync shape: rows absent from the source are deleted
    spark.sql("""MERGE INTO gcat.t6 AS t USING t6_updates AS u
                |ON t.id = u.id
                |WHEN NOT MATCHED THEN INSERT *
                |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT * FROM gcat.t6").as[(Long, String)]
      .collect().sorted.toSeq ===
      Seq((5L, "new5"), (42L, "new42"), (200L, "ins200")))
  }

  test("SQL UPDATE routes to the zone-map-planned copy-on-write rewrite") {
    fs.delete(new Path(root("t8")), true)
    spark.sql("CREATE TABLE gcat.t8 (id BIGINT, s STRING, q BIGINT) " +
      "TBLPROPERTIES ('statscol' = 'id')")
    (0L until 400L).map(i => (i, s"r$i", i % 10)).toDF("id", "s", "q")
      .repartitionByRange(4, col("id"))
      .writeTo("gcat.t8").append()
    spark.sql("UPDATE gcat.t8 SET q = q + 100, s = 'touched' " +
      "WHERE id BETWEEN 100 AND 150 AND q >= 5")
    assert(ScaleOps.snapshotVersions(spark, root("t8")) === Seq(1L, 2L, 3L))
    // exact row-level semantics: only matching rows changed
    val rows = spark.sql("SELECT id, s, q FROM gcat.t8")
      .as[(Long, String, Long)].collect()
    assert(rows.length === 400)
    rows.foreach { case (id, s, q) =>
      if (id >= 100 && id <= 150 && id % 10 >= 5) {
        assert(s === "touched" && q === id % 10 + 100, s"row $id wrong")
      } else assert(s === s"r$id" && q === id % 10, s"row $id disturbed")
    }
    // copy-on-write: files the id-range proves clean carry forward
    val v2Files = ScaleOps.manifestFiles(spark, root("t8"), 2L).toSet
    val v3Files = ScaleOps.manifestFiles(spark, root("t8"), 3L).toSet
    assert(v2Files.intersect(v3Files).size >= 2,
      "UPDATE rewrote provably-untouched files")
    // the change feed carries before/after images of exactly the hits
    val feed = ScaleOps.readSnapshotChangeFeed(spark, root("t8"), 2L, 3L)
    val nHit = (100L to 150L).count(_ % 10 >= 5)
    assert(feed.filter(col("_change_type") === "delete").count() === nHit)
    assert(feed.filter(col("_change_type") === "insert" &&
      col("s") === "touched").count() === nHit)
    // a no-match UPDATE commits nothing
    spark.sql("UPDATE gcat.t8 SET q = 0 WHERE id > 5000")
    assert(ScaleOps.snapshotVersions(spark, root("t8")) === Seq(1L, 2L, 3L))
    // pre-update version intact (snapshot isolation)
    assert(ScaleOps.readSnapshot(spark, root("t8"), Some(2L))
      .filter(col("s") === "touched").count() === 0L)
  }

  test("SQL time travel: VERSION AS OF (number and ref) and TIMESTAMP AS OF") {
    fs.delete(new Path(root("t9")), true)
    spark.sql("CREATE TABLE gcat.t9 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gcat.t9 VALUES (1, 'a')")
    val tsBetween = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql("INSERT INTO gcat.t9 VALUES (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM gcat.t9").as[Long].head() === 2L)
    assert(spark.sql("SELECT count(*) FROM gcat.t9 VERSION AS OF 2")
      .as[Long].head() === 1L)
    // a named ref resolves through VERSION AS OF too
    ScaleOps.setRef(spark, root("t9"), "prod", 2L)
    assert(spark.sql("SELECT count(*) FROM gcat.t9 VERSION AS OF 'prod'")
      .as[Long].head() === 1L)
    // TIMESTAMP AS OF picks the newest version committed before it
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    assert(spark.sql("SELECT count(*) FROM gcat.t9 TIMESTAMP AS OF " +
      s"'${fmt.format(new java.util.Date(tsBetween))}'")
      .as[Long].head() === 1L)
    // an uncommitted pin is loud
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.t9 VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("not committed"))
  }

  test("ALTER TABLE ADD COLUMN commits a schema-only version; reads null-fill") {
    fs.delete(new Path(root("t7")), true)
    spark.sql("CREATE TABLE gcat.t7 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gcat.t7 VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gcat.t7 ADD COLUMN q BIGINT")
    // one committed version per step: create, insert, alter
    assert(ScaleOps.snapshotVersions(spark, root("t7")) === Seq(1L, 2L, 3L))
    // old rows read null-filled through the widened schema
    assert(spark.sql("SELECT id, q FROM gcat.t7 WHERE q IS NULL").count() === 2L)
    // and the column is writable immediately
    spark.sql("INSERT INTO gcat.t7 VALUES (3, 'c', 30)")
    assert(spark.sql("SELECT sum(q) FROM gcat.t7").as[Long].collect()(0) === 30L)
    // non-add alterations are refused, history never mutated in place
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.t7 DROP COLUMN s")
    }
    assert(e.getMessage.contains("ADD COLUMN"))
    // pre-alter version still reads with its own narrower schema
    assert(ScaleOps.readSnapshot(spark, root("t7"), Some(2L))
      .columns.toSeq === Seq("id", "s"))
  }

  test("catalog hygiene: exists/list/drop; duplicate create and partitioning are loud") {
    fs.delete(new Path(root("t4")), true)
    spark.sql("CREATE TABLE gcat.t4 (id BIGINT)")
    assert(spark.catalog.tableExists("gcat.t4"))
    assert(spark.sql("SHOW TABLES IN gcat").collect()
      .map(_.getString(1)).contains("t4"))
    val dup = intercept[Exception] { spark.sql("CREATE TABLE gcat.t4 (id BIGINT)") }
    assert(dup.getMessage.toLowerCase.contains("already exists"))
    val part = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.t4p (id BIGINT) PARTITIONED BY (id)")
    }
    assert(part.getMessage.contains("unpartitioned"))
    spark.sql("DROP TABLE gcat.t4")
    assert(!spark.catalog.tableExists("gcat.t4"))
  }
}
