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
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.toSeq
          case _ => Seq.empty
        }
    }.flatten
    assert(scanned.length < 4,
      s"catalog read did not prune: ${scanned.length} files")
    assert(pruned.count() === 51L)
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
