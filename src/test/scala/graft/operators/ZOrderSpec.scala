package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** ScaleOps z-order layout: the Morton interleave arithmetic on hand
  * values, and the property the layout exists for — a box predicate
  * on the SECOND dimension skips most row groups under the z-curve
  * layout while a linear single-column sort layout reads everything.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("the interleave expression is the Morton code on hand values") {
    // x=5 (101b), y=3 (011b): bits x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0
    // → z = 1 + 2 + 8 + 16 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(expr(ScaleOps.zExprSql("x", "y", "div")).as("z"))
      .as[Long].head()
    assert(got === 27L)
    // axis-only values: y=0 keeps even bits, x=0 keeps odd bits
    val axes = Seq((7L, 0L), (0L, 7L)).toDF("x", "y")
      .select(expr(ScaleOps.zExprSql("x", "y", "div")).as("z"))
      .as[Long].collect().toSeq
    assert(axes === Seq(21L, 42L)) // 10101b and 101010b
  }

  /** Rows the parquet scan emits after row-group statistics pruning
    * (pushed filters drop whole row groups; the surviving rows are
    * what the scan outputs). AQE is disabled for the measurement so
    * the FileSourceScanExec node and its metrics are reachable. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }
      .sum
  }

  test("k-D interleave: 3-column Morton positions, and k=2 equals the 2-D form") {
    // k=3, bit i of dim d lands at 3i+d: x=1,y=1,z=1 → 1+2+4 = 7;
    // x=2 (bit1) → position 3·1+0 = 8
    val got = Seq((1L, 1L, 1L), (2L, 0L, 0L), (0L, 2L, 0L), (0L, 0L, 2L))
      .toDF("x", "y", "w")
      .select(expr(ScaleOps.zExprSqlK(Seq("x", "y", "w"), "div", 4)).as("z"))
      .as[Long].collect().toSeq
    assert(got === Seq(7L, 8L, 16L, 32L))
    // the 2-D generalization reproduces the s20 curve EXACTLY (the
    // DuckDB oracle replays this string — it must never drift)
    assert(ScaleOps.zExprSql("x", "y", "div") ===
      ScaleOps.zExprSqlK(Seq("x", "y"), "div", 16))
  }

  test("OPTIMIZE ZORDER over 3 columns: content unchanged, all three dimensions prune") {
    val root = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_zorder3").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    // three independent-ish dimensions, ingest-ordered by none of them
    val df = (0 until 4096).map { i =>
      val x = (i * 2654435761L) % 256
      val y = (i * 40503L) % 256
      val w = (i * 69621L) % 256
      (i.toLong, x, y, w)
    }.toDF("id", "x", "y", "w").repartitionByRange(8, col("id"))
    ScaleOps.publishSnapshot(spark, root, df, statsCol = Some("id"))
    val v2 = ScaleOps.zorderSnapshotK(spark, root, Seq("x", "y", "w"), 8)
    assert(v2 === 2L)
    // logical content unchanged by the recluster
    assert(ScaleOps.readSnapshot(spark, root, Some(2L))
      .agg(sum(col("id"))).as[Long].head() ===
      ScaleOps.readSnapshot(spark, root, Some(1L))
        .agg(sum(col("id"))).as[Long].head())
    // all three dimensions are declared stats columns of the commit
    assert(ScaleOps.snapshotStatsCols(spark, root, 2L)
      .exists(h => Seq("x", "y", "w").forall(h.split(',').contains)))
    // a thin box on EACH dimension individually prunes files
    def scanned(c: String): Int = {
      val pruned = spark.read.format("graft-snapshot").load(root)
        .filter(col(c) >= 10 && col(c) <= 20)
      pruned.collect()
      pruned.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case g: graft.sources.SnapshotScan => g.plannedFiles.length
            case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
              f.fileIndex.inputFiles.length
            case _ => 0
          }
      }.sum
    }
    for (c <- Seq("x", "y", "w"))
      assert(scanned(c) < 8, s"3-D curve left dimension '$c' unprunable")
  }

  test("stringPrefix64Col matches the JVM encoding on every byte-shape") {
    val samples = Seq("", "a", "ab", "abcdefgh", "abcdefghij", "src0",
      "src19", "corpus__part055", "éclair", "中文字符串超过八字节",
      "a\u0000b", "ÿÿÿÿÿÿÿÿÿ", "2024-01-05")
    val got = samples.toDF("s")
      .select(ScaleOps.stringPrefix64Col(col("s")).as("p"))
      .as[Long].collect().toSeq
    assert(got === samples.map(ScaleOps.stringPrefix64),
      "column encoding drifted from the manifest's JVM encoding")
  }

  test("typed z-order: (source STRING, day DATE) recluster prunes BOTH dimensions, content unchanged") {
    val root = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_zorder_typed").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    // ingest-ordered by NEITHER read key: id-clustered rows whose
    // (source, day) pairs interleave across the whole id range —
    // exactly the natural 100 TB key pair the round-12 curve NULLed
    // (string cast to Long = NULL, date cast = epoch days by luck)
    val df = (0 until 4000).map { i =>
      (i.toLong, s"src${(i * 2654435761L % 20).toInt}", (i * 40503) % 60)
    }.toDF("id", "source", "off")
      .withColumn("day", date_add(to_date(lit("2024-01-01")),
        col("off").cast("int")))
      .drop("off")
      .repartitionByRange(8, col("id"))
    ScaleOps.publishSnapshot(spark, root, df, statsCol = Some("id"))
    val v2 = ScaleOps.zorderSnapshotK(spark, root, Seq("source", "day"), 8)
    assert(v2 === 2L)
    // content bit-identical to the parent
    assert(ScaleOps.readSnapshot(spark, root, Some(2L))
      .agg(sum(col("id")), count(lit(1))).as[(Long, Long)].head() ===
      ScaleOps.readSnapshot(spark, root, Some(1L))
        .agg(sum(col("id")), count(lit(1))).as[(Long, Long)].head())
    // both dimensions are declared stats columns
    assert(ScaleOps.snapshotStatsCols(spark, root, 2L)
      .exists(h => Seq("source", "day").forall(h.split(',').contains)))
    def scanned(df2: DataFrame): Int = {
      df2.collect()
      df2.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case g: graft.sources.SnapshotScan => g.plannedFiles.length
            case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
              f.fileIndex.inputFiles.length
            case _ => 0
          }
      }.sum
    }
    def read() = spark.read.format("graft-snapshot").load(root)
    val bySrc = read().filter(col("source") === "src7")
    assert(scanned(bySrc) < 8, "string dimension did not prune")
    assert(bySrc.count() === df.filter(col("source") === "src7").count())
    val byDay = read().filter(col("day") >= to_date(lit("2024-01-10")) &&
      col("day") <= to_date(lit("2024-01-14")))
    assert(scanned(byDay) < 8, "date dimension did not prune")
    assert(byDay.count() ===
      df.filter(col("day") >= to_date(lit("2024-01-10")) &&
        col("day") <= to_date(lit("2024-01-14"))).count())
    // an unmappable dimension type refuses loudly
    val e = intercept[Exception] {
      ScaleOps.zorderSnapshotK(spark, root, Seq("source", "id2double"), 8)
    }
    assert(e.getMessage.contains("not in the store's schema") ||
      e.getMessage.contains("no"))
  }

  test("z-layout prunes a thin-y box query; a linear x-sort layout cannot") {
    val dir = Files.createTempDirectory("zorder").toString
    val grid = spark.range(0, 128L * 128L)
      .select((col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    ScaleOps.writeZOrdered(grid, s"$dir/z", "x", "y", files = 32)
    grid.repartitionByRange(32, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$dir/linear")

    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def box(path: String): DataFrame =
        spark.read.parquet(path).filter(col("y") >= 8 && col("y") <= 11)
      val zRows = scanRows(box(s"$dir/z"))
      val linRows = scanRows(box(s"$dir/linear"))
      // linear-by-x files each span ALL y: statistics prune nothing
      assert(linRows === 128L * 128L, s"linear layout read $linRows")
      // z files cover bounded (x, y) rectangles: most row groups skip
      assert(zRows <= linRows / 4, s"z layout read $zRows of $linRows")
      // and the layouts agree on the answer
      assert(box(s"$dir/z").count() === box(s"$dir/linear").count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
