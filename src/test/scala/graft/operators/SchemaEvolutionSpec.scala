package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** ADD COLUMN without rewrite: files published before a column
  * existed physically lack it, keep backing pinned readers
  * unchanged, and null-fill under the merged-schema read. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_evotest_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("old files physically lack the new column yet null-fill under the merged read") {
    val root = freshRoot("add")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    ScaleOps.appendSnapshot(spark, root,
      Seq((3L, "c", 7L), (4L, "d", 9L)).toDF("id", "s", "score"))
    // the v1 file on disk has exactly its published schema — ADD
    // COLUMN rewrote nothing
    val v1File = ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.head
    assert(spark.read.parquet(v1File).schema.fieldNames.toSeq === Seq("id", "s"))
    // the merged read reconciles: union schema, old rows null-filled
    val merged = ScaleOps.readSnapshotMerged(spark, root)
    assert(merged.schema.fieldNames.toSet === Set("id", "s", "score"))
    val rows = merged.select("id", "score")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, None), (2L, None), (3L, Some(7L)), (4L, Some(9L))))
    // a pinned pre-evolution reader still answers in the old schema
    assert(ScaleOps.readSnapshot(spark, root, Some(1L))
      .schema.fieldNames.toSeq === Seq("id", "s"))
  }

  test("nested struct columns evolve on nullability alone — header matches a footer sweep") {
    val root = freshRoot("nested")
    fs(root).delete(new Path(root), true)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // v1: struct column with a NON-nullable nested field (and a
    // non-nullable array element) — footer sweeps infer everything
    // nullable, so the header must store the recursive asNullable
    // form or the two resolutions diverge
    val strict = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("w", IntegerType, nullable = false),
        StructField("tags", ArrayType(StringType, containsNull = false),
          nullable = false))), nullable = false)))
    val rows1 = java.util.Arrays.asList(
      Row(1L, Row(10, Seq("a"))), Row(2L, Row(20, Seq("b", "c"))))
    ScaleOps.publishSnapshot(spark, root,
      spark.createDataFrame(rows1, strict))
    // v2: the SAME struct column, nested parts now nullable — must
    // append cleanly (not "incompatible schema evolution"), with a
    // new nested field added inside the struct (parquet mergeSchema
    // merges nested structs too)
    val loose = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("meta", StructType(Seq(
        StructField("w", IntegerType, nullable = true),
        StructField("tags", ArrayType(StringType, containsNull = true),
          nullable = true),
        StructField("lang", StringType, nullable = true))),
        nullable = true)))
    val rows2 = java.util.Arrays.asList(
      Row(3L, Row(30, Seq("d"), "en")))
    ScaleOps.appendSnapshot(spark, root,
      spark.createDataFrame(rows2, loose))
    // the header-resolved schema equals the mergeSchema footer sweep
    val files = ScaleOps.readSnapshot(spark, root, Some(2L)).inputFiles.toSeq
    val swept = spark.read.option("mergeSchema", "true")
      .parquet(files: _*).schema
    val header = ScaleOps.snapshotSchema(spark, root, 2L).get
    assert(header === swept)
    // and rows read whole: v1's structs null-fill the added nested field
    val got = spark.read.format("graft-snapshot").load(root)
      .selectExpr("id", "meta.w", "meta.lang")
      .as[(Long, Int, Option[String])].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 10, None), (2L, 20, None), (3L, 30, Some("en"))))
  }

  test("the fixture store evolves without rewriting v1's files") {
    val sf = "/root/testdata/sf0.001"
    val root = ScaleOps.ensureEvolutionStore(spark, sf)
    val v1Files = ScaleOps.readSnapshot(spark, root, Some(1L)).inputFiles.toSet
    val v2Files = ScaleOps.readSnapshotMerged(spark, root, Some(2L)).inputFiles.toSet
    assert(v1Files.subsetOf(v2Files)) // pure append: every v1 file reused
    v1Files.foreach(f =>
      assert(!spark.read.parquet(f).schema.fieldNames.contains("quality")))
    val out = ScaleOps.s11SchemaEvolution(spark, sf)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(out.nonEmpty)
    val total = out.map(_._2).sum
    val withQ = out.map(_._3).sum
    assert(total === graft.Tables.documents(spark, sf).count())
    assert(withQ > 0L && withQ < total) // a proper half carries quality
  }
}
