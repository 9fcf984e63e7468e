package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ScaleOps.writePartitioned + ScaleOps.compact — the storage-layout
  * half of the 100 TB story: partition pruning limits a filtered scan
  * to matching directories, and compaction bounds the file count a
  * long-lived ingest accumulates.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout prunes non-matching partitions from the scan") {
    val d = "/root/testdata/sf0.001"
    val path = Files.createTempDirectory("part_docs").toString + "/docs"
    ScaleOps.writePartitioned(Tables.documents(spark, d), path, "lang")

    val q = spark.read.parquet(path).filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    // the lang predicate must be a partition filter (pruned at
    // planning), not a pushed data filter over all files
    assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*\\]".r
      .findFirstIn(scan).isDefined, scan)

    // value parity with the unpartitioned source
    val got = q.select($"doc_id").as[Long].collect().sorted.toSeq
    val want = Tables.documents(spark, d).filter($"lang" === "en")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got === want)
  }

  test("compact recurses into hive partitions, preserving the layout") {
    val d = "/root/testdata/sf0.001"
    val path = Files.createTempDirectory("compact_part").toString + "/docs"
    // fragment each partition
    Tables.documents(spark, d).repartition(10)
      .write.partitionBy("lang").parquet(path)
    val want = spark.read.parquet(path)
      .select($"doc_id", $"lang").as[(Long, String)].collect().sorted.toSeq
    ScaleOps.compact(spark, path, targetBytes = 512L * 1024)
    // layout survived: partition dirs still there, pruning still works
    val langDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
    langDirs.foreach { dir =>
      assert(dir.listFiles().count(_.getName.startsWith("part-")) < 10)
    }
    val got = spark.read.parquet(path)
      .select($"doc_id", $"lang").as[(Long, String)].collect().sorted.toSeq
    assert(got === want)
    val plan = spark.read.parquet(path).filter($"lang" === "en")
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*\\]".r.findFirstIn(plan).isDefined, plan)
  }

  test("compact rewrites a fragmented directory into few files, same data") {
    val d = "/root/testdata/sf0.001"
    val path = Files.createTempDirectory("compact_docs").toString + "/docs"
    Tables.documents(spark, d).repartition(50)
      .write.parquet(path)
    val before = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(before === 50)

    val want = spark.read.parquet(path).select($"doc_id").as[Long]
      .collect().sorted.toSeq
    val after = ScaleOps.compact(spark, path, targetBytes = 512L * 1024)
    assert(after < 10, s"expected few files after compaction, got $after")
    val got = spark.read.parquet(path).select($"doc_id").as[Long]
      .collect().sorted.toSeq
    assert(got === want)
  }
}
