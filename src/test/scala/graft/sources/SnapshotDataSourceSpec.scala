package graft.sources

import graft.SparkSpec
import graft.operators.ScaleOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum}

/** The snapshot store as a DataSource V2 table: format("graft-
  * snapshot") reads resolve versions/refs, Catalyst filters prune
  * files through the manifest's zone maps and Bloom fields (pinned
  * via inputFiles), answers equal the bespoke readers', and the
  * pruning composes with joins and SQL text. */
class SnapshotDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_dsv2_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rangedDf(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))

  /** Files the executed plan's parquet scan actually lists —
    * Dataset.inputFiles only supports FileTable-backed V2 relations,
    * so the pruning pin reads the scan's own file index. */
  private def scannedFiles(df: DataFrame): Seq[String] = {
    df.collect() // force planning with pushdown complete
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case g: SnapshotScan => g.plannedFiles
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.toSeq
          case _ => Seq.empty
        }
    }.flatten
  }

  private def readStore(root: String, extra: (String, String)*): DataFrame =
    extra.foldLeft(
      spark.read.format("graft-snapshot").option("statsCol", "id"))(
      (r, kv) => r.option(kv._1, kv._2)).load(root)

  test("latest/versioned/ref reads return exactly the version's content") {
    val root = freshRoot("basic")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 100),
      statsCol = Some("id"))
    ScaleOps.appendSnapshot(spark, root, rangedDf(100 until 200),
      statsCol = Some("id"))
    ScaleOps.setRef(spark, root, "prod", 1L)
    assert(readStore(root).count() === 200L)
    assert(readStore(root, "version" -> "1").count() === 100L)
    assert(readStore(root, "ref" -> "prod").count() === 100L)
    assert(readStore(root).select(sum(col("id"))).as[Long].head() ===
      (0L until 200L).sum)
  }

  test("a range predicate prunes files through the zone maps, answer unchanged") {
    val root = freshRoot("zm")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 400),
      statsCol = Some("id"))
    val all = scannedFiles(readStore(root))
    val pruned = readStore(root).filter(col("id") >= 10L && col("id") <= 60L)
    assert(all.length === 4)
    assert(scannedFiles(pruned).length < all.length,
      s"no pruning: ${scannedFiles(pruned).length} of ${all.length}")
    assert(pruned.as[(Long, String)].collect().sorted.toSeq ===
      (10L to 60L).map(i => (i, s"row$i")).toSeq)
    // equality predicates prune too
    val point = readStore(root).filter(col("id") === 42L)
    assert(scannedFiles(point).length === 1)
    assert(point.as[(Long, String)].collect().toSeq === Seq((42L, "row42")))
  }

  test("Bloom fields prune point lookups even when zone maps are useless") {
    val root = freshRoot("bloom")
    fs(root).delete(new Path(root), true)
    // interleaved ids: every file's [min,max] spans the whole space,
    // so only the Bloom fields can skip
    val df = (0 until 400).map(i => (i.toLong, s"row$i"))
      .toDF("id", "s").repartition(4, col("s"))
    ScaleOps.publishSnapshot(spark, root, df,
      statsCol = Some("id"), statsBloom = true)
    val all = scannedFiles(readStore(root))
    val point = readStore(root).filter(col("id") === 123L)
    assert(scannedFiles(point).length < all.length,
      s"bloom did not prune: ${scannedFiles(point).length} of ${all.length}")
    assert(point.as[(Long, String)].collect().toSeq === Seq((123L, "row123")))
    // IN-lists prune to the union of the members' files
    val inl = readStore(root).filter(col("id").isin(5L, 123L))
    assert(scannedFiles(inl).length < all.length)
    assert(inl.as[(Long, String)].collect().sorted.toSeq ===
      Seq((5L, "row5"), (123L, "row123")))
  }

  test("the pruning composes with SQL text and joins over the table") {
    val root = freshRoot("sql")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 400),
      statsCol = Some("id"))
    readStore(root).createOrReplaceTempView("snap_t")
    val viaSql = spark.sql(
      "SELECT count(*) AS n, CAST(sum(id) AS BIGINT) AS s " +
        "FROM snap_t WHERE id BETWEEN 20 AND 30")
    assert(viaSql.as[(Long, Long)].head() === ((11L, (20L to 30L).sum)))
    // the filter reaches the scan: fewer files than the full read
    val prunedPlan = spark.sql("SELECT * FROM snap_t WHERE id BETWEEN 20 AND 30")
    assert(scannedFiles(prunedPlan).length <
      scannedFiles(readStore(root)).length)
    // join with a small frame; answers equal the raw join
    val dims = Seq((25L, "dim25"), (350L, "dim350")).toDF("id", "d")
    val joined = readStore(root).join(dims, Seq("id"))
      .select("id", "s", "d").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(joined === Seq((25L, "row25", "dim25"), (350L, "row350", "dim350")))
  }

  test("runtime filtering: broadcast-join keys prune files at execution time") {
    // the dynamic-file-pruning shape: the store is the BIG side of a
    // join on its stats column with no literal predicate of its own —
    // only the build side's runtime key set can skip files, through
    // SnapshotScan's SupportsRuntimeFiltering face
    val root = freshRoot("dpp")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 400),
      statsCol = Some("id"), statsBloom = true)
    // the dim must be a REAL source (a literal Seq constant-folds to
    // a LocalRelation, erasing the selective predicate DPP requires)
    val dimPath = freshRoot("dpp_dim")
    Seq((25L, "keep"), (26L, "keep"), (31L, "drop"))
      .toDF("id", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = readStore(root)
      .join(org.apache.spark.sql.functions.broadcast(
        dim.filter(col("tag") === "keep")), Seq("id"))
    // execute THIS dataset — the runtime-filtered scan instance lives
    // in its own QueryExecution, not in a derived projection's
    val rows = joined.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("s"))).sorted.toSeq
    assert(rows === Seq((25L, "row25"), (26L, "row26")))
    // the executed scan planned fewer files than the store holds —
    // the join keys arrived as a runtime In-filter and the zone
    // maps/Blooms skipped the rest
    // the join plan is adaptive: recurse through AQE wrappers and
    // query stages to reach the BatchScanExec leaf
    def planned(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          planned(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          planned(q.plan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case g: SnapshotScan => g.plannedFiles.length
            case _ => 0
          }
      }.sum
    val plannedN = planned(joined.queryExecution.executedPlan)
    assert(plannedN > 0, "no SnapshotScan in the executed join plan")
    assert(plannedN < 4,
      s"runtime join keys did not prune: planned $plannedN/4 files")
  }

  test("runtime filtering: a NON-broadcast (shuffle) join still prunes files via DPP subqueries") {
    // when the build side is too big to broadcast, Spark can still
    // deliver the join keys to SupportsRuntimeFiltering as a
    // DPP-style In-subquery — at the cost of re-executing the build
    // side's distinct keys — when reuseBroadcastOnly is off. This is
    // the shuffle-join file-skipping shape for the 100 TB fact⋈fact
    // case; the conf trade (duplicate build-side subquery vs skipped
    // probe-side terabytes) is documented in the README.
    val root = freshRoot("dpps")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 400),
      statsCol = Some("id"), statsBloom = true)
    val dimPath = freshRoot("dpps_dim")
    (0L until 200L).map(i => (i, if (i == 25L || i == 26L) "keep" else "drop"))
      .toDF("id", "tag").write.mode("overwrite").parquet(dimPath)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevReuse = spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "false")
    try {
      val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
      val joined = readStore(root).join(dim, Seq("id"))
      val rows = joined.collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("s"))).sorted.toSeq
      assert(rows === Seq((25L, "row25"), (26L, "row26")))
      // no broadcast join in the executed plan (the shape under test)
      def hasBhj(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            hasBhj(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            hasBhj(q.plan)
          case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
            true
        }.exists(identity)
      def planned(p: org.apache.spark.sql.execution.SparkPlan): Int =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            planned(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            planned(q.plan)
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan match {
              case g: SnapshotScan => g.plannedFiles.length
              case _ => 0
            }
        }.sum
      val exec = joined.queryExecution.executedPlan
      assert(!hasBhj(exec), "expected a shuffle join under the test confs")
      val plannedN = planned(exec)
      assert(plannedN > 0, "no SnapshotScan in the executed join plan")
      assert(plannedN < 4,
        s"shuffle-join runtime keys did not prune: planned $plannedN/4 files")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        prevReuse)
    }
  }

  test("timestampAsOf resolves the newest version committed at or before the instant") {
    val root = freshRoot("ts")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 10),
      statsCol = Some("id"))
    Thread.sleep(1100) // mtime granularity on local fs
    val between = System.currentTimeMillis()
    Thread.sleep(1100)
    ScaleOps.appendSnapshot(spark, root, rangedDf(10 until 20),
      statsCol = Some("id"))
    assert(ScaleOps.resolveAsOfTimestamp(spark, root, between) === 1L)
    assert(ScaleOps.resolveAsOfTimestamp(spark, root,
      System.currentTimeMillis()) === 2L)
    // through the table, both millis and ISO forms
    assert(readStore(root, "timestampAsOf" -> between.toString).count() === 10L)
    assert(readStore(root, "timestampAsOf" ->
      java.time.Instant.ofEpochMilli(between).toString).count() === 10L)
    // before the store existed: loud, not v1
    val e = intercept[IllegalArgumentException] {
      ScaleOps.resolveAsOfTimestamp(spark, root, 1000L)
    }
    assert(e.getMessage.contains("no snapshot"))
    // pins are mutually exclusive
    val e2 = intercept[IllegalArgumentException] {
      readStore(root, "version" -> "1",
        "timestampAsOf" -> between.toString).count()
    }
    assert(e2.getMessage.contains("at most one"))
  }

  test("planning is metadata-only: version + schema resolve with zero parquet footer reads") {
    val root = freshRoot("hdr")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 100),
      statsCol = Some("id"))
    ScaleOps.appendSnapshot(spark, root, rangedDf(100 until 200),
      statsCol = Some("id"))
    // hide EVERY data file; resolution must not miss them — the
    // strongest possible zero-footer proof on a real filesystem
    val f = fs(root)
    val stash = new Path(root, ".stash")
    f.mkdirs(stash)
    val hidden = f.listStatus(new Path(root)).map(_.getPath)
      .filter(_.getName.startsWith("data-v")).toSeq
    hidden.foreach(p => assert(f.rename(p, new Path(stash, p.getName))))
    try {
      val sweepsBefore = SnapshotDataSource.footerSweeps.get()
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", root))
      val (_, v, schema, _) = SnapshotDataSource.resolve(opts)
      assert(v === 2L)
      assert(schema.fieldNames.toSeq === Seq("id", "s"))
      assert(SnapshotDataSource.footerSweeps.get() === sweepsBefore,
        "header-carrying store fell back to a footer sweep")
    } finally hidden.foreach(p =>
      assert(f.rename(new Path(stash, p.getName), p)))
    // with the data back, the planned read answers normally
    assert(readStore(root).count() === 200L)
  }

  test("one load resolves version+schema ONCE; inferSchema and getTable share the pin") {
    val root = freshRoot("pin")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 50),
      statsCol = Some("id"))
    val before = SnapshotDataSource.resolves.get()
    assert(readStore(root).count() === 50L)
    assert(SnapshotDataSource.resolves.get() === before + 1,
      "inferSchema and getTable resolved independently")
  }

  test("timestampAsOf resolves from the #ts: commit stamp, not filesystem mtimes") {
    val root = freshRoot("tshdr")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 10),
      statsCol = Some("id"))
    val between = System.currentTimeMillis() + 50
    Thread.sleep(120)
    ScaleOps.appendSnapshot(spark, root, rangedDf(10 until 20),
      statsCol = Some("id"))
    // scramble mtimes the way a backup/restore would: v1 "newer" than v2
    val f = fs(root)
    val now = System.currentTimeMillis()
    f.setTimes(new Path(root, "_manifests/v1.manifest"), now + 60000, -1)
    f.setTimes(new Path(root, "_manifests/v2.manifest"), now - 60000, -1)
    assert(ScaleOps.resolveAsOfTimestamp(spark, root, between) === 1L)
    assert(readStore(root, "timestampAsOf" -> between.toString).count() === 10L)
  }

  test("a fractional-typed stats column never range-prunes (rows would vanish)") {
    val root = freshRoot("frac")
    fs(root).delete(new Path(root), true)
    // scores land in files whose [min,max] TRUNCATE to longs: a
    // GreaterThan(score, 2.2) naively tightened to lo=3 would prune
    // the file holding 2.3 — the connector must not range-prune here
    val df = Seq((1L, 2.3), (2L, 2.7), (3L, 7.5))
      .toDF("id", "score").coalesce(1)
    ScaleOps.publishSnapshot(spark, root, df, statsCol = Some("score"))
    val got = spark.read.format("graft-snapshot")
      .option("statsCol", "score").load(root)
      .filter(col("score") > 2.2)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 2.3), (2L, 2.7), (3L, 7.5)))
  }

  test("a non-Long stats column never Bloom-prunes (hash types differ publish vs probe)") {
    val root = freshRoot("ibloom")
    fs(root).delete(new Path(root), true)
    // IntegerType keys: the published bits hash ints, a probe would
    // hash longs — xxhash64 disagrees, so every lookup would be a
    // false negative. The connector must fall back to zone maps only.
    val df = (0 until 100).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(2, col("s"))
    ScaleOps.publishSnapshot(spark, root, df,
      statsCol = Some("id"), statsBloom = true)
    val got = spark.read.format("graft-snapshot")
      .option("statsCol", "id").load(root)
      .filter(col("id") === 42)
      .as[(Int, String)].collect().toSeq
    assert(got === Seq((42, "row42")))
  }

  /** A 2×2 grid layout: four files, each holding one (id-half,
    * q-half) cell, so BOTH columns' zone maps are selective. */
  private def gridStore(root: String, bloom: Boolean = false): Unit = {
    fs(root).delete(new Path(root), true)
    val df = (0 until 400).map(i => (i.toLong, (i * 7 % 100).toLong, s"row$i"))
      .toDF("id", "q", "s")
      .withColumn("g",
        (col("id") / 200).cast("int") * 2 + (col("q") / 50).cast("int"))
      .repartitionByRange(4, col("g")).drop("g")
    ScaleOps.publishSnapshot(spark, root, df,
      statsCol = Some("id,q"), statsBloom = bloom)
  }

  test("multi-column stats prune conjunctively: each column skips, together they skip harder") {
    val root = freshRoot("mc")
    gridStore(root)
    def read() = spark.read.format("graft-snapshot")
      .option("statsCol", "id,q").load(root)
    val all = scannedFiles(read())
    assert(all.length === 4)
    val idOnly = read().filter(col("id") < 200L)
    val qOnly = read().filter(col("q") < 50L)
    val both = read().filter(col("id") < 200L && col("q") < 50L)
    assert(scannedFiles(idOnly).length === 2, "id zone maps did not prune")
    assert(scannedFiles(qOnly).length === 2, "q zone maps did not prune")
    assert(scannedFiles(both).length === 1,
      "conjunctive two-column pruning did not compose")
    // and the answers are exactly the predicate's rows
    assert(both.count() ===
      (0 until 400).count(i => i < 200 && (i * 7 % 100) < 50).toLong)
    assert(idOnly.count() === 200L)
    // declaring only ONE of the columns still prunes on that one
    val oneDecl = spark.read.format("graft-snapshot")
      .option("statsCol", "q").load(root).filter(col("q") >= 50L)
    assert(scannedFiles(oneDecl).length === 2)
    assert(oneDecl.count() ===
      (0 until 400).count(i => (i * 7 % 100) >= 50).toLong)
  }

  test("multi-column Blooms: each named column key-prunes independently") {
    val root = freshRoot("mcbloom")
    gridStore(root, bloom = true)
    def read(cols: String) = spark.read.format("graft-snapshot")
      .option("statsCol", cols).load(root)
    val all = scannedFiles(read("id,q"))
    // a point lookup on id prunes to the single grid cell... and a
    // q-key probe composes zone map + Bloom on q alone
    val point = read("id,q").filter(col("id") === 123L)
    assert(scannedFiles(point).length < all.length)
    assert(point.select("s").as[String].collect().toSeq === Seq("row123"))
    val qpoint = read("q").filter(col("q") === 61L)
    assert(scannedFiles(qpoint).length < all.length)
    assert(qpoint.count() === (0 until 400).count(i => i * 7 % 100 == 61).toLong)
  }

  test("a rewrite keeps indexing every named stats column (delete, then q still prunes)") {
    val root = freshRoot("mckeep")
    gridStore(root)
    // COW delete on id rewrites the two id<200 files; the rewritten
    // files must still carry q stats or the store silently loses its
    // second zone map
    ScaleOps.deleteFromSnapshot(spark, root, "id", 0L, 9L)
    def read() = spark.read.format("graft-snapshot")
      .option("statsCol", "id,q").load(root)
    val all = scannedFiles(read())
    val qOnly = read().filter(col("q") >= 50L)
    assert(scannedFiles(qOnly).length < all.length,
      "rewritten files lost the second column's stats")
    assert(read().count() === 390L)
    assert(qOnly.count() ===
      (10 until 400).count(i => (i * 7 % 100) >= 50).toLong)
    // the DIRECT pin: every rewritten (data-v2) manifest line still
    // carries BOTH named stats fields
    val man = fs(root).open(new Path(root, "_manifests/v2.manifest"))
    val lines = try scala.io.Source.fromInputStream(man, "UTF-8")
      .getLines().toList finally man.close()
    val rewritten = lines.filterNot(_.startsWith("#"))
      .filter(_.split('\t')(0).contains("data-v2"))
    assert(rewritten.nonEmpty)
    rewritten.foreach { l =>
      assert(l.contains("\tid=") && l.contains("\tq="),
        s"rewritten line lost a named stats column: $l")
    }
  }

  test("compaction keeps every named stats column too (statsCol=None on a multi-col store)") {
    val root = freshRoot("mccompact")
    gridStore(root)
    // tiny files: everything is undersized, so compact rewrites all
    val v2 = ScaleOps.compactSnapshot(spark, root, targetBytes = 1L << 30)
    assert(v2 === 2L)
    val man = fs(root).open(new Path(root, "_manifests/v2.manifest"))
    val lines = try scala.io.Source.fromInputStream(man, "UTF-8")
      .getLines().toList finally man.close()
    val rewritten = lines.filterNot(_.startsWith("#"))
      .filter(_.split('\t')(0).contains("data-v2"))
    assert(rewritten.nonEmpty)
    rewritten.foreach(l => assert(l.contains("\tid=") && l.contains("\tq="),
      s"compaction dropped a named stats column: $l"))
    assert(spark.read.format("graft-snapshot").load(root).count() === 400L)
  }

  test("OPTIMIZE ZORDER: one rewrite makes BOTH read keys selective; content unchanged; feed empty") {
    val root = freshRoot("zorder")
    fs(root).delete(new Path(root), true)
    // ingest-ordered by a THIRD key: both read keys' intervals span
    // everything, so no predicate can prune v1
    val df = (0 until 400).map(i => (i.toLong, (i * 7 % 100).toLong, s"row$i"))
      .toDF("id", "q", "s").repartition(4, col("s"))
    ScaleOps.publishSnapshot(spark, root, df)
    val v2 = ScaleOps.zorderSnapshot(spark, root, "id", "q", 4)
    assert(v2 === 2L)
    def read(v: Long) = spark.read.format("graft-snapshot")
      .option("version", v.toString).load(root) // statsCols via header
    // v1: nothing prunes (no stats were even declared)
    val pred = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(col("id") < 200L && col("q") < 50L)
    assert(scannedFiles(pred(read(1L))).length === 4)
    // v2: the z-layout + header-declared stats prune the conjunction
    // below either single column's survivor count
    val both = scannedFiles(pred(read(2L))).length
    val idOnly = scannedFiles(read(2L).filter(col("id") < 200L)).length
    assert(both < 4, "recluster did not make the 2-D predicate prune")
    assert(both <= idOnly)
    // content unchanged, answers identical across layouts
    assert(pred(read(2L)).count() === pred(read(1L)).count())
    assert(read(2L).count() === 400L)
    // the recluster committed an EMPTY change feed: downstream syncs
    // see "no logical changes", not a phantom full-corpus diff
    val feed = ScaleOps.readSnapshotChangeFeed(spark, root, 1L, 2L)
    assert(feed.count() === 0L)
  }

  test("schema-evolved stores read with null-fill through the table") {
    val root = freshRoot("evo")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, rangedDf(0 until 40),
      statsCol = Some("id"))
    ScaleOps.mergeIntoSnapshot(spark, root, "id",
      Seq((3L, "U3", 30L), (99L, "I99", 990L)).toDF("id", "s", "q"),
      evolveSchema = true)
    val got = readStore(root).select("id", "q")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(3L) === Some(30L))
    assert(got(99L) === Some(990L))
    assert(got(7L) === None)
    assert(got.size === 41)
  }
}
