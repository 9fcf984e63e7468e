package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.operators.ScaleOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft-snapshot")` — the versioned snapshot
  * store as a DataSource V2 TABLE, so its manifest-level pruning
  * (zone maps + per-file Bloom fields) composes with ARBITRARY
  * Catalyst queries instead of living behind bespoke read functions
  * (`s06PrunedRead`, `s13BloomLookup`). A filtered join or SQL text
  * over the store now plans only the files the manifest can't prove
  * irrelevant — the real 100× read path.
  *
  * Options:
  *  - `path`    (required) store root
  *  - `version` (optional) pin a committed version; default latest
  *  - `ref`     (optional) resolve a named ref instead (s12's refs)
  *  - `timestampAsOf` (optional) resolve the newest version
  *    committed at or before this instant (epoch millis or ISO-8601)
  *    — Delta's TIMESTAMP AS OF; at most one of version/ref/
  *    timestampAsOf
  *  - `statsCol` (optional) the column the manifest's zone-map/Bloom
  *    fields index (the store does not record it; the caller
  *    declares it exactly as the bespoke readers did). Without it
  *    every file is read — correct, just unpruned.
  *
  * Execution delegates to Spark's OWN parquet scan (vectorized
  * reader, row-group skipping, whole-stage codegen) over the pruned
  * file list via a ParquetScanBuilder — this connector adds manifest
  * pruning, not a bespoke reader. Filters are handed back to Spark
  * for re-evaluation (file-grain pruning is a superset guarantee,
  * like partition pruning), so answers never depend on the sidecar
  * fields. Schema is the version's merged-parquet schema, so
  * evolved stores (s11/s16) null-fill old files. */
class SnapshotDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotDataSource.resolve(options)._3

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (root, v, _) = SnapshotDataSource.resolve(opts)
    new SnapshotTable(root, v, schema,
      Option(opts.get("statscol")))
  }
}

object SnapshotDataSource {

  /** (root, resolved version, merged schema) for the options. */
  private[sources] def resolve(
      options: CaseInsensitiveStringMap): (String, Long, StructType) = {
    val s = SparkSession.active
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot requires a path option (the store root)"))
    val pins = Seq("version", "ref", "timestampasof")
      .flatMap(k => Option(options.get(k)).map(k -> _))
    require(pins.size <= 1, "graft-snapshot takes at most one of " +
      s"version/ref/timestampAsOf, got ${pins.map(_._1).mkString(", ")}")
    val v = pins.headOption match {
      case Some(("version", ver)) => ver.toLong
      case Some(("ref", ref)) => ScaleOps.resolveRef(s, root, ref)
      case Some((_, ts)) =>
        val millis = scala.util.Try(ts.toLong).getOrElse(
          java.time.Instant.parse(ts).toEpochMilli)
        ScaleOps.resolveAsOfTimestamp(s, root, millis)
      case None =>
        val vs = ScaleOps.snapshotVersions(s, root)
        require(vs.nonEmpty, s"no committed snapshots under $root")
        vs.last
    }
    val (_, files) = ScaleOps.planSnapshotFiles(s, root, Some(v),
      None, None, None)
    require(files.nonEmpty,
      s"snapshot v$v of $root lists no data files; no schema source")
    val schema = s.read.option("mergeSchema", "true").parquet(files: _*).schema
    (root, v, schema)
  }
}

/** One committed snapshot version as a read-only DSv2 table. */
class SnapshotTable(root: String, version: Long, tableSchema: StructType,
    statsCol: Option[String]) extends Table with SupportsRead {

  override def name(): String = s"graft-snapshot `$root` v$version"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(root, version, tableSchema, statsCol)
}

/** Collects pushed filters + required columns, then builds the
  * delegated parquet scan over the manifest-pruned file list. */
class SnapshotScanBuilder(root: String, version: Long,
    tableSchema: StructType, statsCol: Option[String])
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    // file-grain pruning proves a SUPERSET, like partition pruning:
    // every filter is returned for Spark to re-evaluate on rows
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** (lo, hi, keys) constraints the pushed filters put on the stats
    * column — conjunctive top level, Long-valued comparisons only
    * (anything else simply doesn't prune). */
  private def statsConstraints(
      c: String): (Option[Long], Option[Long], Option[Seq[Long]]) = {
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue())
      case _ => None
    }
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    var keys = Option.empty[Seq[Long]]
    def tightenLo(v: Long): Unit = if (lo.forall(_ < v)) lo = Some(v)
    def tightenHi(v: Long): Unit = if (hi.forall(_ > v)) hi = Some(v)
    def addKeys(ks: Seq[Long]): Unit =
      keys = Some(keys.fold(ks)(_.intersect(ks)))
    def walk(f: Filter): Unit = f match {
      case EqualTo(`c`, v) => num(v).foreach { k =>
        tightenLo(k); tightenHi(k); addKeys(Seq(k))
      }
      case In(`c`, vs) =>
        val ks = vs.toSeq.flatMap(num)
        if (ks.length == vs.length) addKeys(ks)
      case GreaterThan(`c`, v) => num(v).foreach(k => tightenLo(k + 1))
      case GreaterThanOrEqual(`c`, v) => num(v).foreach(tightenLo)
      case LessThan(`c`, v) => num(v).foreach(k => tightenHi(k - 1))
      case LessThanOrEqual(`c`, v) => num(v).foreach(tightenHi)
      case And(l, r) => walk(l); walk(r)
      case _ => // non-prunable shape: contributes no constraint
    }
    pushed.foreach(walk)
    (lo, hi, keys)
  }

  override def build(): Scan = {
    val s = SparkSession.active
    val (lo, hi, keys) = statsCol match {
      case Some(c) => statsConstraints(c)
      case None => (None, None, None)
    }
    val (_, files) = ScaleOps.planSnapshotFiles(s, root, Some(version),
      lo, hi, keys)
    val index = new InMemoryFileIndex(s, files.map(new Path(_)),
      Map.empty, Some(tableSchema))
    val opts = new CaseInsensitiveStringMap(
      Map("mergeSchema" -> "true").asJava)
    val pb = ParquetScanBuilder(s, index, tableSchema, tableSchema, opts)
    pb.pruneColumns(required)
    pb.pushDataFilters(pushed) // parquet-level row-group skipping
    pb.build()
  }
}
