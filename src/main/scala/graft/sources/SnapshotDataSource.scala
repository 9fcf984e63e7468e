package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.operators.ScaleOps
import graft.streaming.SnapshotStream
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
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
  * fields.
  *
  * PLANNING IS METADATA-ONLY: the schema comes from the manifest's
  * `#schema:` header (written at commit, evolving with the store —
  * the Delta/Iceberg schema-in-the-log shape), so resolving a table
  * opens O(1) manifest files and ZERO parquet footers. Pre-header
  * stores fall back to one mergeSchema footer sweep — counted in
  * [[SnapshotDataSource.footerSweeps]] so the spec can pin the zero.
  * Version + schema are resolved ONCE per load and pinned on the
  * provider instance (Spark instantiates a fresh provider per load):
  * a commit landing between `inferSchema` and `getTable` can no
  * longer bind the scan to a newer version than the schema, and the
  * resolution cost is paid once, not twice. */
class SnapshotDataSource extends TableProvider with DataSourceRegister
    with StreamSourceProvider {

  // ---- streaming face: readStream.format("graft-snapshot") ----
  // (the v1 Source contract — see graft.streaming.SnapshotStream;
  // SnapshotTable stays BATCH_READ, so DataStreamReader falls back
  // here for streams while batch reads keep the DSv2 pruning path)

  // stream resolution is pinned ONCE per load, exactly like the batch
  // path's resolveOnce: a schema-evolving commit landing between
  // sourceSchema and createSource can no longer pin the running
  // Source to a schema the streaming plan was not analyzed with
  private var streamPinned:
    Option[(Map[String, String], SnapshotStream.StreamConfig)] = None

  private def resolveStreamOnce(
      parameters: Map[String, String]): SnapshotStream.StreamConfig =
    synchronized {
      streamPinned match {
        case Some((p, cfg)) if p == parameters => cfg
        case _ =>
          val cfg = SnapshotStream.resolveStream(parameters)
          streamPinned = Some((parameters, cfg))
          cfg
      }
    }

  private def rejectUserSchema(schema: Option[StructType]): Unit =
    require(schema.isEmpty,
      "graft-snapshot streams resolve their schema from the store's " +
        "manifest header; a user-supplied readStream.schema(...) is " +
        "not honored — drop it")

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    rejectUserSchema(schema)
    val cfg = resolveStreamOnce(parameters)
    (shortName(), SnapshotStream.withMeta(cfg.dataSchema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    rejectUserSchema(schema)
    val cfg = resolveStreamOnce(parameters)
    new SnapshotStream(sqlContext.sparkSession, cfg.root,
      cfg.startingVersion, cfg.dataSchema, metadataPath,
      cfg.maxFilesPerTrigger, cfg.maxVersionsPerTrigger)
  }

  // per-load pinned resolution — inferSchema resolves, getTable reuses
  private var pinned:
    Option[(String, (String, Long, StructType, Option[String]))] = None

  private def resolveOnce(options: CaseInsensitiveStringMap)
      : (String, Long, StructType, Option[String]) =
    synchronized {
      val key = options.asCaseSensitiveMap().asScala.toSeq.sorted.toString
      pinned match {
        case Some((k, r)) if k == key => r
        case _ =>
          val r = SnapshotDataSource.resolve(options)
          pinned = Some((key, r))
          r
      }
    }

  override def shortName(): String = "graft-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolveOnce(options)._3

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (root, v, _, statsDefault) = resolveOnce(opts)
    // pruning columns: the explicit option wins; otherwise the
    // store's own #statscols: header (what its writers indexed)
    new SnapshotTable(root, v, schema,
      Option(opts.get("statscol")).orElse(statsDefault))
  }
}

object SnapshotDataSource {

  /** Count of mergeSchema footer sweeps taken because a manifest had
    * no `#schema:` header (pre-header stores only) — test
    * instrumentation pinning that planning against a header-carrying
    * store reads zero parquet footers. */
  private[graft] val footerSweeps = new java.util.concurrent.atomic.AtomicLong

  /** Count of full option resolutions — pins that one load resolves
    * once (inferSchema + getTable share the pinned result). */
  private[graft] val resolves = new java.util.concurrent.atomic.AtomicLong

  /** (root, resolved version, merged schema, header-declared stats
    * columns) for the options. */
  private[sources] def resolve(options: CaseInsensitiveStringMap)
      : (String, Long, StructType, Option[String]) = {
    resolves.incrementAndGet()
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
    // schema from the manifest header: one small read, zero footers.
    // Only a pre-header manifest pays the legacy mergeSchema sweep.
    val schema = ScaleOps.snapshotSchema(s, root, v).getOrElse {
      footerSweeps.incrementAndGet()
      val (_, files) = ScaleOps.planSnapshotFiles(s, root, Some(v),
        None, None, None)
      require(files.nonEmpty,
        s"snapshot v$v of $root lists no data files and carries no " +
          "#schema: header; no schema source")
      s.read.option("mergeSchema", "true").parquet(files: _*).schema
    }
    (root, v, schema, ScaleOps.snapshotStatsCols(s, root, v))
  }
}

/** One committed snapshot version as a DSv2 table: reads plan
  * through the manifest (pruned, metadata-only), writes route through
  * the SAME race-safe commit protocol as the API — an append is
  * [[ScaleOps.appendSnapshot]] (delta manifest, claim + rename +
  * conflict detection), an overwrite is [[ScaleOps.publishSnapshot]]
  * (a new full version; history stays time-travelable). The write
  * face is the standard V1Write bridge (DeltaLake's long-standing
  * connector shape): the engine hands the planned DataFrame to
  * `InsertableRelation.insert`, which is exactly the input the
  * commit protocol wants — no bespoke per-partition writer to keep
  * correct alongside it. */
class SnapshotTable(root: String, version: Long, tableSchema: StructType,
    statsCol: Option[String]) extends Table
    with SupportsRead with SupportsWrite {

  override def name(): String = s"graft-snapshot `$root` v$version"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(root, version, tableSchema, statsCol)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SnapshotWriteBuilder(root, statsCol)
}

/** Append / truncate-overwrite builder onto a store root. */
class SnapshotWriteBuilder(root: String, statsCol: Option[String])
    extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ignored: Boolean): Unit = {
          val s = data.sparkSession
          // keep indexing the store's declared stats columns, but
          // only those the batch actually carries (a projected-away
          // column can't be aggregated; its files just go unstatted)
          // resolution is case-insensitive, mirroring statsColsTyped —
          // a case-mismatched batch must still stat its files, not
          // silently degrade pruning
          val stats = statsCol
            .map(_.split(',').map(_.trim)
              .filter(c => data.columns.exists(_.equalsIgnoreCase(c)))
              .mkString(","))
            .filter(_.nonEmpty)
          if (overwrite) ScaleOps.publishSnapshot(s, root, data, stats)
          else ScaleOps.appendSnapshot(s, root, data, stats)
        }
      }
  }
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

  /** The declared stats columns (the option may name SEVERAL,
    * comma-separated — each indexed in the manifest's per-column
    * stats map) with their table-schema types — the gate for what may
    * prune. The manifest's zone maps hold a column's min/max CAST TO
    * LONG, so the ±1 integral arithmetic below is sound only for
    * integral columns: a fractional stats column (where
    * GreaterThan(c, 2.2) would need lo=2.3, not 3) simply doesn't
    * range-prune through this connector. The Bloom bits hash the
    * column IN ITS NATIVE TYPE at publish while lookup keys probe
    * as longs, and xxhash64 hashes Int and Long differently — so
    * key-based pruning is additionally gated on LongType, or files
    * holding the key would be falsely proven key-free. */
  private val statsColsTyped: Seq[(String, DataType)] =
    statsCol.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .flatMap(c => tableSchema.fields
        .find(_.name.equalsIgnoreCase(c)).map(f => f.name -> f.dataType))

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (lo, hi, keys) constraints the pushed filters put on the
    * INTEGRAL stats column — conjunctive top level. Fractional
    * comparison values over the integral column tighten via
    * floor/ceil (int > 2.2 ⇔ int ≥ 3); an equality against a
    * non-whole value can match nothing, so it prunes everything
    * (Spark still re-evaluates the filter on any rows read). Values
    * beyond ±2⁶² skip (Double→Long saturation would corrupt the ±1
    * arithmetic); anything non-numeric contributes no constraint. */
  private def statsConstraints(
      c: String): (Option[Long], Option[Long], Option[Seq[Long]]) = {
    val SAFE = 1L << 62
    // exact integral value, if the filter value is one
    def whole(v: Any): Option[Long] = v match {
      case b: java.lang.Byte => Some(b.longValue)
      case sh: java.lang.Short => Some(sh.longValue)
      case i: java.lang.Integer => Some(i.longValue)
      case l: java.lang.Long => Some(l)
      case d: java.lang.Double if d.doubleValue.isWhole &&
        math.abs(d.doubleValue) < SAFE.toDouble => Some(d.longValue)
      case f: java.lang.Float if f.floatValue.isWhole &&
        math.abs(f.floatValue) < SAFE.toFloat => Some(f.longValue)
      case bd: java.math.BigDecimal if bd.stripTrailingZeros.scale <= 0 &&
        bd.abs.compareTo(java.math.BigDecimal.valueOf(SAFE)) < 0 =>
        Some(bd.longValue)
      case bd: scala.math.BigDecimal => whole(bd.underlying)
      case _ => None
    }
    // any numeric value as a Double for floor/ceil bounds (None when
    // out of the safe range or not numeric)
    def dbl(v: Any): Option[Double] = (v match {
      case n: java.lang.Number => Some(n.doubleValue)
      case bd: scala.math.BigDecimal => Some(bd.toDouble)
      case _ => None
    }).filter(d => !d.isNaN && math.abs(d) < SAFE.toDouble)
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    var keys = Option.empty[Seq[Long]]
    def tightenLo(v: Long): Unit = if (lo.forall(_ < v)) lo = Some(v)
    def tightenHi(v: Long): Unit = if (hi.forall(_ > v)) hi = Some(v)
    def addKeys(ks: Seq[Long]): Unit =
      keys = Some(keys.fold(ks)(_.intersect(ks)))
    def walk(f: Filter): Unit = f match {
      case EqualTo(`c`, v) => dbl(v).foreach { _ =>
        whole(v) match {
          case Some(k) => tightenLo(k); tightenHi(k); addKeys(Seq(k))
          case None => addKeys(Seq.empty) // int = 2.2 matches nothing
        }
      }
      case In(`c`, vs) =>
        val ds = vs.toSeq.map(dbl)
        // only constrain when every member is understood numerically;
        // non-whole members can't equal an integral column — dropped
        if (ds.forall(_.isDefined)) addKeys(vs.toSeq.flatMap(whole))
      case GreaterThan(`c`, v) =>
        dbl(v).foreach(d => tightenLo(math.floor(d).toLong + 1))
      case GreaterThanOrEqual(`c`, v) =>
        dbl(v).foreach(d => tightenLo(math.ceil(d).toLong))
      case LessThan(`c`, v) =>
        dbl(v).foreach(d => tightenHi(math.ceil(d).toLong - 1))
      case LessThanOrEqual(`c`, v) =>
        dbl(v).foreach(d => tightenHi(math.floor(d).toLong))
      case And(l, r) => walk(l); walk(r)
      case _ => // non-prunable shape: contributes no constraint
    }
    pushed.foreach(walk)
    (lo, hi, keys)
  }

  override def build(): Scan = {
    val s = SparkSession.active
    // one conjunctive constraint per integral declared column — a
    // file survives only if EVERY column's manifest stats allow it
    val constraints = statsColsTyped.collect {
      case (c, dt) if integral(dt) =>
        val (lo, hi, keys0) = statsConstraints(c)
        // Bloom probes hash as LongType; publish hashed the native
        // type — only a LongType stats column may key-prune
        val keys = if (dt == LongType) keys0 else None
        ScaleOps.ColConstraint(c, lo, hi, keys)
    }
    val (_, files) = ScaleOps.planSnapshotFiles(s, root, Some(version),
      constraints)
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
