package graft.sources

import java.util

import graft.operators.ScaleOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The snapshot store as a CATALOG — register with
  * `spark.sql.catalog.<name> = graft.sources.SnapshotCatalog` and
  * `spark.sql.catalog.<name>.warehouse = <dir>`, and every store
  * under the warehouse is a SQL-addressable table:
  *
  * {{{
  *   CREATE TABLE cat.docs (doc_id BIGINT, text STRING)
  *     TBLPROPERTIES ('statscol' = 'doc_id')
  *   INSERT INTO cat.docs SELECT ...          -- appendSnapshot
  *   INSERT OVERWRITE cat.docs SELECT ...     -- publishSnapshot
  *   df.writeTo("cat.docs").append()
  *   SELECT ... FROM cat.docs WHERE doc_id BETWEEN ...  -- pruned scan
  * }}}
  *
  * Reads and writes route through the SAME machinery as the path
  * API: loadTable resolves the head version from ONE manifest header
  * (schema + declared stats columns — zero footers), scans prune
  * through the manifest's zone maps/Blooms, and every write is a
  * race-safe [[ScaleOps]] commit (claim + rename + conflict
  * detection), so SQL writers and API writers contend correctly on
  * the same store. Time travel stays on the path face
  * (`option("version"/"ref"/"timestampAsOf")`) — a catalog table
  * names the HEAD, the Delta convention.
  *
  * `CREATE TABLE` publishes an EMPTY v1 carrying the declared schema
  * in its manifest header (the store is then loadable before its
  * first insert); a `statscol` table property (comma-separated
  * columns allowed) rides the `#statscols:` header and every later
  * commit inherits it. Tables are directories; namespaces are
  * subdirectories; partitioning is rejected — clustering is the
  * store's own zone-map discipline, not hive-style directories. */
class SnapshotCatalog extends TableCatalog with ProcedureCatalog {

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catName

  private def spark: SparkSession = SparkSession.active

  private def rootFor(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_manifests")))
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    ScaleOps.snapshotVersions(spark, rootFor(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table = {
    val root = rootFor(ident)
    val vs = ScaleOps.snapshotVersions(spark, root)
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    val v = vs.last
    val schema = ScaleOps.snapshotSchema(spark, root, v).getOrElse(
      ScaleOps.readSnapshot(spark, root, Some(v)).schema)
    new SnapshotTable(root, v, schema,
      ScaleOps.snapshotStatsCols(spark, root, v))
  }

  /** SQL time travel — `SELECT … FROM cat.t VERSION AS OF 3` (a
    * committed version number or a named ref) and `… TIMESTAMP AS OF
    * '2026-08-01…'`: the engine's own pinned-version read, resolved
    * from the same manifest headers as the path face's
    * version/ref/timestampAsOf options. Travel pins are READ pins —
    * writes always contend on the head, so the returned table keeps
    * its write face but any engine write to a non-head pin loses the
    * expectParent check loudly rather than forking history. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootFor(ident)
    val vs = ScaleOps.snapshotVersions(spark, root)
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    val v = scala.util.Try(version.toLong).toOption match {
      case Some(n) =>
        require(vs.contains(n),
          s"snapshot v$n not committed (have ${vs.mkString(",")})")
        n
      case None => ScaleOps.resolveRef(spark, root, version)
    }
    tableAt(root, v)
  }

  /** TIMESTAMP AS OF — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootFor(ident)
    if (ScaleOps.snapshotVersions(spark, root).isEmpty)
      throw new NoSuchTableException(ident)
    tableAt(root,
      ScaleOps.resolveAsOfTimestamp(spark, root, timestamp / 1000L))
  }

  private def tableAt(root: String, v: Long): Table = {
    val schema = ScaleOps.snapshotSchema(spark, root, v).getOrElse(
      ScaleOps.readSnapshot(spark, root, Some(v)).schema)
    new SnapshotTable(root, v, schema,
      ScaleOps.snapshotStatsCols(spark, root, v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog tables are unpartitioned — cluster via the " +
        "'statscol' property's zone maps instead of directories")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val statsCol = Option(properties.get("statscol")).filter(_.nonEmpty)
    // an empty v1 carrying the schema (and declared stats columns) in
    // its manifest header: loadable before the first insert, and the
    // insert is then an ordinary append commit against a parent
    ScaleOps.publishSnapshot(spark, rootFor(ident),
      spark.createDataFrame(new util.ArrayList[Row](), schema), statsCol)
    loadTable(ident)
  }

  /** `ALTER TABLE … ADD COLUMN(S)` — a SCHEMA-ONLY COMMIT: an empty
    * append whose batch carries the widened schema, which
    * [[ScaleOps]]' commit merges into the parent's `#schema:` header
    * (the same merge path a widening write takes, s11/s16). Existing
    * files stay physically column-free; reads null-fill, the Delta
    * rule. Added columns are forced nullable — rows already
    * committed have no value to put in a required column. Every
    * other change kind is refused loudly: the store evolves through
    * commits, it is never mutated in place. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.size != changes.size)
      throw new UnsupportedOperationException(
        "graft snapshot tables support only ALTER TABLE ADD COLUMN(S)" +
          " — other alterations would mutate committed history; got: " +
          changes.filterNot(_.isInstanceOf[TableChange.AddColumn])
            .mkString(", "))
    val root = rootFor(ident)
    val vs = ScaleOps.snapshotVersions(spark, root)
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    val current = ScaleOps.snapshotSchema(spark, root, vs.last).getOrElse(
      ScaleOps.readSnapshot(spark, root, Some(vs.last)).schema)
    val widened = adds.foldLeft(current) { (sch, a) =>
      require(a.fieldNames.length == 1,
        s"nested ADD COLUMN not supported: ${a.fieldNames.mkString(".")}")
      val name = a.fieldNames.head
      require(!sch.fields.exists(_.name.equalsIgnoreCase(name)),
        s"column '$name' already exists")
      sch.add(StructField(name, a.dataType, nullable = true,
        Option(a.comment).map(c =>
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString("comment", c).build())
          .getOrElse(org.apache.spark.sql.types.Metadata.empty)))
    }
    ScaleOps.appendSnapshot(spark, root,
      spark.createDataFrame(new util.ArrayList[Row](), widened))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = new Path(rootFor(ident))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(root, "_manifests")) && fs.delete(root, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft snapshot tables are directories; rename the store and " +
        "re-point readers instead")

  /** A procedure's `table` argument resolved against THIS catalog's
    * warehouse (namespaces as dotted prefixes). */
  private[sources] def rootForName(table: String): String = {
    val parts = table.split('.')
    rootFor(Identifier.of(parts.init, parts.last))
  }

  // ---- SQL maintenance procedures: CALL <cat>.system.<verb>(...) ----

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"procedures live under the 'system' namespace, got $ident")
    SnapshotProcedures.forName(this, ident.name()).getOrElse(
      throw new UnsupportedOperationException(
        s"unknown procedure '${ident.name()}' — have " +
          SnapshotProcedures.names.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      SnapshotProcedures.names.map(Identifier.of(Array("system"), _))
    else Array.empty
}
