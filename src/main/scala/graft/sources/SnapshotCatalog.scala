package graft.sources

import java.util

import graft.operators.ScaleOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
class SnapshotCatalog extends TableCatalog {

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

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft snapshot tables evolve through commits " +
        "(mergeIntoSnapshot(evolveSchema = true)), not ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = {
    val root = new Path(rootFor(ident))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(root, "_manifests")) && fs.delete(root, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft snapshot tables are directories; rename the store and " +
        "re-point readers instead")
}
