package graft.sources

import graft.operators.ScaleOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** The maintenance verbs as SQL STORED PROCEDURES (Spark 4's
  * ProcedureCatalog / `CALL` statement — the Iceberg
  * `CALL cat.system.rewrite_data_files(...)` shape), so a SQL-only
  * operator can run the store's standing cadence without touching
  * the Scala API:
  *
  * {{{
  *   CALL cat.system.optimize('tbl', 134217728, 'doc_id')
  *   CALL cat.system.vacuum('tbl', 3)
  *   CALL cat.system.zorder('tbl', 'source,day', 64)
  * }}}
  *
  * Each routes to the engine's own commit-protocol implementation
  * ([[ScaleOps.compactSnapshot]] — which also materializes deletion
  * vectors — [[ScaleOps.vacuumSnapshots]], [[ScaleOps.zorderSnapshotK]])
  * and returns its outcome as a one-row result (committed version /
  * reclaim accounting) through a [[LocalScan]]. */
private[sources] object SnapshotProcedures {

  /** One-row procedure result. */
  private case class ResultScan(schema: StructType, row: InternalRow)
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = Array(row)
  }

  private def one(schema: StructType, values: Any*): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(
      ResultScan(schema, InternalRow.fromSeq(values)): Scan).iterator()

  private def spark: SparkSession = SparkSession.active

  /** Self-binding procedure base (the parameters are static, so bind
    * is identity — the analyzer's coercion works off `parameters`). */
  private abstract class Proc(procName: String,
      desc: String) extends UnboundProcedure
      with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  private def in(n: String, dt: DataType) =
    ProcedureParameter.in(n, dt).build()

  def forName(cat: SnapshotCatalog, name: String): Option[UnboundProcedure] =
    name match {
      case "optimize" => Some(new Proc("optimize",
        "bin-pack undersized files and materialize deletion vectors " +
          "(ScaleOps.compactSnapshot); returns the committed version") {
        override def parameters(): Array[ProcedureParameter] = Array(
          in("table", StringType), in("target_bytes", LongType),
          in("stats_col", StringType))
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = cat.rootForName(input.getUTF8String(0).toString)
          val statsCol = if (input.isNullAt(2)) None
            else Some(input.getUTF8String(2).toString)
          val v = ScaleOps.compactSnapshot(spark, root, input.getLong(1),
            statsCol)
          one(StructType(Seq(StructField("version", LongType))), v)
        }
      })
      case "vacuum" => Some(new Proc("vacuum",
        "expire all but the newest `keep` versions, reference-counted " +
          "(ScaleOps.vacuumSnapshots); returns reclaim accounting") {
        override def parameters(): Array[ProcedureParameter] = Array(
          in("table", StringType), in("keep", IntegerType))
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = cat.rootForName(input.getUTF8String(0).toString)
          val (files, bytes) = ScaleOps.vacuumSnapshots(spark, root,
            input.getInt(1))
          one(StructType(Seq(StructField("files_deleted", LongType),
            StructField("bytes_reclaimed", LongType))), files, bytes)
        }
      })
      case "zorder" => Some(new Proc("zorder",
        "recluster the head version on the k-D Morton curve over the " +
          "given columns (ScaleOps.zorderSnapshotK); returns the " +
          "committed version") {
        override def parameters(): Array[ProcedureParameter] = Array(
          in("table", StringType), in("columns", StringType),
          in("files", IntegerType))
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val root = cat.rootForName(input.getUTF8String(0).toString)
          val cols = input.getUTF8String(1).toString
            .split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val v = ScaleOps.zorderSnapshotK(spark, root, cols,
            input.getInt(2))
          one(StructType(Seq(StructField("version", LongType))), v)
        }
      })
      case _ => None
    }

  val names: Array[String] = Array("optimize", "vacuum", "zorder")
}
