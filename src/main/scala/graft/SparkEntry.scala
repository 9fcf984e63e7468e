package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-layer modules; each module pairs its
  * Spark implementation with the DuckDB oracle SQL the driver uses as
  * the correctness gate.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    operators.AdsQueries,
    operators.DwdOps,
    operators.JoinOps,
    operators.DwsWindows,
    operators.TextOps,
    operators.CorpusStats,
    operators.DedupOps,
    operators.VectorOps,
    operators.SearchOps,
    operators.MediaOps,
    operators.ScaleOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Province revenue rollup: star join (broadcast dims) + aggregation. */
  def entry(spark: SparkSession): DataFrame =
    operators.AdsQueries.b5ProvinceMap(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
