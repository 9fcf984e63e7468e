package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew discipline: salted two-level aggregation.
  *
  * At the 100 TB design point a hash aggregation keyed on a skewed
  * column (one hot user, one hot sku) funnels the hot key's entire
  * volume through a single reduce task. The standard fix is salting:
  * aggregate on (key, salt) first — spreading the hot key over
  * `salts` reducers — then combine the partials per key. Both levels
  * are plain hash aggregations, so Catalyst still applies map-side
  * partial aggregation within each level.
  *
  * The salt must be deterministic here (oracle equality), so it
  * derives from a row-unique column rather than rand(); production
  * use with rand() changes nothing semantically for additive
  * aggregates.
  *
  * a08_salted re-states a08_keyed_agg through this path and shares
  * its oracle SQL verbatim — the correctness gate proves the salted
  * plan is value-identical to the direct one. (AQE's runtime skew
  * handling covers joins; salting covers aggregations, which AQE
  * does not rebalance.)
  */
object ScaleOps extends QueryModule {

  /** Two-level salted aggregation: partials on (key, salt), final on
    * key. `aggs` maps output column name → (partial agg of the input,
    * final combine of the partial column). */
  def saltedAgg(
      df: DataFrame, key: Column, saltFrom: Column, salts: Int,
      aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    val partialCols = aggs.map { case (name, partial, _) => partial.as(s"__p_$name") }
    val finalCols = aggs.map { case (name, _, fin) => fin(col(s"__p_$name")).as(name) }
    df
      .groupBy(key.as("__key"), pmod(hash(saltFrom), lit(salts)).as("__salt"))
      .agg(partialCols.head, partialCols.tail: _*)
      .groupBy(col("__key"))
      .agg(finalCols.head, finalCols.tail: _*)
  }

  /** Write `df` as a bucketed + bucket-sorted managed parquet table —
    * the co-location layout for the 100 TB fact tables: a later join
    * or aggregation on `key` between tables bucketed the same way
    * needs NO shuffle exchange (Spark matches HashPartitioning(key,
    * buckets) on both sides) and no sort for sort-merge. At scale this
    * converts the nightly fact⋈fact joins from full-network shuffles
    * into local map-side merges; BucketingSpec pins the zero-Exchange
    * plan and value parity vs the plain-parquet join. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** a08 restated through the salted path — hot-key-safe keyed
    * aggregation with identical results (shared oracle). The
    * countDistinct becomes exact set-union across salt partitions. */
  def a08Salted(s: SparkSession, d: String): DataFrame =
    saltedAgg(
      Tables.events(s, d),
      key = col("user_id"), saltFrom = col("event_id"), salts = 16,
      aggs = Seq(
        ("event_ct", count(lit(1)), (p: Column) => sum(p)),
        ("type_ct", collect_set(col("event_type")),
          (p: Column) => size(array_distinct(flatten(collect_list(p)))).cast(LongType)),
        ("value_sum", sum(col("value").cast(DecimalType(12, 2))),
          (p: Column) => sum(p).cast(DoubleType))))
      .select(col("__key").as("user_id"), col("event_ct"), col("type_ct"), col("value_sum"))
      .orderBy(col("user_id"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a08_salted" -> a08Salted)

  // identical semantics ⇒ identical oracle as a08_keyed_agg
  override val oracle: Map[String, String] = Map(
    "a08_salted" ->
      """SELECT user_id, COUNT(*) AS event_ct,
        |       COUNT(DISTINCT event_type) AS type_ct,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
