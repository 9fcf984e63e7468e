package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DWM-layer joins (SURVEY.md §2 A14/A15).
  *
  * A14 interval join (OrderWideApp.java:96-105, between(-5s,+5s)): in
  * batch, an equi-join plus a time-range predicate — Catalyst plans the
  * equi-key as the shuffle/join key and the range as a post-filter, so
  * it scales like a plain hash join.
  *
  * A15 dim enrichment (OrderWideApp.java:109-214): the reference's
  * async+Redis lookup machinery collapses into chained dim joins —
  * bounded dims (nation, region) broadcast explicitly; the sf-scaled
  * customer table is left to AQE so the plan degrades gracefully at
  * the 100 TB design point instead of OOMing on a forced broadcast.
  */
object JoinOps extends QueryModule {

  private val dec2 = DecimalType(12, 2)

  /** A14: orders ⋈ lineitem on order key, shipment within [order date,
    * order date + 90 days] — same shape as the reference's ±5s bound. */
  def a14IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(
        col("o_orderkey"), col("l_linenumber"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        col("l_extendedprice").cast(dec2).cast(DoubleType).as("amount"))
      .orderBy(col("o_orderkey"), col("l_linenumber"))
  }

  /** A15: order-wide — fact stream enriched by chained broadcast dim
    * joins (customer → nation → region), with a derived column standing
    * in for the reference's BIRTHDAY→age computation. */
  def a15OrderWide(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_totalprice").cast(dec2).cast(DoubleType).as("total_amount"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("create_date"),
        col("c_name").as("user_name"),
        col("c_mktsegment").as("user_segment"),
        floor(datediff(lit("2002-01-01").cast(DateType), col("o_orderdate")) / 365)
          .cast(LongType).as("order_age_years"),
        col("n_name").as("province_name"),
        col("r_name").as("region_name"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment_filled"))
      .orderBy(col("o_orderkey"))
  }

  /** As-of join: each event paired with the user's MOST RECENT order
    * at or before the event time (the temporal lookup Spark has no
    * built-in operator for; composed per the preference order from
    * equi-join + range filter + per-(event) rank — the keyed shuffle
    * makes it data-proportional, no cross product). DuckDB's native
    * ASOF JOIN is deliberately NOT used in the oracle so both engines
    * share identical tie-break semantics (latest date, then highest
    * order key). Left-join semantics: events with no prior order keep
    * nulls. */
  def a14bAsofJoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice").cast(dec2).as("o_total"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    e.join(o,
        e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        col("o_orderkey").as("asof_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("asof_orderdate"),
        col("o_total").cast(DoubleType).as("asof_total"))
      .orderBy(col("event_id"))
  }

  /** Range join: each event banded by a bounded value-range dim
    * (broadcast — a range condition against a small dim is a
    * BroadcastNestedLoopJoin, which is exactly right when the build
    * side is tiny and the probe side streams through). */
  def a14cRangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("low", 0.0, 25.0), ("mid", 25.0, 50.0),
      ("high", 50.0, 75.0), ("top", 75.0, 1e18)
    ).toDF("band", "lo", "hi")
    val e = Tables.events(s, d)
    e.join(broadcast(bands), e("value") >= bands("lo") && e("value") < bands("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("ct"),
        sum(col("value").cast(dec2)).cast(DoubleType).as("value_sum"))
      .orderBy(col("band"))
  }

  /** Sessionization: Spark's session_window (5-minute gap) per user —
    * the gaps-and-islands operation every log pipeline needs. Output
    * sticks to quantities both engines define identically (first/last
    * event time, counts, exact sums); Spark's synthetic window end
    * (last + gap) stays internal. */
  def a17bSessionize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "5 minutes").as("sw"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        sum(col("value").cast(dec2)).cast(DoubleType).as("value_sum"))
      .select(
        col("user_id"),
        date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("last_ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("value_sum"))
      .orderBy(col("user_id"), col("session_start"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a14_interval_join" -> a14IntervalJoin,
    "a14b_asof_join" -> a14bAsofJoin,
    "a14c_range_join" -> a14cRangeJoin,
    "a17b_sessionize" -> a17bSessionize,
    "a15_order_wide" -> a15OrderWide)

  override val oracle: Map[String, String] = Map(
    "a14c_range_join" ->
      """SELECT band, COUNT(*) AS ct,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        |FROM events JOIN (
        |  VALUES ('low', 0.0, 25.0), ('mid', 25.0, 50.0),
        |         ('high', 50.0, 75.0), ('top', 75.0, 1e18)
        |) AS bands(band, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    // gaps-and-islands twin of session_window(ts, '5 minutes'):
    // a new session starts when the gap from the previous event of
    // the same user EXCEEDS 5 minutes — Spark merges an event at
    // exactly the gap distance (pinned by the streaming session spec
    // in PipelineSpec; '>=' here would diverge at the boundary).
    "a17b_sessionize" ->
      """SELECT user_id,
        |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        |FROM (
        |  SELECT user_id, ts, value,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM (
        |    SELECT user_id, ts, value, event_id,
        |           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                     IS NULL THEN 1
        |                WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                     > INTERVAL 5 MINUTE THEN 1
        |                ELSE 0 END AS new_session
        |    FROM events))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "a14b_asof_join" ->
      """SELECT event_id, user_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |       o_orderkey AS asof_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS asof_orderdate,
        |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS asof_total
        |FROM (
        |  SELECT e.event_id, e.user_id, e.ts,
        |         o.o_orderkey, o.o_orderdate, o.o_totalprice,
        |         row_number() OVER (PARTITION BY e.event_id
        |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM (SELECT event_id, user_id, ts FROM events
        |        WHERE event_type = 'purchase') e
        |  LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "a14_interval_join" ->
      """SELECT o_orderkey, l_linenumber,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS amount
        |FROM orders JOIN lineitem
        |  ON o_orderkey = l_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    "a15_order_wide" ->
      """SELECT o_orderkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_amount,
        |       strftime(o_orderdate, '%Y-%m-%d') AS create_date,
        |       c_name AS user_name,
        |       c_mktsegment AS user_segment,
        |       CAST(FLOOR(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') / 365.0) AS BIGINT)
        |         AS order_age_years,
        |       n_name AS province_name,
        |       r_name AS region_name,
        |       COALESCE(c_mktsegment, 'UNKNOWN') AS segment_filled
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY o_orderkey""".stripMargin)
}
