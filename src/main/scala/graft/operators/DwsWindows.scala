package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DWS-layer windowed aggregations (SURVEY.md §2 A16-A25) as batch
  * twins over `events` — the same Column expressions run unchanged
  * under readStream (graft.streaming.WindowedAggs reuses them).
  *
  * Semantics mirrored from the reference:
  *  - VisitorStats: 4 per-source measure projections → union → 10s
  *    tumbling event-time window → additive reduce → stt/edt finisher
  *    (gmall-realtime/.../dws/VisitorStatsApp.java:77-195).
  *  - ProductStats: one-hot measures + exact distinct via set state
  *    (ProductStatsApp.java:90-249, HashSet fields ProductStats.java:62-69).
  *  - ProvinceStats: SQL windowed agg with COUNT(DISTINCT)
  *    (ProvinceStatsSqlApp.java:48-56).
  *  - KeywordStats: filter → tokenize (lateral) → windowed count
  *    (KeywordStatsApp.java:52-67).
  *  - UserJumpDetail (CEP bounce): entry page twice strictly
  *    consecutively within 10s, plus timed-out partial matches
  *    (UserJumpDetailApp.java:84-123). Batch twin via lead() below;
  *    the stateful streaming form lives in graft.streaming.StatefulOps.
  *
  * Window alignment: Spark's window() buckets are epoch-aligned and
  * DuckDB's time_bucket origin (2000-01-03 00:00:00) is a whole
  * multiple of 10s from the epoch, so 10-second buckets agree exactly.
  *
  * Scale notes (100 TB design point): the union is a zero-shuffle
  * concatenation of narrow projections; the only shuffle is the final
  * hash aggregation on (window, dims) — partial aggregation happens
  * map-side for the additive measures. Exact windowed distinct keeps
  * per-(window,key) sets; at production scale swap order_ct to
  * approx_count_distinct or a two-level agg — kept exact here because
  * the oracle demands hash equality.
  */
object DwsWindows extends QueryModule {

  private val dec2 = DecimalType(12, 2)
  private def fmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Events with the is_new dimension (user parity, as in AdsQueries). */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("is_new", (col("user_id") % 2).cast(StringType))

  /** A17+A18: the four per-source measure projections unioned to the
    * common VisitorStats measure-row schema. dur_sum stays DECIMAL here
    * so downstream window sums are exact; a17's public output casts it
    * to DOUBLE per row (no aggregation → no float-order issue). */
  private def measureRows(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val zero = lit(0L)
    val zdec = lit(0).cast(dec2)
    // pv: every page view carries pv=1 and its dwell time
    val pv = e.filter(col("event_type") === "view").select(
      col("event_id"), col("ts"), col("is_new"),
      zero.as("uv_ct"), lit(1L).as("pv_ct"), zero.as("sv_ct"), zero.as("uj_ct"),
      col("value").cast(dec2).as("dur_sum"))
    // uv: first qualifying view per user per day (UniqueVisitApp twin)
    val w = Window.partitionBy(col("user_id"), col("dt")).orderBy(col("ts"), col("event_id"))
    val uv = e.filter(col("event_type") === "view")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("event_id"), col("ts"), col("is_new"),
        lit(1L).as("uv_ct"), zero.as("pv_ct"), zero.as("sv_ct"), zero.as("uj_ct"),
        zdec.as("dur_sum"))
    // sv: session starts (reference: last_page_id empty)
    val sv = e.filter(col("event_type") === "signup").select(
      col("event_id"), col("ts"), col("is_new"),
      zero.as("uv_ct"), zero.as("pv_ct"), lit(1L).as("sv_ct"), zero.as("uj_ct"),
      zdec.as("dur_sum"))
    // uj: user jumps (bounce stream stand-in)
    val uj = e.filter(col("event_type") === "error").select(
      col("event_id"), col("ts"), col("is_new"),
      zero.as("uv_ct"), zero.as("pv_ct"), zero.as("sv_ct"), lit(1L).as("uj_ct"),
      zdec.as("dur_sum"))
    pv.unionByName(uv).unionByName(sv).unionByName(uj)
  }

  /** A17 union of per-source projections, row-level (pre-aggregation). */
  def a17UnionStats(s: SparkSession, d: String): DataFrame =
    measureRows(s, d)
      .select(
        col("event_id"), col("is_new"),
        col("uv_ct"), col("pv_ct"), col("sv_ct"), col("uj_ct"),
        col("dur_sum").cast(DoubleType).as("dur_sum"))
      .orderBy(col("event_id"), col("uv_ct"))

  /** The AGGREGATED measure frame (window, is_new, uv/pv/sv/uj counts,
    * exact dur sum) the a20/a20c/b9 reports read — round-14 shape: the
    * union-of-4-projections form re-SCANNED the event log four times
    * (once per measure source) to build rows a single aggregation
    * immediately collapsed. Because every measure is an additive
    * conditional over one event, the pv/sv/uj/dur sums come from ONE
    * filtered scan, and only the uv measure (first qualifying view per
    * user-day) keeps its views-only window pass — 4 corpus scans → 2,
    * same exchanges, identical group set and values (groups exist iff
    * ≥ 1 view/signup/error event lands in them, exactly the union's
    * row sources; the left join's uv side is a subset of those groups,
    * so coalesce(uv, 0) reproduces the union's summed zeros). The
    * row-level a17 face keeps the reference's union shape. */
  private def measureAgg(s: SparkSession, d: String, win: Column): DataFrame = {
    val e = ev(s, d)
    val base = e
      .filter(col("event_type").isin("view", "signup", "error"))
      .groupBy(win.as("window"), col("is_new"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("pv_ct"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("sv_ct"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("uj_ct"),
        sum(when(col("event_type") === "view", col("value").cast(dec2))
          .otherwise(lit(0).cast(dec2))).as("dur_sum_exact"))
    val w = Window.partitionBy(col("user_id"), col("dt"))
      .orderBy(col("ts"), col("event_id"))
    val uv = e.filter(col("event_type") === "view")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(win.as("window"), col("is_new"))
      .agg(count(lit(1)).as("uv_ct"))
    base.join(uv, Seq("window", "is_new"), "left")
      .select(col("window"), col("is_new"),
        coalesce(col("uv_ct"), lit(0L)).as("uv_ct"),
        col("pv_ct"), col("sv_ct"), col("uj_ct"), col("dur_sum_exact"))
  }

  /** A19-A21: 10s tumbling event-time window over the measure rows,
    * additive reduce, stt/edt formatted from the window bounds. */
  def a20TumbleVisitor(s: SparkSession, d: String): DataFrame =
    measureAgg(s, d, window(col("ts"), "10 seconds"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("is_new"), col("uv_ct"), col("pv_ct"), col("sv_ct"), col("uj_ct"),
        col("dur_sum_exact").cast(DoubleType).as("dur_sum"))
      .orderBy(col("stt"), col("is_new"))

  /** A20 in the reference's full keying: the 10s tumble grouped by
    * the Tuple4 dimension key (vc, ch, ar, is_new) of
    * VisitorStatsApp.java:148-160. The events table carries no
    * version/channel/area columns, so the dims derive
    * deterministically from ids (portable arithmetic on both
    * engines); the keying/aggregation shape is the point. */
  def a20b4DimVisitor(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .withColumn("vc", expr("concat('v', user_id % 3)"))
      .withColumn("ch", expr("concat('c', (user_id div 3) % 4)"))
      .withColumn("ar", expr("concat('a', user_id % 5)"))
      .groupBy(window(col("ts"), "10 seconds"),
        col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("pv_ct"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("sv_ct"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("uj_ct"),
        sum(col("value").cast(dec2)).cast(DoubleType).as("dur_sum"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("vc"), col("ch"), col("ar"), col("is_new"),
        col("pv_ct"), col("sv_ct"), col("uj_ct"), col("dur_sum"))
      .orderBy(col("stt"), col("vc"), col("ch"), col("ar"), col("is_new"))

  /** A19/A20 in the third standard window shape — SLIDING (hopping):
    * 20s windows every 10s, so each event lands in exactly two
    * windows. The reference only uses tumbling (its engine supports
    * sliding; a complete engine must too — session windows are
    * a17b). Spark's window(ts, "20 seconds", "10 seconds") generates
    * slide-aligned starts; the oracle expands each event into its
    * two windows with an unnest([0,1]) cross join — every event's
    * offset into its k-th window is k·10s + (ts mod 10s) < 20s, so
    * membership needs no extra filter. */
  def a20cSlidingVisitor(s: SparkSession, d: String): DataFrame =
    measureAgg(s, d, window(col("ts"), "20 seconds", "10 seconds"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("is_new"), col("uv_ct"), col("pv_ct"), col("sv_ct"), col("uj_ct"),
        col("dur_sum_exact").cast(DoubleType).as("dur_sum"))
      .orderBy(col("stt"), col("is_new"))

  /** A21 internals with order_amount still DECIMAL-exact, so
    * downstream (ADS-over-stats) re-aggregation stays exact; the
    * public a21 casts to DOUBLE per row. */
  private[operators] def productStatsExact(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("sku_id", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(window(col("ts"), "10 seconds"), col("sku_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click_ct"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("display_ct"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("favor_ct"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("refund_ct"),
        sum(when(col("event_type") === "purchase", col("value").cast(dec2)))
          .as("order_amount_exact"),
        size(collect_set(when(col("event_type") === "purchase", col("user_id"))))
          .cast(LongType).as("order_ct"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("sku_id"), col("click_ct"), col("display_ct"), col("favor_ct"),
        col("refund_ct"), col("order_amount_exact"), col("order_ct"))

  /** A21+A22: ProductStats twin — one-hot measures per event kind,
    * 10s tumble per sku, exact distinct buyer count via collect_set
    * (mirrors the reference's HashSet-in-reduce-state trick). */
  def a21ProductStats(s: SparkSession, d: String): DataFrame =
    productStatsExact(s, d)
      .withColumn("order_amount", col("order_amount_exact").cast(DoubleType))
      .drop("order_amount_exact")
      .select(
        col("stt"), col("edt"), col("sku_id"), col("click_ct"),
        col("display_ct"), col("favor_ct"), col("refund_ct"),
        col("order_amount"), col("order_ct"))
      .orderBy(col("stt"), col("sku_id"))

  /** B1-over-stats (the reference's actual ADS shape: GMV answered
    * FROM product_stats, ProductStatsMapper.java:15-17): total order
    * amount re-aggregated from the windowed stats. The re-aggregation
    * runs on the exact DECIMAL column — summing the per-window DOUBLE
    * would make the result depend on float summation order. */
  def b1sGmvFromStats(s: SparkSession, d: String): DataFrame =
    productStatsExact(s, d)
      .agg(sum(col("order_amount_exact")).cast(DoubleType).as("gmv"),
        sum(col("order_ct")).as("order_ct"))

  /** B5-over-stats: province revenue re-aggregated from the windowed
    * province stats (ProvinceStatsMapper.java:13-16 reads
    * province_stats, not orders). order_count sums the per-window
    * exact distincts, as the reference's ADS does. */
  def b5sProvinceFromStats(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val windowed = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(window(col("o_orderdate"), "10 seconds"),
        col("n_nationkey").as("province_id"), col("n_name").as("province_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("order_count"),
        sum(col("o_totalprice").cast(dec2)).as("order_amount_exact"))
    windowed
      .groupBy(col("province_id"), col("province_name"))
      .agg(
        sum(col("order_count")).as("order_count"),
        sum(col("order_amount_exact")).cast(DoubleType).as("order_amount"))
      .orderBy(col("province_id"))
  }

  /** B9 — the publisher's daily pv/uv point lookups
    * (VisitorStatsMapper.java:24-30: `select count(pv_ct) …`,
    * `select count(uv_ct) …` over visitor_stats for one day),
    * answered from the windowed visitor stats like b1s/b5s.
    *
    * Reference-bug resolution (SURVEY §7.4.2): the reference's
    * `count(pv_ct)` counts stats-table ROWS, not page views — both
    * lookups return the same number (the count of non-null 10s
    * window slices), which is clearly not what a "total PV / total
    * UV" dashboard tile intends. We emit BOTH: `stat_rows` is the
    * reference-faithful count (what its dashboard actually showed),
    * `pv_ct`/`uv_ct` are the intended SUMs over the window slices. */
  def b9DailyTotals(s: SparkSession, d: String): DataFrame =
    measureAgg(s, d, window(col("ts"), "10 seconds"))
      .groupBy(date_format(col("window.start"), "yyyy-MM-dd").as("dt"))
      .agg(
        count(col("pv_ct")).as("stat_rows"),
        sum(col("pv_ct")).as("pv_ct"),
        sum(col("uv_ct")).as("uv_ct"))
      .orderBy(col("dt"))

  /** A23: SQL windowed agg with COUNT(DISTINCT) — province stats over
    * orders (order event time = o_orderdate; day-granular data, same
    * 10s tumble as the reference's DDL). nation/region broadcast
    * (bounded dims); customer joins via shuffle/AQE. */
  def a23ProvinceWindow(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(window(col("o_orderdate"), "10 seconds"),
        col("n_nationkey").as("province_id"), col("n_name").as("province_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("order_count"),
        sum(col("o_totalprice").cast(dec2)).cast(DoubleType).as("order_amount"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("province_id"), col("province_name"), col("order_count"),
        col("order_amount"))
      .orderBy(col("stt"), col("province_id"))
  }

  /** A23 in the reference's ACTUAL form — SQL text executed by the
    * engine (ProvinceStatsSqlApp.java:48-56 is a sqlQuery string, not
    * DataFrame code). Same semantics as a23ProvinceWindow, same
    * oracle; proves the SQL API surface (temp views, window() in
    * GROUP BY, ANSI functions) end to end. */
  def a23bProvinceSql(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    Tables.customer(s, d).createOrReplaceTempView("v_customer")
    Tables.nation(s, d).createOrReplaceTempView("v_nation")
    s.sql(
      """SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
        |       date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS edt,
        |       n_nationkey AS province_id, n_name AS province_name,
        |       count(DISTINCT o_orderkey) AS order_count,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS order_amount
        |FROM v_orders
        |JOIN v_customer ON o_custkey = c_custkey
        |JOIN v_nation ON c_nationkey = n_nationkey
        |GROUP BY window(o_orderdate, '10 seconds'), n_nationkey, n_name
        |ORDER BY stt, province_id""".stripMargin)
  }

  /** A24+A25: filter → tokenize (explode ≡ LATERAL TABLE(ik_analyze))
    * → keyword count per 10s window. The "search phrase" is derived
    * from the event (type + the props key), standing in for page['item']. */
  def a25KeywordWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "view" &&
        get_json_object(col("props"), "$.k").isNotNull)
      .select(col("ts"), explode(split(
        concat(col("event_type"), lit(" k"),
          get_json_object(col("props"), "$.k")), " ")).as("keyword"))
      .groupBy(window(col("ts"), "10 seconds"), col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("keyword"), col("ct"))
      .orderBy(col("stt"), col("keyword"))

  /** A16 batch twin of the CEP bounce detector. An "entry page" event
    * (event_type=view here; last_page_id empty in the reference)
    * bounces when the user's strictly-next event either
    *   (a) is itself an entry and arrives within 10s  → 'match', or
    *   (b) does not exist / arrives at ≥ 10s          → 'timeout'
    * ("within" is exclusive of the 10s boundary, matching Flink's
    * within(Time.seconds(10)); the exactly-10s case times out — pinned
    * by BounceSpec). Streaming form: graft.streaming.StatefulOps. */
  def a16Bounce(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("entry", col("event_type") === "view")
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("next_entry", lead(col("entry"), 1).over(w))
      .filter(col("entry"))
      .withColumn("gap_ok",
        col("next_ts").isNotNull &&
          col("next_ts") < col("ts") + expr("INTERVAL 10 SECONDS"))
      .filter((col("gap_ok") && col("next_entry")) || !col("gap_ok"))
      .select(
        col("event_id"), col("user_id"), fmt(col("ts")).as("ts"),
        when(col("gap_ok"), "match").otherwise("timeout").as("reason"))
      .orderBy(col("event_id"))
  }

  /** A22 production swap, runnable first-class: order_ct via
    * approx_count_distinct (HyperLogLog++) instead of the exact
    * set-in-state distinct. rsd is tuned to 3%: Spark's HLL++ has no
    * sparse encoding, so every group carries its full register array
    * through the shuffle — at rsd 1% that is ~13 KB/group and
    * benchmarked SLOWER than the exact distinct at this group count,
    * while at rsd 3% (m=1024 registers, ~0.8 KB) per-group counts
    * ≪ m sit in the linear-counting small-range correction and stay
    * near-exact. The sketch wins over the exact set once per-group
    * cardinality ≫ registers — the 10^9-buyers-per-window regime the
    * swap exists for. No DuckDB oracle (different HLL implementations
    * cannot hash-match) — the driver records the rows/schema check,
    * and ApproxAndRecallSpec pins relative error < 2% against the
    * exact twin. */
  def a21xProductStatsApprox(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("sku_id", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(window(col("ts"), "10 seconds"), col("sku_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click_ct"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("display_ct"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("favor_ct"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("refund_ct"),
        sum(when(col("event_type") === "purchase", col("value").cast(dec2)))
          .cast(DoubleType).as("order_amount"),
        approx_count_distinct(
          when(col("event_type") === "purchase", col("user_id")), 0.03)
          .as("order_ct"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("sku_id"), col("click_ct"), col("display_ct"), col("favor_ct"),
        col("refund_ct"), col("order_amount"), col("order_ct"))
      .orderBy(col("stt"), col("sku_id"))

  /** A23 approx twin: COUNT(DISTINCT o_orderkey) → HLL++ rsd 3%
    * (see a21x for the rsd/shuffle-size reasoning). */
  def a23xProvinceApprox(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(window(col("o_orderdate"), "10 seconds"),
        col("n_nationkey").as("province_id"), col("n_name").as("province_name"))
      .agg(
        approx_count_distinct(col("o_orderkey"), 0.03).as("order_count"),
        sum(col("o_totalprice").cast(dec2)).cast(DoubleType).as("order_amount"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("province_id"), col("province_name"), col("order_count"),
        col("order_amount"))
      .orderBy(col("stt"), col("province_id"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a16_bounce" -> a16Bounce,
    "a17_union_stats" -> a17UnionStats,
    "a20_tumble_visitor" -> a20TumbleVisitor,
    "a20b_4dim_visitor" -> a20b4DimVisitor,
    "a20c_sliding_visitor" -> a20cSlidingVisitor,
    "a21_product_stats" -> a21ProductStats,
    "a21x_product_stats_approx" -> a21xProductStatsApprox,
    "a23_province_window" -> a23ProvinceWindow,
    "a23b_province_sql" -> a23bProvinceSql,
    "a23x_province_approx" -> a23xProvinceApprox,
    "a25_keyword_window" -> a25KeywordWindow,
    "b1s_gmv_from_stats" -> b1sGmvFromStats,
    "b5s_province_from_stats" -> b5sProvinceFromStats,
    "b9_daily_totals" -> b9DailyTotals)

  // DuckDB twins. time_bucket(INTERVAL '10 seconds', ts) ≡ Spark's
  // window(ts, "10 seconds").start (alignment argument in the scaladoc).
  private val measureRowsSql =
    """SELECT event_id, ts, CAST(user_id % 2 AS VARCHAR) AS is_new,
      |       0 AS uv_ct, 1 AS pv_ct, 0 AS sv_ct, 0 AS uj_ct,
      |       CAST(value AS DECIMAL(12,2)) AS dur_sum
      |FROM events WHERE event_type = 'view'
      |UNION ALL
      |SELECT event_id, ts, CAST(user_id % 2 AS VARCHAR),
      |       1, 0, 0, 0, CAST(0 AS DECIMAL(12,2))
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
      |    ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'view') WHERE rn = 1
      |UNION ALL
      |SELECT event_id, ts, CAST(user_id % 2 AS VARCHAR),
      |       0, 0, 1, 0, CAST(0 AS DECIMAL(12,2))
      |FROM events WHERE event_type = 'signup'
      |UNION ALL
      |SELECT event_id, ts, CAST(user_id % 2 AS VARCHAR),
      |       0, 0, 0, 1, CAST(0 AS DECIMAL(12,2))
      |FROM events WHERE event_type = 'error'""".stripMargin

  override val oracle: Map[String, String] = Map(
    "b9_daily_totals" ->
      s"""SELECT dt, CAST(COUNT(pv_ct) AS BIGINT) AS stat_rows,
         |       CAST(SUM(pv_ct) AS BIGINT) AS pv_ct,
         |       CAST(SUM(uv_ct) AS BIGINT) AS uv_ct
         |FROM (
         |  SELECT strftime(time_bucket(INTERVAL '10 seconds', ts), '%Y-%m-%d') AS dt,
         |         SUM(uv_ct) AS uv_ct, SUM(pv_ct) AS pv_ct
         |  FROM ($measureRowsSql)
         |  GROUP BY time_bucket(INTERVAL '10 seconds', ts), is_new)
         |GROUP BY dt ORDER BY dt""".stripMargin,
    "b1s_gmv_from_stats" ->
      """SELECT CAST(SUM(oa) AS DOUBLE) AS gmv, CAST(SUM(oc) AS BIGINT) AS order_ct
        |FROM (
        |  SELECT SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS oa,
        |         COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS oc
        |  FROM events
        |  GROUP BY time_bucket(INTERVAL '10 seconds', ts),
        |           CAST(json_extract_string(props, '$.k') AS BIGINT))""".stripMargin,
    "b5s_province_from_stats" ->
      """SELECT province_id, province_name,
        |       CAST(SUM(order_count) AS BIGINT) AS order_count,
        |       CAST(SUM(oa) AS DOUBLE) AS order_amount
        |FROM (
        |  SELECT n_nationkey AS province_id, n_name AS province_name,
        |         COUNT(DISTINCT o_orderkey) AS order_count,
        |         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS oa
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY time_bucket(INTERVAL '10 seconds', o_orderdate), 1, 2)
        |GROUP BY province_id, province_name
        |ORDER BY province_id""".stripMargin,
    "a20b_4dim_visitor" ->
      """SELECT strftime(time_bucket(INTERVAL '10 seconds', ts), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(time_bucket(INTERVAL '10 seconds', ts) + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
        |       'v' || (user_id % 3) AS vc,
        |       'c' || ((user_id // 3) % 4) AS ch,
        |       'a' || (user_id % 5) AS ar,
        |       CAST(user_id % 2 AS VARCHAR) AS is_new,
        |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS pv_ct,
        |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS sv_ct,
        |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS uj_ct,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS dur_sum
        |FROM events
        |GROUP BY 1, 2, 3, 4, 5, 6
        |ORDER BY stt, vc, ch, ar, is_new""".stripMargin,
    "a16_bounce" ->
      """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       CASE WHEN gap_ok THEN 'match' ELSE 'timeout' END AS reason
        |FROM (
        |  SELECT event_id, user_id, ts, entry,
        |         (next_ts IS NOT NULL AND next_ts < ts + INTERVAL 10 SECOND) AS gap_ok,
        |         next_entry
        |  FROM (
        |    SELECT event_id, user_id, ts, event_type = 'view' AS entry,
        |           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
        |           LEAD(event_type = 'view') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_entry
        |    FROM events))
        |WHERE entry AND ((gap_ok AND next_entry) OR NOT gap_ok)
        |ORDER BY event_id""".stripMargin,
    "a17_union_stats" ->
      s"""SELECT event_id, is_new, CAST(uv_ct AS BIGINT) AS uv_ct,
         |       CAST(pv_ct AS BIGINT) AS pv_ct, CAST(sv_ct AS BIGINT) AS sv_ct,
         |       CAST(uj_ct AS BIGINT) AS uj_ct, CAST(dur_sum AS DOUBLE) AS dur_sum
         |FROM ($measureRowsSql)
         |ORDER BY event_id, uv_ct""".stripMargin,
    "a20_tumble_visitor" ->
      s"""SELECT strftime(time_bucket(INTERVAL '10 seconds', ts), '%Y-%m-%d %H:%M:%S') AS stt,
         |       strftime(time_bucket(INTERVAL '10 seconds', ts) + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
         |       is_new,
         |       CAST(SUM(uv_ct) AS BIGINT) AS uv_ct, CAST(SUM(pv_ct) AS BIGINT) AS pv_ct,
         |       CAST(SUM(sv_ct) AS BIGINT) AS sv_ct, CAST(SUM(uj_ct) AS BIGINT) AS uj_ct,
         |       CAST(SUM(dur_sum) AS DOUBLE) AS dur_sum
         |FROM ($measureRowsSql)
         |GROUP BY time_bucket(INTERVAL '10 seconds', ts), is_new
         |ORDER BY stt, is_new""".stripMargin,
    "a20c_sliding_visitor" ->
      s"""SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS stt,
         |       strftime(wstart + INTERVAL 20 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
         |       is_new,
         |       CAST(SUM(uv_ct) AS BIGINT) AS uv_ct, CAST(SUM(pv_ct) AS BIGINT) AS pv_ct,
         |       CAST(SUM(sv_ct) AS BIGINT) AS sv_ct, CAST(SUM(uj_ct) AS BIGINT) AS uj_ct,
         |       CAST(SUM(dur_sum) AS DOUBLE) AS dur_sum
         |FROM (
         |  SELECT m.*, time_bucket(INTERVAL '10 seconds', ts) - k * (INTERVAL 10 SECOND) AS wstart
         |  FROM ($measureRowsSql) m CROSS JOIN (SELECT unnest([0, 1]) AS k))
         |GROUP BY wstart, is_new
         |ORDER BY stt, is_new""".stripMargin,
    "a21_product_stats" ->
      """SELECT strftime(time_bucket(INTERVAL '10 seconds', ts), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(time_bucket(INTERVAL '10 seconds', ts) + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS sku_id,
        |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
        |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS display_ct,
        |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS favor_ct,
        |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS refund_ct,
        |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS order_amount,
        |       CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS order_ct
        |FROM events
        |GROUP BY time_bucket(INTERVAL '10 seconds', ts), 3
        |ORDER BY stt, sku_id""".stripMargin,
    "a23b_province_sql" ->
      """SELECT strftime(time_bucket(INTERVAL '10 seconds', o_orderdate), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(time_bucket(INTERVAL '10 seconds', o_orderdate) + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
        |       n_nationkey AS province_id, n_name AS province_name,
        |       COUNT(DISTINCT o_orderkey) AS order_count,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS order_amount
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY time_bucket(INTERVAL '10 seconds', o_orderdate), 3, 4
        |ORDER BY stt, province_id""".stripMargin,
    "a23_province_window" ->
      """SELECT strftime(time_bucket(INTERVAL '10 seconds', o_orderdate), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(time_bucket(INTERVAL '10 seconds', o_orderdate) + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
        |       n_nationkey AS province_id, n_name AS province_name,
        |       COUNT(DISTINCT o_orderkey) AS order_count,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS order_amount
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY time_bucket(INTERVAL '10 seconds', o_orderdate), 3, 4
        |ORDER BY stt, province_id""".stripMargin,
    "a25_keyword_window" ->
      """SELECT strftime(time_bucket(INTERVAL '10 seconds', ts), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(time_bucket(INTERVAL '10 seconds', ts) + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
        |       keyword, COUNT(*) AS ct
        |FROM (
        |  SELECT ts, UNNEST(string_split(
        |    event_type || ' k' || json_extract_string(props, '$.k'), ' ')) AS keyword
        |  FROM events
        |  WHERE event_type = 'view' AND json_extract_string(props, '$.k') IS NOT NULL)
        |GROUP BY time_bucket(INTERVAL '10 seconds', ts), keyword
        |ORDER BY stt, keyword""".stripMargin)
}
