package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DWD-layer operators (SURVEY.md §2 A5-A12) as batch twins over the
  * `events`/`documents` tables — the DuckDB-checkable batch semantics.
  */
object DwdOps extends QueryModule {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** A5 JSON parse: dynamic JSON column → typed fields + derived
    * date/hour columns (BaseLogApp.java:48, OrderWideApp.java:73-93). */
  def a05JsonParse(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        date_format(col("ts"), "yyyy-MM-dd").as("create_date"),
        date_format(col("ts"), "HH").as("create_hour"))
      .orderBy(col("event_id"))

  /** A6 parse with dirty side-channel: unparseable JSON is counted per
    * group instead of silently dropped (UniqueVisitApp.java:47-59).
    * from_json yields NULL on bad input → the dirty predicate. */
  def a06DirtySplit(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("parsed", from_json(col("props"), propsSchema))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("total_ct"),
        sum(when(col("parsed").isNull, 1L).otherwise(0L)).as("dirty_ct"),
        sum(when(col("parsed").isNotNull, 1L).otherwise(0L)).as("clean_ct"))
      .orderBy(col("event_type"))

  /** A7 stateless filter (BaseDBApp.java:54-62): predicate pushed to
    * the parquet scan by Catalyst. */
  def a07Filter(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("value") > 50.0 && col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** A8 keyBy → hash aggregation (BaseLogApp.java:53 etc.): the shuffle
    * is implicit in groupBy; map-side partial aggregation is free. */
  def a08KeyedAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("event_ct"),
        countDistinct(col("event_type")).as("type_ct"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("value_sum"))
      .orderBy(col("user_id"))

  /** A9 new/old-visitor repair (BaseLogApp.java:56-90): a claimed
    * is_new=1 is rewritten to 0 unless the event falls on the mid's
    * first-seen date. Batch twin of the ValueState logic: min(date)
    * OVER (PARTITION BY user). */
  def a09IsNewRepair(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("first_dt", min(col("dt")).over(w))
      .select(
        col("event_id"), col("user_id"), col("dt"),
        when(col("dt") === col("first_dt"), "1").otherwise("0").as("is_new"))
      .orderBy(col("event_id"))
  }

  /** A10 daily-unique-visit filter (UniqueVisitApp.java:67-106): keep
    * only the first qualifying page-view per user per day. The 1-day
    * state TTL of the reference is exactly the (user, day) partition. */
  def a10DailyFirstVisit(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("dt"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("event_type") === "view")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("dt"))
      .orderBy(col("event_id"))
  }

  /** A11 broadcast-config dynamic routing (TableProcessFunction.java:
    * 24-170): a small config table decides, per record kind, the sink
    * type, target table and column projection. Config joins broadcast;
    * unmatched kinds are dropped (reference logs & drops, :150-153). */
  def a11DynamicRoute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val config = Seq(
      // (source_kind, sink_type, sink_table, keep_value, keep_user)
      ("click", "kafka", "dwd_click", true, true),
      ("view", "kafka", "dwd_page", true, false),
      ("purchase", "clickhouse", "dws_purchase", true, true),
      ("signup", "hbase", "dim_user", false, true)
    ).toDF("source_kind", "sink_type", "sink_table", "keep_value", "keep_user")
    val ev = Tables.events(s, d)
    ev.join(broadcast(config), ev("event_type") === config("source_kind"))
      .select(
        col("event_id"), col("event_type"), col("sink_type"), col("sink_table"),
        when(col("keep_value"), col("value")).as("value"),
        when(col("keep_user"), col("user_id")).as("user_id"))
      .orderBy(col("event_id"))
  }

  /** A12 multi-way split + array fan-out (BaseLogApp.java:95-134): the
    * displays[] UNNEST with parent key attached ⇒ posexplode of the
    * token array with doc_id carried along. */
  def a12ExplodePos(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), "\\s+")))
      .withColumnRenamed("col", "keyword")
      .filter(col("keyword") =!= "")
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("keyword"))
      .orderBy(col("doc_id"), col("pos"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a05_json_parse" -> a05JsonParse,
    "a06_dirty_split" -> a06DirtySplit,
    "a07_filter" -> a07Filter,
    "a08_keyed_agg" -> a08KeyedAgg,
    "a09_is_new_repair" -> a09IsNewRepair,
    "a10_daily_first_visit" -> a10DailyFirstVisit,
    "a11_dynamic_route" -> a11DynamicRoute,
    "a12_explode_pos" -> a12ExplodePos)

  override val oracle: Map[String, String] = Map(
    "a05_json_parse" ->
      """SELECT event_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       strftime(ts, '%Y-%m-%d') AS create_date,
        |       strftime(ts, '%H') AS create_hour
        |FROM events ORDER BY event_id""".stripMargin,
    "a06_dirty_split" ->
      """SELECT event_type, COUNT(*) AS total_ct,
        |       CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT) AS dirty_ct,
        |       CAST(SUM(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) AS clean_ct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a07_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE value > 50.0 AND event_type <> 'error' ORDER BY event_id""".stripMargin,
    "a08_keyed_agg" ->
      """SELECT user_id, COUNT(*) AS event_ct,
        |       COUNT(DISTINCT event_type) AS type_ct,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a09_is_new_repair" ->
      """SELECT event_id, user_id, dt,
        |       CASE WHEN dt = MIN(dt) OVER (PARTITION BY user_id) THEN '1' ELSE '0' END AS is_new
        |FROM (SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS dt FROM events)
        |ORDER BY event_id""".stripMargin,
    "a10_daily_first_visit" ->
      """SELECT event_id, user_id, dt FROM (
        |  SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS dt,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type = 'view'
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "a11_dynamic_route" ->
      """SELECT event_id, event_type, sink_type, sink_table,
        |       CASE WHEN keep_value THEN value END AS value,
        |       CASE WHEN keep_user THEN user_id END AS user_id
        |FROM events JOIN (
        |  VALUES ('click','kafka','dwd_click',true,true),
        |         ('view','kafka','dwd_page',true,false),
        |         ('purchase','clickhouse','dws_purchase',true,true),
        |         ('signup','hbase','dim_user',false,true)
        |) AS cfg(source_kind, sink_type, sink_table, keep_value, keep_user)
        |  ON event_type = source_kind
        |ORDER BY event_id""".stripMargin,
    "a12_explode_pos" ->
      """SELECT doc_id, pos, keyword FROM (
        |  SELECT doc_id,
        |         UNNEST(range(0, len(regexp_split_to_array(text, '\s+')))) AS pos,
        |         UNNEST(regexp_split_to_array(text, '\s+')) AS keyword
        |  FROM documents
        |) WHERE keyword <> '' ORDER BY doc_id, pos""".stripMargin)
}
