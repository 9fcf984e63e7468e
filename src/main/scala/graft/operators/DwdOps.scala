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

  /** The routing-config table (TableProcess bean, TableProcess.java:
    * 11-30): sink target + a sinkColumns projection list per source
    * kind. In production this arrives as a CDC stream / catalog table;
    * the content here is the fixture. Exposed so tests can exercise
    * the DDL side-effect (ensureSinkTables) against the same config. */
  def routingConfig(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("click", "kafka", "dwd_click", "event_id,user_id,value", "event_id"),
      ("view", "kafka", "dwd_page", "event_id,value", "event_id"),
      ("purchase", "clickhouse", "dws_purchase", "event_id,user_id,value", "event_id"),
      ("signup", "hbase", "dim_user", "event_id,user_id", "user_id")
    ).toDF("source_kind", "sink_type", "sink_table", "sink_columns", "sink_pk")
  }

  /** DDL side-effect of new routing config (TableProcessFunction
    * .checkTable, :79-126) over the fixture config; the generic form
    * (config passed in, used by the streaming routing job) lives in
    * graft.streaming.ConfigRouting. */
  def ensureSinkTables(s: SparkSession): Unit =
    graft.streaming.ConfigRouting.ensureSinkTables(s, routingConfig(s))

  /** A11 broadcast-config dynamic routing (TableProcessFunction.java:
    * 24-170): the config table decides, per record kind, the sink
    * type, target table, and — via its sinkColumns list — the column
    * projection (filterColumn, :157-170). A column survives iff its
    * name appears in the matched config row's sink_columns; unmatched
    * kinds are dropped (reference logs & drops, :150-153). The
    * streaming form — config re-read and re-broadcast per micro-batch
    * — is graft.streaming.ConfigRouting.routedJob over the same
    * routing core. */
  def a11DynamicRoute(s: SparkSession, d: String): DataFrame =
    graft.streaming.ConfigRouting.route(
      Tables.events(s, d), routingConfig(s), "event_type",
      passCols = Seq("event_id", "event_type"),
      candidateCols = Seq("value", "user_id"))
      .orderBy(col("event_id"))

  /** A4 CDC envelope parse (BaseDBApp.java:52-62, custom deserializer
    * :67-112): the Maxwell/Debezium {database, table, type, ts, data}
    * JSON envelope → typed fields, keeping inserts/updates. The
    * envelope string is constructed portably (pure string concat of
    * integer/string columns) so both engines parse byte-identical
    * JSON; in production the same from_json runs on the Kafka value
    * column (graft.streaming.Sources.cdcSchema). */
  def a04CdcEnvelope(s: SparkSession, d: String): DataFrame = {
    val envSchema = StructType(Seq(
      StructField("database", StringType),
      StructField("table", StringType),
      StructField("type", StringType),
      StructField("ts", LongType),
      StructField("data", StructType(Seq(
        StructField("id", LongType),
        StructField("cust", LongType),
        StructField("status", StringType))))))
    Tables.orders(s, d)
      .withColumn("env", expr(
        """concat('{"database":"gmall","table":"orders","type":"',
          |  CASE WHEN o_orderkey % 10 = 0 THEN 'update'
          |       WHEN o_orderkey % 10 = 1 THEN 'delete'
          |       ELSE 'insert' END,
          |  '","ts":', CAST(o_orderkey AS STRING),
          |  ',"data":{"id":', CAST(o_orderkey AS STRING),
          |  ',"cust":', CAST(o_custkey AS STRING),
          |  ',"status":"', o_orderstatus, '"}}')""".stripMargin))
      .select(from_json(col("env"), envSchema).as("j"))
      .filter(col("j.type") =!= "delete")
      .select(
        col("j.database").as("database"), col("j.table").as("tbl"),
        col("j.type").as("op"), col("j.ts").as("ts"),
        col("j.data.id").as("id"), col("j.data.cust").as("cust"),
        col("j.data.status").as("status"))
      .orderBy(col("id"))
  }

  /** A12 (full form) 3-way log split + displays[] fan-out with the
    * parent page_id attached (BaseLogApp.java:95-134): start records
    * to one stream, page records to another, and each display element
    * fanned out carrying its parent page's key and position. The
    * display cardinality per page derives deterministically from the
    * event id (the corpus has no nested array column). */
  def a12LogSplit(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
    val start = e.filter(col("event_type") === "signup").select(
      col("event_id"), lit("start").as("stream"),
      lit(null).cast(LongType).as("page_id"),
      lit(null).cast(StringType).as("item"),
      lit(null).cast(LongType).as("pos"))
    val page = e.filter(col("event_type") =!= "signup").select(
      col("event_id"), lit("page").as("stream"), col("k").as("page_id"),
      lit(null).cast(StringType).as("item"),
      lit(null).cast(LongType).as("pos"))
    val displays = e.filter(col("event_type") =!= "signup" && col("k").isNotNull)
      .select(col("event_id"), col("k"),
        explode(expr("sequence(1L, 1L + event_id % 3)")).as("pos"))
      .select(
        col("event_id"), lit("display").as("stream"), col("k").as("page_id"),
        expr("concat('item_', k, '_', pos)").as("item"), col("pos"))
    start.unionByName(page).unionByName(displays)
      .orderBy(col("event_id"), col("stream"), col("pos"))
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

  /** A24 — the dictionary tokenizer UDTF applied laterally
    * (KeywordStatsApp.java:58-59's LATERAL TABLE(ik_analyze(...))).
    * graft_tokenize is the native Generator registered by
    * graft.GraftExtensions (graft.functions.DictTokenize). */
  def a24Tokenize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0) // LATERAL over a filtered slice, like the reference
      .selectExpr("doc_id", "graft_tokenize(text) AS (token, pos)")
      .select(col("doc_id"), col("pos"), col("token"))
      .orderBy(col("doc_id"), col("pos"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a04_cdc_envelope" -> a04CdcEnvelope,
    "a12_log_split" -> a12LogSplit,
    "a24_tokenize" -> a24Tokenize,
    "a05_json_parse" -> a05JsonParse,
    "a06_dirty_split" -> a06DirtySplit,
    "a07_filter" -> a07Filter,
    "a08_keyed_agg" -> a08KeyedAgg,
    "a09_is_new_repair" -> a09IsNewRepair,
    "a10_daily_first_visit" -> a10DailyFirstVisit,
    "a11_dynamic_route" -> a11DynamicRoute,
    "a12_explode_pos" -> a12ExplodePos)

  override val oracle: Map[String, String] = Map(
    // Twin of the greedy dictionary merge: with phrase heads/tails
    // disjoint (DictTokenize.phrases invariant), greedy == pairwise:
    // a token merges with its successor iff the pair is a phrase, and
    // a token is consumed iff it closed the previous pair.
    "a24_tokenize" ->
      """WITH toks AS (
        |  SELECT doc_id, pos, tok,
        |         lag(tok) OVER w AS prev, lead(tok) OVER w AS next
        |  FROM (
        |    SELECT doc_id,
        |           unnest(range(0, len(string_split_regex(text, '\s+')))) AS pos,
        |           unnest(string_split_regex(text, '\s+')) AS tok
        |    FROM documents WHERE doc_id % 10 = 0)
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |emitted AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN (tok, next) IN (('hash','join'), ('table','scan'), ('group','value'))
        |              THEN tok || '_' || next ELSE tok END AS token
        |  FROM toks
        |  WHERE tok <> ''
        |    AND NOT (prev, tok) IN (('hash','join'), ('table','scan'), ('group','value')))
        |SELECT doc_id,
        |       row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS pos,
        |       token
        |FROM emitted ORDER BY doc_id, pos""".stripMargin,
    "a04_cdc_envelope" ->
      """SELECT json_extract_string(env, '$.database') AS database,
        |       json_extract_string(env, '$.table') AS tbl,
        |       json_extract_string(env, '$.type') AS op,
        |       CAST(json_extract(env, '$.ts') AS BIGINT) AS ts,
        |       CAST(json_extract(env, '$.data.id') AS BIGINT) AS id,
        |       CAST(json_extract(env, '$.data.cust') AS BIGINT) AS cust,
        |       json_extract_string(env, '$.data.status') AS status
        |FROM (
        |  SELECT '{"database":"gmall","table":"orders","type":"' ||
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'update'
        |         WHEN o_orderkey % 10 = 1 THEN 'delete'
        |         ELSE 'insert' END ||
        |    '","ts":' || CAST(o_orderkey AS VARCHAR) ||
        |    ',"data":{"id":' || CAST(o_orderkey AS VARCHAR) ||
        |    ',"cust":' || CAST(o_custkey AS VARCHAR) ||
        |    ',"status":"' || o_orderstatus || '"}}' AS env
        |  FROM orders)
        |WHERE json_extract_string(env, '$.type') <> 'delete'
        |ORDER BY id""".stripMargin,
    "a12_log_split" ->
      """WITH ev AS (SELECT event_id, event_type,
        |              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |            FROM events)
        |SELECT event_id, 'start' AS stream, CAST(NULL AS BIGINT) AS page_id,
        |       CAST(NULL AS VARCHAR) AS item, CAST(NULL AS BIGINT) AS pos
        |FROM ev WHERE event_type = 'signup'
        |UNION ALL
        |SELECT event_id, 'page', k, NULL, NULL
        |FROM ev WHERE event_type <> 'signup'
        |UNION ALL
        |SELECT event_id, 'display', k, 'item_' || k || '_' || pos, pos
        |FROM (SELECT event_id, k, unnest(range(1, 2 + event_id % 3)) AS pos
        |      FROM ev WHERE event_type <> 'signup' AND k IS NOT NULL)
        |ORDER BY event_id, stream, pos""".stripMargin,
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
        |       CASE WHEN list_contains(string_split(sink_columns, ','), 'value') THEN value END AS value,
        |       CASE WHEN list_contains(string_split(sink_columns, ','), 'user_id') THEN user_id END AS user_id
        |FROM events JOIN (
        |  VALUES ('click','kafka','dwd_click','event_id,user_id,value','event_id'),
        |         ('view','kafka','dwd_page','event_id,value','event_id'),
        |         ('purchase','clickhouse','dws_purchase','event_id,user_id,value','event_id'),
        |         ('signup','hbase','dim_user','event_id,user_id','user_id')
        |) AS cfg(source_kind, sink_type, sink_table, sink_columns, sink_pk)
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
