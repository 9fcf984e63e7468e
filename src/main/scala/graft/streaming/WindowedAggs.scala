package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A19-A21 in streaming form: watermark → 10s tumbling event-time
  * window → additive aggregation → stt/edt finisher. The Column
  * expressions are the same ones the batch twins use
  * (operators.DwsWindows) — batch/stream duality per SURVEY.md §7.1.
  *
  * Streaming caveats encoded here:
  *  - COUNT(DISTINCT) is unsupported in streaming aggs; the exact
  *    distinct uses collect_set size, mirroring the reference's
  *    HashSet-in-reduce-state (ProductStats.java:62-69).
  *  - Output mode Append: a window emits once its watermark passes
  *    window.end — the reference's on-window-close firing.
  */
object WindowedAggs {

  private val dec2 = DecimalType(12, 2)
  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** VisitorStats: measures one-hot by event kind, keyed by is_new,
    * 10s tumble. `events` must carry ts/user_id/event_type/value;
    * call .withWatermark("ts", delay) upstream for streaming input
    * (the reference uses 1s, VisitorStatsApp.java:142). */
  def visitorStats(events: DataFrame): DataFrame =
    visitorStatsBy(events, window(col("ts"), "10 seconds"))

  /** VisitorStats in the SLIDING (hopping) shape — 20s windows every
    * 10s, each event counted in two windows; identical Append/
    * watermark semantics (a window emits when the watermark passes
    * its own end, so overlapping windows close in slide order).
    * Batch twin: operators.DwsWindows.a20cSlidingVisitor's window
    * spec. */
  def visitorStatsSliding(events: DataFrame): DataFrame =
    visitorStatsBy(events, window(col("ts"), "20 seconds", "10 seconds"))

  /** Shared measure/finisher body — tumbling and sliding differ only
    * in the window spec, and must never diverge on the measures. */
  private def visitorStatsBy(events: DataFrame,
      win: org.apache.spark.sql.Column): DataFrame =
    events
      .withColumn("is_new", (col("user_id") % 2).cast(StringType))
      .groupBy(win, col("is_new"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("pv_ct"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("sv_ct"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("uj_ct"),
        sum(when(col("event_type") === "view", col("value").cast(dec2)))
          .cast(DoubleType).as("dur_sum"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("is_new"), col("pv_ct"), col("sv_ct"), col("uj_ct"), col("dur_sum"))

  /** ProductStats: one-hot measures + exact distinct buyers per
    * (window, sku) via collect_set — streaming-legal exact distinct. */
  def productStats(events: DataFrame): DataFrame =
    events
      .withColumn("sku_id", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(window(col("ts"), "10 seconds"), col("sku_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click_ct"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("display_ct"),
        sum(when(col("event_type") === "purchase", col("value").cast(dec2)))
          .cast(DoubleType).as("order_amount"),
        size(collect_set(when(col("event_type") === "purchase", col("user_id"))))
          .cast(LongType).as("order_ct"))
      .select(
        fmt(col("window.start")).as("stt"), fmt(col("window.end")).as("edt"),
        col("sku_id"), col("click_ct"), col("display_ct"),
        col("order_amount"), col("order_ct"))
}
