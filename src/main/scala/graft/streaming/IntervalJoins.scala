package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A14 — stream-stream interval joins (SURVEY.md §2 A14).
  *
  * Reference semantics: keyed inner join with an event-time range —
  * orders⋈details between(-5s,+5s) (OrderWideApp.java:96-105) and
  * payments⋈order-wides between(-15min,0) (PaymentWideApp.java:88-96).
  *
  * Spark's canonical form: both sides watermarked, equi-key plus a
  * time-range predicate. The watermark + range bound the join state
  * retention exactly like Flink's interval bounds — state for a key
  * is dropped once the other side's watermark passes its range, so
  * state is O(rate × interval), not O(history). The same expression
  * joins bounded DataFrames in batch (Catalyst plans equi-key as the
  * shuffle key, range as a post-filter).
  */
object IntervalJoins {

  /** Inner-join left and right on `key`, keeping right rows whose
    * event time lies in [left.ts + loSec, left.ts + hiSec] — the
    * reference's between(lo, hi). For streaming inputs, apply
    * withWatermark to BOTH sides before calling.
    *
    * Columns are disambiguated by alias; pass distinct column names
    * via the select projections in `leftCols`/`rightCols`. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      loSec: Long, hiSec: Long): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$leftKey") === col(s"r.$rightKey") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") + expr(s"INTERVAL $loSec SECONDS") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $hiSec SECONDS"))
  }

  /** OrderWide twin on the events stream: purchases enriched with the
    * clicks that led to them within the preceding 5 minutes —
    * the PaymentWideApp between(-15min, 0) shape. */
  def purchaseWithClicks(purchases: DataFrame, clicks: DataFrame): DataFrame =
    intervalJoin(
      purchases, clicks, "user_id", "user_id", "ts", "ts",
      loSec = -300, hiSec = 0)
      .select(
        col("l.event_id").as("purchase_id"), col("r.event_id").as("click_id"),
        col("l.user_id").as("user_id"), col("l.ts").as("purchase_ts"),
        col("r.ts").as("click_ts"), col("l.value").as("amount"))
}
