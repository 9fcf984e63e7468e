package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** b10/b11 semantics on hand fixtures: the funnel's strict event-time
  * sequencing (a click only counts after a view, a purchase only
  * after a qualifying click) and the retention matrix's
  * first-day-cohort bookkeeping (same-day dedup, 7-day offset cap).
  */
class FunnelRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast(TimestampType))

  test("funnel counts steps only in strict (ts, event_id) order") {
    val events = ev(Seq(
      // user 1: clean view → click → purchase: completes all steps
      (1L, "2024-01-01 00:00:01", 1L, "view"),
      (1L, "2024-01-01 00:00:02", 2L, "click"),
      (1L, "2024-01-01 00:00:03", 3L, "purchase"),
      // user 2: click BEFORE any view → click and purchase don't count
      (2L, "2024-01-01 00:01:00", 4L, "click"),
      (2L, "2024-01-01 00:02:00", 5L, "view"),
      (2L, "2024-01-01 00:03:00", 6L, "purchase"),
      // user 3: no click at all → purchase doesn't count
      (3L, "2024-01-01 00:01:00", 7L, "view"),
      (3L, "2024-01-01 00:02:00", 8L, "purchase"),
      // user 4: purchase precedes the qualifying click → step 3 missed
      (4L, "2024-01-01 00:01:00", 9L, "purchase"),
      (4L, "2024-01-01 00:02:00", 10L, "view"),
      (4L, "2024-01-01 00:03:00", 11L, "click"),
      // user 5: never views → contributes to no step
      (5L, "2024-01-01 00:01:00", 12L, "signup"),
      // user 6: click and purchase share a timestamp — event_id breaks
      // the tie, so the purchase still sees the click as prior
      (6L, "2024-01-01 00:01:00", 13L, "view"),
      (6L, "2024-01-01 00:02:00", 14L, "click"),
      (6L, "2024-01-01 00:02:00", 15L, "purchase")))
    val got = AdsQueries.funnel(events)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, "view", 5L, 1.0),
      (2L, "click", 3L, 0.6),
      (3L, "purchase", 2L, 0.4)))
  }

  test("retention dedups same-day activity and caps the offset at 7") {
    val events = ev(Seq(
      (1L, "2024-01-01 09:00:00", 1L, "view"),
      (1L, "2024-01-02 09:00:00", 2L, "view"),
      (1L, "2024-01-09 09:00:00", 3L, "view"), // offset 8 → dropped
      (2L, "2024-01-01 10:00:00", 4L, "click"),
      (2L, "2024-01-03 10:00:00", 5L, "click"),
      (3L, "2024-01-02 11:00:00", 6L, "view"),
      (3L, "2024-01-02 12:00:00", 7L, "click"), // same day: one visit
      (3L, "2024-01-04 11:00:00", 8L, "view")))
    val got = AdsQueries.retention(events)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 0.5),
      ("2024-01-01", 2L, 1L, 0.5),
      ("2024-01-02", 0L, 1L, 1.0),
      ("2024-01-02", 2L, 1L, 1.0)))
  }
}
