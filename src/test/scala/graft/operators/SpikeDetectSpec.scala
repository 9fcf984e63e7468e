package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** b16 spike detection on hand hourly series: the cross-multiplied
  * integer 3σ inequality, the zero-variance edge, the cold start,
  * and the just-below-threshold boundary — all computed by hand.
  */
class SpikeDetectSpec extends SparkSpec {
  import spark.implicits._

  /** counts(i) events of type `typ` in hour i of 2024-01-01. */
  private def series(typ: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (typ, f"2024-01-01 $h%02d:${i % 60}%02d:00"))
    }

  private def run(rows: Seq[(String, String)]) =
    AdsQueries.spikeDetect(
      rows.toDF("event_type", "ts").withColumn("ts", col("ts").cast(TimestampType)))
      .select($"event_type", $"hr", $"x", $"n", $"spike")
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

  test("zero-variance history: any deviation spikes, equality does not") {
    // six flat hours of 10, then 40 (spike) — and a flat continuation
    val got = run(series("a", Seq(10, 10, 10, 10, 10, 10, 40)) ++
      series("b", Seq(10, 10, 10, 10, 10, 10, 10)))
    assert(got(("a", "2024-01-01 06:00")) === ((40L, 6L, true)))   // (6·40−60)² > 0
    // type b shares the hr key space — checked via its own run below
    val gotB = run(series("b", Seq(10, 10, 10, 10, 10, 10, 10)))
    assert(gotB(("b", "2024-01-01 06:00")) === ((10L, 6L, false))) // (0)² > 0 is false
  }

  test("3σ boundary on a varying window: 25 spikes, 13 does not") {
    // trailing window [8,12,10,9,11,10]: s1=60, s2=610, n·s2−s1²=60
    val base = Seq(8, 12, 10, 9, 11, 10)
    val spike = run(series("a", base :+ 25))
    assert(spike(("a", "2024-01-01 06:00")) === ((25L, 6L, true)))  // 8100 > 540
    val calm = run(series("a", base :+ 13))
    assert(calm(("a", "2024-01-01 06:00")) === ((13L, 6L, false))) // 324 > 540 false
  }

  test("cold start: fewer than 3 trailing buckets never flags") {
    val got = run(series("a", Seq(1, 1000, 1000)))
    assert(got(("a", "2024-01-01 00:00"))._3 === false) // n = 0
    assert(got(("a", "2024-01-01 01:00"))._3 === false) // n = 1
    assert(got(("a", "2024-01-01 02:00"))._3 === false) // n = 2
  }
}
