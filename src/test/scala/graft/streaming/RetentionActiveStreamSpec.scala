package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset

/** b10/b12's streaming twins: O(1)-state per-user emitters whose
  * grouped counts equal the batch retention matrix and DAU/WAU
  * curves — hand fixtures for the state-machine edges (offset caps,
  * gaps, same-day dedup, micro-batch splits) plus drained parity on
  * real data.
  */
class RetentionActiveStreamSpec extends SparkSpec with StreamRunner {
  import Fixtures._
  import spark.implicits._

  private val day = 86400L

  // u1: days 0,1,9 (offset 9 > 7 ignored for retention; disjoint WAU
  // windows). u2: day 2 twice (same-day dedup). u3: days 3,4
  // (adjacent windows overlap 6 days).
  private val activityEvents = Seq(
    ev(10, 10, 1, "view"), ev(11, 20, 1, "click"),
    ev(12, day + 10, 1, "view"),
    ev(13, 9 * day + 10, 1, "view"),
    ev(20, 2 * day + 10, 2, "view"), ev(21, 2 * day + 20, 2, "view"),
    ev(30, 3 * day + 10, 3, "view"), ev(31, 4 * day + 10, 3, "view"))

  private def d(epochDayFrom20240101: Long): String =
    java.time.LocalDate.of(2024, 1, 1).plusDays(epochDayFrom20240101).toString

  test("retention: cohort fixes on first day, offsets cap at 7, duplicates collapse") {
    val got = StatefulOps.retentionHits(spark, spark.createDataset(activityEvents))
      .collect().map(h => (h.user_id, h.cohort_day, h.day_offset)).toSet
    assert(got === Set(
      (1L, d(0), 0L), (1L, d(0), 1L), // day 9 → offset 9 dropped
      (2L, d(2), 0L),
      (3L, d(3), 0L), (3L, d(3), 1L)))
  }

  test("rolling actives: windows merge, gaps stay disjoint, same-day dedups") {
    val got = StatefulOps.activityHits(spark, spark.createDataset(activityEvents))
      .collect().map(h => (h.user_id, h.day, h.kind)).toSeq
    assert(got.size === got.distinct.size) // every emission unique
    val u1w = got.filter(h => h._1 == 1L && h._3 == "wau").map(_._2).toSet
    // day 0 → 0..6, day 1 adds 7, day 9 → 9..15 (disjoint window)
    assert(u1w === ((0L to 7L) ++ (9L to 15L)).map(d).toSet)
    val u2 = got.filter(_._1 == 2L)
    assert(u2.count(_._3 == "dau") === 1) // same-day dedup
    val u3w = got.filter(h => h._1 == 3L && h._3 == "wau").map(_._2).toSet
    assert(u3w === (3L to 10L).map(d).toSet) // adjacent windows merge
  }

  test("micro-batch splits preserve state across the boundary") {
    val sorted = activityEvents.sortBy(_.ts.getTime)
    val (b1, b2) = sorted.splitAt(4)
    val whole = StatefulOps.retentionHits(spark, spark.createDataset(activityEvents))
      .collect().map(h => (h.user_id, h.cohort_day, h.day_offset)).toSet
    val split = runStream(Seq(b1, b2)) { ds: Dataset[EventRow] =>
      StatefulOps.retentionHits(spark, ds)
    }.map(h => (h.user_id, h.cohort_day, h.day_offset))
    assert(split.toSet === whole)
    assert(split.size === split.distinct.size)
    val wholeAct = StatefulOps.activityHits(spark, spark.createDataset(activityEvents))
      .collect().map(h => (h.user_id, h.day, h.kind)).toSet
    val splitAct = runStream(Seq(b1, b2)) { ds: Dataset[EventRow] =>
      StatefulOps.activityHits(spark, ds)
    }.map(h => (h.user_id, h.day, h.kind))
    assert(splitAct.toSet === wholeAct)
    assert(splitAct.size === splitAct.distinct.size)
  }

  test("retention counts match b10 on real data") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).as[EventRow]
    val streamed = StatefulOps.retentionHits(spark, ev)
      .groupByKey(h => (h.cohort_day, h.day_offset)).count().collect().toMap
    val batch = graft.operators.AdsQueries.b10Retention(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("DAU/WAU counts match b12 on real data (realized days)") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).as[EventRow]
    val hits = StatefulOps.activityHits(spark, ev).collect()
    val dau = hits.filter(_.kind == "dau").groupBy(_.day).view.mapValues(_.length.toLong).toMap
    val wau = hits.filter(_.kind == "wau").groupBy(_.day).view.mapValues(_.length.toLong).toMap
    val batch = graft.operators.AdsQueries.b12RollingActive(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(batch.nonEmpty)
    // every realized day agrees on both counters; future (unrealized)
    // window days exist only on the streaming side by design
    assert(batch.keySet === dau.keySet)
    batch.foreach { case (day, (bDau, bWau)) =>
      assert(dau(day) === bDau, s"dau $day")
      assert(wau(day) === bWau, s"wau $day")
    }
  }
}
