package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** b13 PageRank on a hand graph: the three damped integer power
  * iterations are replayed by hand below, so the expected scores are
  * exact BIGINTs, not approximations — any change to the edge
  * extraction, the truncating division, or the damping constants
  * breaks this suite loudly.
  *
  * Fixture graph (from per-user page sequences):
  *   1→2 wt 2, 1→3 wt 1, 2→1 wt 1; page 3 dangling.
  */
class PagerankSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long, Long)]) =
    rows.map { case (u, ts, id, page) => (u, ts, id, s"""{"k": $page}""") }
      .toDF("user_id", "ts", "event_id", "props")
      .withColumn("ts", col("ts").cast(TimestampType))

  test("three integer iterations on the hand graph, replayed exactly") {
    val events = ev(Seq(
      (1L, "2024-01-01 00:00:01", 1L, 1L), // user 1: 1 → 2
      (1L, "2024-01-01 00:00:02", 2L, 2L),
      (2L, "2024-01-01 00:00:01", 3L, 1L), // user 2: 1 → 2
      (2L, "2024-01-01 00:00:02", 4L, 2L),
      (3L, "2024-01-01 00:00:01", 5L, 1L), // user 3: 1 → 3
      (3L, "2024-01-01 00:00:02", 6L, 3L),
      (4L, "2024-01-01 00:00:01", 7L, 2L), // user 4: 2 → 1
      (4L, "2024-01-01 00:00:02", 8L, 1L)))
    // edges 1→2 wt2, 1→3 wt1, 2→1 wt1; ow(1)=3, ow(2)=1
    // r0 = 1000000 everywhere
    // i1: c(2)=2000000 div 3=666666, c(3)=333333, c(1)=1000000
    //     r1: 1→1000000, 2→716666, 3→433333
    // i2: c(2)=666666, c(3)=333333, c(1)=716666
    //     r2: 1→759166, 2→716666, 3→433333
    // i3: c(2)=1518332 div 3=506110, c(3)=253055, c(1)=716666
    //     r3: 1→759166, 2→580193, 3→365096
    val got = AdsQueries.pagerank(events)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 759166L), (2L, 580193L), (3L, 365096L)))
  }

  test("self-transitions and non-numeric props rows are dropped") {
    val events = Seq(
      (1L, "2024-01-01 00:00:01", 1L, """{"k": 7}"""),
      (1L, "2024-01-01 00:00:02", 2L, """{"k": 7}"""), // self loop 7→7
      (1L, "2024-01-01 00:00:03", 3L, """not json"""), // dropped row
      (1L, "2024-01-01 00:00:04", 4L, """{"k": 9}"""))
      .toDF("user_id", "ts", "event_id", "props")
      .withColumn("ts", col("ts").cast(TimestampType))
    val got = AdsQueries.pagerank(events).as[(Long, Long)].collect().toMap
    // graph: single edge 7→9 (the malformed row vanishes BEFORE
    // pairing, so 7→9 are adjacent; the 7→7 self loop is excluded)
    assert(got.keySet === Set(7L, 9L))
    // 7 has no in-links: every iteration leaves it at the teleport
    // base. 9's score settles at base + damped base from round 2 on.
    assert(got(7L) === 150000L)
    assert(got(9L) === 150000L + 85L * 150000L / 100L)
  }

  test("b14 next-page: ML probabilities, top-K per src, wt/dst order") {
    val events = ev(Seq(
      (1L, "2024-01-01 00:00:01", 1L, 1L), // 1→2
      (1L, "2024-01-01 00:00:02", 2L, 2L),
      (2L, "2024-01-01 00:00:01", 3L, 1L), // 1→2
      (2L, "2024-01-01 00:00:02", 4L, 2L),
      (3L, "2024-01-01 00:00:01", 5L, 1L), // 1→3
      (3L, "2024-01-01 00:00:02", 6L, 3L),
      (4L, "2024-01-01 00:00:01", 7L, 1L), // 1→4
      (4L, "2024-01-01 00:00:02", 8L, 4L),
      (5L, "2024-01-01 00:00:01", 9L, 1L), // 1→5: 4th successor,
      (5L, "2024-01-01 00:00:02", 10L, 5L))) // cut by NEXT_K = 3
    val got = AdsQueries.nextPage(events)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // src 1 has successors 2(wt2), 3(wt1), 4(wt1), 5(wt1): top-3 by
    // (wt desc, dst) keeps 2, 3, 4 with p = 2/5, 1/5, 1/5.
    assert(got === Seq(
      (1L, 1L, 2L, 2L, 0.4), (1L, 2L, 3L, 1L, 0.2), (1L, 3L, 4L, 1L, 0.2)))
  }

  test("b15 path mining counts raw consecutive triples, top-K ordered") {
    val events = ev(Seq(
      (1L, "2024-01-01 00:00:01", 1L, 1L), // u1 walks 1,2,3,2,3
      (1L, "2024-01-01 00:00:02", 2L, 2L),
      (1L, "2024-01-01 00:00:03", 3L, 3L),
      (1L, "2024-01-01 00:00:04", 4L, 2L),
      (1L, "2024-01-01 00:00:05", 5L, 3L),
      (2L, "2024-01-01 00:00:01", 6L, 1L), // u2 walks 1,2,3
      (2L, "2024-01-01 00:00:02", 7L, 2L),
      (2L, "2024-01-01 00:00:03", 8L, 3L),
      (3L, "2024-01-01 00:00:01", 9L, 7L), // u3: too short for a triple
      (3L, "2024-01-01 00:00:02", 10L, 8L)))
    val got = AdsQueries.topPaths(events)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // u1 triples: (1,2,3), (2,3,2), (3,2,3); u2: (1,2,3)
    assert(got === Seq(
      (1L, 2L, 3L, 2L), (2L, 3L, 2L, 1L), (3L, 2L, 3L, 1L)))
  }

  test("a page with no in-links converges to the teleport base") {
    val events = ev(Seq(
      (1L, "2024-01-01 00:00:01", 1L, 5L),
      (1L, "2024-01-01 00:00:02", 2L, 6L)))
    val got = AdsQueries.pagerank(events).as[(Long, Long)].collect().toMap
    assert(got(5L) === 150000L)
    assert(got(6L) === 150000L + 85L * 150000L / 100L) // 277500
  }
}
