package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset

/** b11's streaming twin: the per-user funnel state machine emits each
  * step exactly once, honors strict ordering, survives micro-batch
  * splits, and its per-step user counts agree with the batch window
  * form over real data.
  */
class FunnelStreamSpec extends SparkSpec with StreamRunner {
  import Fixtures._
  import spark.implicits._

  // u1 completes everything; u2's click precedes its view (step 2
  // never fires, so neither does step 3); u3 purchases without a
  // click; u4 repeats views/clicks (each step emitted once).
  private val funnelEvents = Seq(
    ev(10, 0, 1, "view"), ev(11, 5, 1, "click"), ev(12, 9, 1, "purchase"),
    ev(20, 0, 2, "click"), ev(21, 5, 2, "view"), ev(22, 9, 2, "purchase"),
    ev(30, 0, 3, "view"), ev(31, 5, 3, "purchase"),
    ev(40, 0, 4, "view"), ev(41, 2, 4, "view"), ev(42, 4, 4, "click"),
    ev(43, 6, 4, "click"), ev(44, 8, 4, "purchase"), ev(45, 9, 4, "purchase"))

  private val expected = Set(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L),
    (3L, 1L),
    (4L, 1L), (4L, 2L), (4L, 3L))

  test("funnel: batch execution emits each first completion once") {
    val got = StatefulOps.funnelSteps(spark, spark.createDataset(funnelEvents))
      .collect().map(s => (s.user_id, s.step)).toSeq
    assert(got.size === expected.size) // no duplicate emissions
    assert(got.toSet === expected)
  }

  test("funnel: split delivery across micro-batches preserves progression") {
    val (b1, b2) = funnelEvents.sortBy(_.ts.getTime).splitAt(7)
    val got = runStream(Seq(b1, b2)) { ds: Dataset[EventRow] =>
      StatefulOps.funnelSteps(spark, ds)
    }
    assert(got.map(s => (s.user_id, s.step)).toSet === expected)
    assert(got.size === expected.size)
  }

  test("funnel: per-step user counts match the batch window form on real data") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).as[EventRow]
    val streamCounts = StatefulOps.funnelSteps(spark, ev)
      .groupByKey(_.step).count().collect().toMap
    val batchTwin = graft.operators.AdsQueries.b11Funnel(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(batchTwin.keySet === Set(1L, 2L, 3L))
    batchTwin.foreach { case (step, users) =>
      assert(streamCounts.getOrElse(step, 0L) === users, s"step $step")
    }
  }
}
