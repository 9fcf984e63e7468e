package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** b13/b14's streaming twin: the per-user last-page state machine
  * emits exactly the batch lag-window edges — across micro-batch
  * splits, dropping self-loops and malformed pages — and its
  * aggregated edge counts equal AdsQueries.pageEdges on real data.
  */
class TransitionStreamSpec extends SparkSpec with StreamRunner {
  import Fixtures._
  import spark.implicits._

  // ev() assigns page = event_id % 10; chosen ids make the paths:
  //   u1: pages 1 → 2 → 2 → 5 (the 2→2 self-loop is silent)
  //   u2: page 7 only (no edge)
  private val events = Seq(
    ev(1, 0, 1, "view"), ev(2, 5, 1, "view"),
    ev(12, 8, 1, "view"), ev(15, 9, 1, "view"),
    ev(7, 3, 2, "view"))

  private val expected = Set((1L, 1L, 2L), (1L, 2L, 5L))

  test("batch execution emits the lag-window edges, self-loops silent") {
    val got = StatefulOps.pageTransitions(spark, spark.createDataset(events))
      .collect().map(t => (t.user_id, t.src, t.dst)).toSeq
    assert(got.size === expected.size)
    assert(got.toSet === expected)
  }

  test("an edge spanning a micro-batch boundary is still emitted") {
    // split between ev(2) and ev(12): the 2→5 edge needs state
    val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(3)
    val got = runStream(Seq(b1, b2)) { ds: Dataset[EventRow] =>
      StatefulOps.pageTransitions(spark, ds)
    }
    assert(got.map(t => (t.user_id, t.src, t.dst)).toSet === expected)
    assert(got.size === expected.size)
  }

  test("aggregated edge counts match batch pageEdges on real data") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).as[EventRow]
    val stream = StatefulOps.pageTransitions(spark, ev)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("wt"))
    val batch = graft.operators.AdsQueries.pageEdges(
      graft.Tables.events(spark, sf))
    assert(stream.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(stream).count() === 0L)
  }
}
