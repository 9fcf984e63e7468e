package graft.operators

import graft.SparkSpec

/** t39 — mix-plan execution: the emitted sample must tie back to
  * t36's allocation exactly — full epochs by integer division, the
  * partial pass spending the remainder with the crossing doc
  * included, emitted totals never under the allocation. */
class MixExecuteSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("execution agrees with the plan's accounting, language by language") {
    val plan = TextOps.t36MixPlan(spark, sf)
      .select("lang", "n_tok", "alloc_tok")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exec = TextOps.t39MixExecute(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(exec.map(_._1).toSet === plan.keySet)
    exec.foreach { case (lang, fullEp, nPartial, partialTok, emitted) =>
      val (nt, alloc) = plan(lang)
      assert(nt > 0L)
      assert(fullEp === alloc / nt)
      val rem = alloc % nt
      if (rem == 0L) {
        assert(nPartial === 0L && partialTok === 0L)
        assert(emitted === alloc)
      } else {
        // the crossing doc is included: the partial pass spends at
        // least the remainder, so emitted never undershoots the plan
        assert(nPartial > 0L)
        assert(partialTok >= rem)
        assert(emitted === fullEp * nt + partialTok)
        assert(emitted >= alloc)
      }
    }
    // the fixture's upweighted language repeats (cap = 2.5 epochs ⇒
    // two full passes), the weight-1 languages subsample
    assert(exec.exists(_._2 >= 1L))
    assert(exec.exists(_._2 === 0L))
  }

  test("the draw is deterministic") {
    val a = TextOps.t39MixExecute(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val b = TextOps.t39MixExecute(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(a === b)
  }
}
