package graft.operators

import graft.{SparkSpec, Tables}

/** t35 exact-size weighted sampling + t36 budget/repeat-cap mix
  * plan: draw identities against independent in-memory replays, the
  * water-fill accounting identities, and the top-K plan shape. */
class WeightedSampleMixPlanSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Portable 60-bit hash: first 15 md5 hex digits (Portable.h60). */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("t35 draws the same K docs as an in-memory priority sort") {
    val got = TextOps.t35WeightedSample(spark, sf)
      .as[(Long, String, String, Long, Double)].collect().toSeq
    // independent replay: full corpus priorities computed locally
    val all = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val w = math.max(Option(text).map(_.split("\\s+").length).getOrElse(0), 1)
        (id, (h60(s"wsamp:$id") + 1L).toDouble / w.toDouble)
      }.sortBy { case (id, p) => (p, id) }
    val want = all.take(math.min(200, all.length)).map(_._1).toSeq
    assert(got.map(_._1) === want)
    // priorities ascend and weights are the token counts
    assert(got.map(_._5) === got.map(_._5).sorted)
    assert(got.forall(_._4 >= 1L))
  }

  test("t35 is deterministic and compiles to a partial top-K, not a global sort") {
    val df = TextOps.t35WeightedSample(spark, sf)
    val a = df.collect().toSeq
    val b = TextOps.t35WeightedSample(spark, sf).collect().toSeq
    assert(a === b)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "t35 lost its TakeOrderedAndProject — a global sort would not scale")
  }

  test("t36 water-fills a crafted two-round cap cascade exactly") {
    // a (10 tok) caps in round 1; the redistributed floor then caps
    // b (160 tok) in round 2; c absorbs the rest. budget = 2170/2.
    // All crafted languages carry the default weight 1.
    val rows = TextOps.mixPlanOf(spark,
      Seq(("a", 10L), ("b", 160L), ("c", 2000L)))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      ("a", 1L, 10L, 25L, 25L, 2500L, 1L),
      ("b", 1L, 160L, 400L, 400L, 2500L, 1L),
      ("c", 1L, 2000L, 5000L, 660L, 330L, 0L)))
  }

  test("t36 budget accounting holds on the real corpus, zh target capping") {
    val rows = TextOps.t36MixPlan(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val totalTok = rows.map(_._3).sum
    val budget = totalTok / 2
    val alloc = rows.map(_._5).sum
    // never overspent; underspend only by the final floor remainders
    assert(alloc <= budget)
    assert(budget - alloc < math.max(rows.count(_._7 == 0L), 1).toLong *
      rows.map(_._2).max)
    rows.foreach { case (l, w, nt, cap, a, ep, capped) =>
      assert(w === (if (l == "zh") 20L else 1L), l)
      assert(cap === nt * 2500L / 1000L, l)
      if (capped == 1L) { assert(a === cap, l); assert(ep === 2500L, l) }
      else assert(a <= cap, l)
      assert(ep === (if (nt == 0) 0L else a * 1000L / nt), l)
    }
    // the zh-heavy target binds zh's repeat cap on the fixture —
    // the redistribute path runs on real data, not just crafted
    assert(rows.find(_._1 == "zh").forall(_._7 == 1L))
    // uncapped same-weight languages receive the identical floor share
    rows.filter(_._7 == 0L).groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._5).distinct.size <= 1)
    }
  }

  test("t36 four small languages cap; the big one absorbs the rest") {
    // (ALL-capped is impossible by construction: Σcap = 2.5·total
    // always exceeds budget = total/2, so the wa=0 guard is
    // belt-and-braces — this pins the many-capped corner instead)
    val rows = TextOps.mixPlanOf(spark, Seq(("a", 2L), ("b", 2L),
      ("c", 2L), ("d", 2L), ("e", 10000L)))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val capped = rows.filter(_._7 == 1L)
    assert(capped.map(_._1) === Seq("a", "b", "c", "d"))
    capped.foreach(r => assert(r._5 === r._4))
    val e = rows.find(_._1 == "e").get
    assert(e._5 === (10008L / 2) - 4 * 5L) // budget minus the four caps
  }
}
