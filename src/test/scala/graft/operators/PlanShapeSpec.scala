package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Regression net for the physical-plan properties the 100 TB design
  * claims rest on. Plans are audited POST-AQE (collect() finalizes
  * the adaptive plan) at sf0.001 — the properties asserted here are
  * planner-structural (operator choice, pushdown, partial top-k),
  * not data-size-dependent.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan text of a declared query. */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** Queries whose plans legitimately contain a broadcast
    * nested-loop join: the tiny-literal-side patterns (range dim in
    * a14c; the ≤20-row broadcast query/centroid sets in the ANN
    * family; t15's ONE-ROW vocabulary-size scalar crossed into the
    * scoring projection) where a hash join has no equi-key to use. */
  private val bnljAllowed = Set(
    "a14c_range_join", "c06_ann_brute", "c07_ann_ivf",
    "c07b_ann_ivf_refined", "c11_semantic_dedup", "c05_embed_neardup",
    "t15_lm_score", "c24_bm25_topk",
    // t21 crosses TWO one-row broadcast boundary tables (quartile
    // bounds, total n) into the per-row binning projection — no
    // equi-key exists, and a 1-row BNLJ build side is free
    "t21_quality_bins",
    // c28 inherits c24's one-row corpus-stats cross; t22 inherits
    // t15's one-row vocabulary-size cross; t30 crosses the one-row
    // corpus doc count into the idf projection
    "c28_hybrid_rrf", "t22_ppl_buckets", "t30_tfidf_terms",
    // t31 crosses the one-row bigram-type-count scalar (B in the KN
    // backoff) into the probability projection — t15's pattern; t32
    // crosses its one-row snapshot-totals scalar the same way
    "t31_kn_lm", "t32_vocab_drift",
    // c37 crosses the one-row cluster-totals scalar (total docs /
    // clustered docs, for the singleton row of the histogram) into
    // the final projection — the same one-row build side as t15/t21
    "c37_cluster_histogram",
    // c40's shortlist stage is c06's broadcast-query scan
    "c40_mmr_rerank")

  test("no query plan contains a cartesian product; BNLJ only where intended") {
    val violations = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = finalPlan(name)
      val cart = if (plan.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
      val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        Seq(s"$name: unexpected BroadcastNestedLoopJoin") else Nil
      cart ++ bnlj
    }
    assert(violations.isEmpty, violations.mkString("; "))
  }

  test("top-k rank filters compile to partial WindowGroupLimit") {
    Seq("t11_top_quality_per_source", "t13_ngram_topk", "a14b_asof_join",
      "t16_quota_sample", "c24_bm25_topk", "c25_cluster_sample",
      "c41_audit_sample")
      .foreach { q =>
        assert(finalPlan(q).contains("WindowGroupLimit"), s"$q lost its WindowGroupLimit")
      }
  }

  test("t12's windows reuse the source partitioning (no extra keyed exchange)") {
    // The property the 100 TB claim rests on: histogram agg + source
    // window = at most TWO keyed exchanges, i.e. the median window
    // adds NO exchange of its own. An upper bound, not an exact
    // count — exact counts break on Spark/AQE planning changes that
    // are unrelated to the window-reuse property.
    val plan = finalPlan("t12_quality_dist")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"expected at most 2 hash exchanges, got $hashEx — " +
      "the windows and final aggregate must share the source partitioning")
  }

  test("s02's bucketed fact join has no exchange on either join side") {
    val plan = finalPlan("s02_bucketed_join")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      "lineitem side shuffled — bucketed co-location lost")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      "orders side shuffled — bucketed co-location lost")
  }

  test("c09b probes the bloom sketch before the exact semi-join verify") {
    val plan = finalPlan("c09b_decontaminate_bloom")
    assert(plan.contains("might_contain"), "bloom probe missing from the plan")
    assert(plan.contains("LeftSemi"), "exact verify semi-join missing")
    // the probe must sit in a Filter, not inside the join condition
    val probeInFilter = plan.linesIterator
      .exists(l => l.contains("Filter") && l.contains("might_contain"))
    assert(probeInFilter, "might_contain is not a pre-join Filter")
  }

  test("star-query dims broadcast (no shuffle join on b2's dimension side)") {
    val plan = finalPlan("b2_topn_spu")
    assert(plan.contains("BroadcastHashJoin"), "b2 lost its broadcast dim join")
    assert(!plan.contains("SortMergeJoin"), "b2 dim join degraded to sort-merge")
  }
}
