package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error/recall gates for the approximate operators:
  *  - a21x/a23x (HLL++ rsd 3%) against their exact twins — relative
  *    error bounded, all group keys identical;
  *  - c07 IVF (nprobe=4 of 16 cells) recall@10 against c06's exact
  *    brute-force top-k.
  */
class ApproxAndRecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("a21x approx order_ct within 2% of the exact set-distinct") {
    val exact = DwsWindows.a21ProductStats(spark, sf)
      .select($"stt", $"sku_id", $"order_ct".as("exact_ct"))
    val approx = DwsWindows.a21xProductStatsApprox(spark, sf)
      .select($"stt", $"sku_id", $"order_ct".as("approx_ct"))
    val joined = exact.join(approx, Seq("stt", "sku_id"), "full_outer")
    // same group keys on both sides
    assert(joined.filter($"exact_ct".isNull || $"approx_ct".isNull).count() === 0L)
    val maxRelErr = joined
      .filter($"exact_ct" > 0)
      .select(max(abs($"approx_ct" - $"exact_ct") / $"exact_ct"))
      .as[Double].collect().head
    assert(maxRelErr <= 0.02, s"max relative error $maxRelErr > 2%")
    // empty windows agree exactly (HLL of the empty set is 0)
    assert(joined.filter($"exact_ct" === 0 && $"approx_ct" =!= 0).count() === 0L)
  }

  test("a23x approx order_count within 2% of COUNT(DISTINCT)") {
    val exact = DwsWindows.a23ProvinceWindow(spark, sf)
      .select($"stt", $"province_id", $"order_count".as("exact_ct"))
    val approx = DwsWindows.a23xProvinceApprox(spark, sf)
      .select($"stt", $"province_id", $"order_count".as("approx_ct"))
    val joined = exact.join(approx, Seq("stt", "province_id"), "full_outer")
    assert(joined.filter($"exact_ct".isNull || $"approx_ct".isNull).count() === 0L)
    val maxRelErr = joined
      .select(max(abs($"approx_ct" - $"exact_ct") / $"exact_ct"))
      .as[Double].collect().head
    assert(maxRelErr <= 0.02, s"max relative error $maxRelErr > 2%")
  }

  test("c07 IVF recall@10 vs c06 exact top-k, and the nprobe knob") {
    val exact = VectorOps.c06AnnBrute(spark, sf)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallAt(probes: Int): Double = {
      val ivf = VectorOps.c07AnnIvfProbes(spark, sf, probes)
        .select($"qid", $"nid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(ivf.keySet === exact.keySet)
      val recalls = exact.map { case (q, truth) =>
        (ivf(q) intersect truth).size.toDouble / truth.size
      }
      recalls.sum / recalls.size
    }
    // The recall/cost tradeoff, pinned: nprobe=4 (25% of the corpus
    // scanned) measured 0.805 at sf0.01 — gate at ≥0.75 so a
    // centroid/probe regression is caught; nprobe=CELLS degenerates
    // to exact brute force and MUST be lossless.
    val r4 = recallAt(4)
    assert(r4 >= 0.75, s"mean recall@10 at nprobe=4 was $r4")
    assert(recallAt(16) === 1.0)
  }

  test("c07b refined-quantizer IVF recall@10 vs exact is not below the seed quantizer") {
    val exact = VectorOps.c06AnnBrute(spark, sf)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"qid", $"nid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(got.keySet === exact.keySet)
      val rs = exact.map { case (q, truth) =>
        (got(q) intersect truth).size.toDouble / truth.size
      }
      rs.sum / rs.size
    }
    val seed = recallOf(VectorOps.c07AnnIvf(spark, sf))
    val refined = recallOf(VectorOps.c07bAnnIvfRefined(spark, sf))
    // Lloyd refinement tightens cells around the data, so probing the
    // same number of refined cells must not lose recall (small
    // tolerance: quantized integer scores can flip distant ties)
    assert(refined >= seed - 0.05,
      s"refined-quantizer recall $refined fell below seed quantizer $seed")
  }

  test("t13x sketch counts are exact under capacity; strict heavy hitters all surface") {
    // full exact per-(lang, bigram) counts — the ground truth the
    // sketch is judged against
    val full = graft.Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), "\\s+"))
      .where(size($"toks") >= 2)
      .select($"lang", explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i + 1, 2)))")).as("bigram"))
      .groupBy($"lang", $"bigram").agg(count(lit(1)).as("true_ct"))
      .as[(String, String, Long)].collect()
      .map { case (l, b, c) => (l, b) -> c }.toMap
    val approx = CorpusStats.t13xNgramTopKApprox(spark, sf)
      .select($"lang", $"bigram", $"ct").as[(String, String, Long)].collect()
    // capacity (16384) far exceeds the fixture's ~900 distinct
    // bigrams/lang, so every reported count must be EXACT
    approx.foreach { case (l, b, c) =>
      assert(full((l, b)) === c, s"sketch count for ($l, $b) drifted: $c")
    }
    // completeness: every bigram STRICTLY above the exact k-th count
    // must appear (only boundary ties may be swapped for one another)
    val exactTopK = CorpusStats.t13NgramTopK(spark, sf)
      .select($"lang", $"bigram", $"ct").as[(String, String, Long)].collect()
    val kth = exactTopK.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val approxSet = approx.map { case (l, b, _) => (l, b) }.toSet
    full.foreach { case ((l, b), c) =>
      if (c > kth(l))
        assert(approxSet.contains((l, b)),
          s"strict heavy hitter ($l, $b, ct=$c) missing from sketch top-k")
    }
  }

  test("c27 filtered top-k: every neighbor satisfies the predicate, ranks dense") {
    val labels = VectorOps.emb(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val got = VectorOps.c27AnnFiltered(spark, sf)
      .select($"qid", $"rank", $"nid").as[(Long, Long, Long)].collect()
    got.foreach { case (q, _, n) =>
      assert(labels(q) === labels(n), s"neighbor $n of query $q crosses the label filter")
    }
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length),
        s"ranks of query $q are not dense from 1")
    }
  }

  test("c27b filtered IVF: predicate holds, k fills, recall vs filtered-exact") {
    val labels = VectorOps.emb(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val exact = VectorOps.c27AnnFiltered(spark, sf)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = VectorOps.c27bAnnFilteredIvf(spark, sf)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet === exact.keySet, "a query returned no filtered-IVF rows")
    ivf.foreach { case (q, ns) =>
      ns.foreach(n => assert(labels(q) === labels(n)))
      // selectivity-scaled nprobe (8 of 16 cells for the ~10% filter)
      // restores full k — at plain nprobe=4 five queries underfilled
      assert(ns.size === 10, s"query $q returned ${ns.size} of 10 under the filter")
    }
    val rs = exact.map { case (q, truth) =>
      (ivf(q) intersect truth).size.toDouble / truth.size
    }
    val recall = rs.sum / rs.size
    // measured 0.495 at nprobe=4; selectivity-scaling to 8 lifts it —
    // gate at 0.7 so a probe-scaling regression is caught
    assert(recall >= 0.7, s"filtered-IVF mean recall@10 was $recall")
  }
}
