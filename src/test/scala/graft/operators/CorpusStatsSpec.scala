package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t12/t13/t14 pinned against brute-force recomputations on sf0.001
  * — the histogram median vs a sort-and-pick median, the windowed
  * top-k vs a full sort, and the sharded shuffle's permutation
  * contract. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("t30 ranks a rare term above a ubiquitous one despite lower tf") {
    // 'rare' appears once in doc 0 only (df=1); 'common' appears in
    // every doc, 3 times in doc 0 (df=4). idf ratio 4/1 vs 4/4 wins
    // over the 3× tf edge: score(rare) = 1·4Q > score(common) = 3·1Q.
    val docs = Seq(
      (0L, "common common common rare"),
      (1L, "common x"), (2L, "common y"), (3L, "common z"))
      .toDF("doc_id", "text")
    val got = CorpusStats.tfidfTerms(docs)
      .filter($"doc_id" === 0)
      .select($"rk", $"term", $"tf", $"df")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq((1L, "rare", 1L, 1L), (2L, "common", 3L, 4L)))
  }

  test("t12 histogram median equals the sort-and-pick median per source") {
    val got = CorpusStats.t12QualityDist(spark, sf)
      .select("source", "n_docs", "q_med2_fp", "q_sum_fp")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // brute force: collect every fixed-point quality, sort, pick.
    val perSource = TextOps.withQualityCols(graft.Tables.documents(spark, sf))
      .filter(col("quality").isNotNull)
      .select(col("source"),
        round(col("quality") * 1e6).cast("long").as("q_fp"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (src, n, med2, qsum) =>
      val xs = perSource(src)
      assert(n === xs.length, s"n_docs for $src")
      assert(qsum === xs.sum, s"q_sum_fp for $src")
      val lo = xs((xs.length + 1) / 2 - 1)
      val hi = xs(xs.length / 2)
      assert(med2 === lo + hi, s"median-pair sum for $src")
    }
  }

  test("t12x approx median within tolerance of the exact histogram median") {
    val exact = CorpusStats.t12QualityDist(spark, sf)
      .select("source", "q_med").as[(String, Double)].collect().toMap
    val approx = CorpusStats.t12xQualityDistApprox(spark, sf)
      .select("source", "q_med_approx").as[(String, Double)].collect().toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (src, a) =>
      assert(math.abs(a - exact(src)) <= 0.02,
        s"approx median $a vs exact ${exact(src)} for $src")
    }
  }

  test("t13 top-k matches a brute-force bigram count") {
    val got = CorpusStats.t13NgramTopK(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(got.nonEmpty)
    val brute = graft.Tables.documents(spark, sf)
      .select(col("lang"), split(col("text"), "\\s+").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', slice(t, i + 1, 2)))"))
        .as("bigram"))
      .groupBy("lang", "bigram").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3))
        .sortBy { case (bg, ct) => (-ct, bg) }.take(20)).toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val want = brute(lang)
      val have = rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(have === want.toSeq, s"top-k for $lang")
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq,
        s"ranks contiguous for $lang")
    }
  }

  test("t14 is a reproducible permutation with contiguous per-shard positions") {
    val df = CorpusStats.t14CorpusShuffle(spark, sf)
    val rows = df.as[(Long, Long, Long, Long)].collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_._1).distinct.length.toLong === total)
    rows.groupBy(_._3).foreach { case (shard, xs) =>
      assert(xs.map(_._4).sorted.toSeq === (1L to xs.length).toSeq,
        s"positions contiguous in shard $shard")
      // within a shard, position order IS skey order
      assert(xs.sortBy(_._4).map(_._2).toSeq === xs.map(_._2).sorted.toSeq,
        s"skey-ordered in shard $shard")
    }
    // determinism: a second run produces the identical frame
    val again = CorpusStats.t14CorpusShuffle(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(again.toSeq === rows.toSeq)
  }

  test("c23 spectrum masses reconcile with the shingle set") {
    val spec = CorpusStats.c23DfSpectrum(spark, sf)
      .as[(Long, Long)].collect()
    assert(spec.map(_._1).min >= 1L)
    val pairs = graft.operators.DedupOps
      .shingleDocsOf(graft.Tables.documents(spark, sf), 8, hashed = true)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("shs")))
    // Σ df·n_ngrams = |(doc, shingle)| pairs; Σ n_ngrams = |shingles|
    assert(spec.map { case (df, n) => df * n }.sum === pairs.count())
    assert(spec.map(_._2).sum === pairs.distinct().count())
  }

  test("t18 fertility is ≥ 1 everywhere (a word is at least one subword)") {
    val rows = TextOps.t18Fertility(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, ws, sw, fert) =>
      assert(nDocs > 0 && ws > 0, s"$lang")
      assert(sw >= ws, s"$lang: subword count below word count")
      assert(fert >= 1.0 && fert === sw.toDouble / ws.toDouble, s"$lang")
    }
  }

  test("t20 pair counts equal a brute-force per-word recount; top-k needs no global sort") {
    val got = TextOps.t20BpePairs(spark, sf)
      .as[(String, String, Long)].collect()
    assert(got.nonEmpty)
    // brute force: re-segment every word OCCURRENCE (not the dict)
    // and count adjacent pairs — the dict-weighted rollup must agree
    val brute = graft.Tables.documents(spark, sf)
      .select(col("text")).as[String].collect()
      .filter(_ != null)
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .flatMap { w =>
        val t = graft.functions.SubwordTokenize.tokens(w)
        t.iterator.zip(t.iterator.drop(1)).map { case (a, b) => (a, b) }
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (a, b, freq) =>
      assert(brute((a, b)) === freq, s"pair ($a, $b)")
    }
    // got is exactly the brute top-|got| under (freq desc, a, b)
    val want = brute.toSeq.map { case ((a, b), f) => (a, b, f) }
      .sortBy { case (a, b, f) => (-f, a, b) }.take(got.length)
    assert(got.toSeq === want)
    // the merge-candidate cutoff compiles to TakeOrdered, not a
    // global Sort+Limit over the pair table
    val plan = TextOps.t20BpePairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("t21 bins are quartiles: value-monotone, sized n/4 up to ties, no corpus range-sort") {
    val rows = CorpusStats.t21QualityBins(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = rows.length
    // monotone: a higher score never lands in a lower bin
    val byBin = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBin.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
    for (b <- 1L to 3L if byBin.contains(b) && byBin.contains(b + 1))
      assert(byBin(b).max <= byBin(b + 1).min, s"bins $b/${b + 1} overlap in value")
    // sizes: each CUMULATIVE quartile boundary is exact up to the tie
    // run at the boundary value (value-based binning keeps ties whole)
    val sorted = rows.map(_._2).sorted
    for (k <- 1 to 3) {
      val cut = (n.toLong * k + 3) / 4
      val bk = sorted((cut - 1).toInt)
      val cumK = rows.count(_._3 <= k)
      assert(cumK === sorted.count(_ <= bk),
        s"cumulative size through bin $k must cover exactly the values ≤ b$k")
    }
    // the corpus pass must not range-partition (no global ntile sort);
    // the only exchanges are the bounded histogram's and the
    // presentation sort's
    val plan = CorpusStats.t21QualityBins(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning(quality"),
      s"corpus range-sorted by quality:\n$plan")
  }
}
