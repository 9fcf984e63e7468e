package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level statistics + layout operators for the training-data
  * pipeline (extends the t-family in [[TextOps]]):
  *
  *  - t12 per-source quality distribution (EXACT median at scale via
  *    a value histogram, not a per-row sort),
  *  - t13 per-language top-k n-gram vocabulary,
  *  - t14 deterministic sharded corpus shuffle (training order).
  *
  * Scale stance: none of these sorts or windows over corpus rows
  * globally. t12 windows over the bounded fixed-point histogram
  * (≤ 10^6 + 1 distinct values per source, regardless of corpus
  * size); t13's window input is the aggregated (lang, ngram) count
  * table and its rank-filter compiles to WindowGroupLimit (partial
  * top-k before the shuffle, like t11); t14 partitions by a derived
  * hash shard so the per-shard sort parallelizes across executors and
  * the training order is reproducible from doc_id alone.
  */
object CorpusStats extends QueryModule {

  // ---------------------------------------------------------------
  // t12 — per-source quality distribution, exact
  // ---------------------------------------------------------------

  /** Fixed-point scale for quality scores: 6 decimal digits. All
    * distribution arithmetic below happens on these BIGINTs, so sums
    * are exact (no float-summation-order divergence) and the median
    * is selected, not interpolated from approximate buckets. */
  private val QFP = 1e6

  /** t12 — per-source distribution summary of the quality score
    * (TextOps scorer): count, min, max, exact mean, exact median.
    *
    * The scale-correct exact-median shape: per-row quality is
    * fixed-pointed to a BIGINT, the corpus collapses to a
    * (source, q_fp) → count HISTOGRAM (map-side partial agg, one
    * keyed exchange of ≤ |distinct values| rows), and the median is
    * picked by a cumulative-count window over the histogram. The
    * window input is bounded by the value domain (10^6 + 1 rows per
    * source max), so a 100 TB corpus pays the same window cost as
    * sf0.01 — a per-row `row_number` selection (or a single-column
    * sort) would instead funnel every row of the biggest source
    * through one partition. Median of n values = the mean of the
    * ⌈n/2⌉-th and (⌊n/2⌋+1)-th smallest (equal when n is odd);
    * `q_med2_fp` keeps their exact SUM so the only float division
    * happens once, identically, in both engines.
    *
    * Null-quality documents (null text) are excluded explicitly —
    * both engines then agree without pinning null-ordering rules. */
  def t12QualityDist(s: SparkSession, d: String): DataFrame = {
    val hist = TextOps.withQualityCols(Tables.documents(s, d))
      .filter(col("quality").isNotNull)
      .groupBy(col("source"),
        round(col("quality") * QFP).cast(LongType).as("q_fp"))
      .agg(count(lit(1)).as("cnt"))
    // Both windows share the partitioning; the unordered n-window
    // rides the same exchange as the cumulative one (no extra
    // shuffle — same reuse as c04's rank/n windows).
    val byQ = Window.partitionBy(col("source")).orderBy(col("q_fp"))
    val all = Window.partitionBy(col("source"))
    val lo = expr("(n + 1) div 2")
    val hi = expr("n div 2 + 1")
    hist
      .withColumn("cum", sum(col("cnt")).over(byQ))
      .withColumn("n", sum(col("cnt")).over(all))
      .groupBy(col("source"))
      .agg(
        max(col("n")).as("n_docs"),
        min(col("q_fp")).as("q_min_fp"),
        max(col("q_fp")).as("q_max_fp"),
        sum(col("q_fp") * col("cnt")).as("q_sum_fp"),
        (max(when(col("cum") - col("cnt") < lo && lo <= col("cum"), col("q_fp"))) +
          max(when(col("cum") - col("cnt") < hi && hi <= col("cum"), col("q_fp"))))
          .as("q_med2_fp"))
      .withColumn("q_avg",
        col("q_sum_fp").cast(DoubleType) / col("n_docs").cast(DoubleType) / QFP)
      .withColumn("q_med", col("q_med2_fp").cast(DoubleType) / (2 * QFP))
      .orderBy(col("source"))
  }

  /** t12x — t12's PRODUCTION swap for unbounded value domains:
    * `percentile_approx` (Spark's mergeable Greenwald-Khanna quantile
    * sketch) replaces the exact histogram selection. One narrow pass,
    * map-side-merged sketches of bounded size per group — the right
    * tool when values are continuous (t12's fixed-point histogram
    * trick needs a bounded domain). No DuckDB oracle: sketch
    * internals are engine-specific, so the driver records rows/schema
    * only and CorpusStatsSpec gates the approximation error against
    * t12's exact medians instead (same pattern as a21x/a23x). */
  def t12xQualityDistApprox(s: SparkSession, d: String): DataFrame =
    TextOps.withQualityCols(Tables.documents(s, d))
      .filter(col("quality").isNotNull)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile_approx(col("quality"), lit(0.5), lit(10000)).as("q_med_approx"),
        percentile_approx(col("quality"), lit(0.25), lit(10000)).as("q_p25_approx"),
        percentile_approx(col("quality"), lit(0.75), lit(10000)).as("q_p75_approx"))
      .orderBy(col("source"))

  // ---------------------------------------------------------------
  // t13 — top-k n-gram vocabulary per language
  // ---------------------------------------------------------------

  private val TOPK = 20

  /** t13 — the top-20 word bigrams per language by occurrence count
    * (vocabulary/frequency tables — the corpus-reporting staple for
    * tokenizer training and contamination eyeballing). Occurrences,
    * not per-doc distincts, so no array_distinct: one bounded
    * explode, a (lang, bigram) count whose partial agg collapses
    * each partition to its local vocabulary, then a rank-filter that
    * compiles to WindowGroupLimit — each partition forwards only its
    * running top-20 per language to the final shuffle. Ties broken
    * by bigram text so the result is deterministic. */
  def t13NgramTopK(s: SparkSession, d: String): DataFrame = {
    val counted = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), "\\s+"))
      .where(size(col("toks")) >= 2)
      // fused native bigram build ([[graft.functions.Grams]]) — the
      // HOF twin (transform+slice+concat_ws) paid an interpreted
      // lambda per TOKEN of the corpus; bit-identical output, so the
      // oracle twin is unchanged (GramsSpec pins the parity)
      .select(col("lang"),
        explode(expr("graft_grams(toks, 2)")).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("ct"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("ct").desc, col("bigram"))
    counted
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= TOPK)
      .orderBy(col("lang"), col("rk"))
  }

  /** Sketch capacity for t13x — sized above the fixture's distinct
    * bigram count so the spec can pin exactness; production sets it
    * to the memory budget and takes the documented error. */
  private val TOPK_SKETCH = 1 << 14

  /** t13x — t13's PRODUCTION swap: per-language heavy hitters from
    * Spark's `approx_top_k` (a DataSketches frequent-items sketch)
    * instead of the exact (lang, bigram) count table. The exact form
    * shuffles the full per-partition vocabulary; the sketch form
    * shuffles ONE bounded buffer per partition per language — at
    * 100 TB, where the bigram vocabulary no longer saturates (names,
    * typos, code identifiers keep Heaps' law growing), the exchange
    * drops from vocabulary-sized to `maxItemsTracked`-sized. The
    * trade is bounded count error once the tracked-item budget is
    * exceeded; with capacity above the true distinct count the
    * sketch is exact, which ApproxAndRecallSpec pins against t13
    * (same gate pattern as a21x/a23x/t12x — no DuckDB oracle, the
    * sketch internals are engine-specific). */
  def t13xNgramTopKApprox(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), "\\s+"))
      .where(size(col("toks")) >= 2)
      .select(col("lang"),
        explode(expr("graft_grams(toks, 2)")).as("bigram"))
      .groupBy(col("lang"))
      .agg(expr(s"approx_top_k(bigram, $TOPK, $TOPK_SKETCH)").as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rk"),
        col("col.item").as("bigram"), col("col.count").cast(LongType).as("ct"))
      .orderBy(col("lang"), col("rk"), col("bigram"))

  private val DF_N = 8 // c23 shingle width = the decontamination ngram

  /** c23 — the document-frequency SPECTRUM of hashed 8-gram
    * shingles: how many distinct ngrams occur in exactly `df`
    * documents. This is the tuning instrument for every df-driven
    * pass in the engine — c15's boilerplate threshold K, c09's
    * contamination surface, c19's duplicated-substring mass — read
    * the spectrum first, then set the knob (a Heaps'-law / repetition
    * diagnostic any corpus audit starts with).
    *
    * Scale shape: per-doc DISTINCT shingles (array_distinct inside
    * the row — no shuffle), then one keyed aggregation per level:
    * (sh)→df shuffles the shingle set once (linear in corpus, the
    * same exchange c09 pays), and (df)→count collapses map-side to
    * at most max-df rows per partition — the spectrum itself is
    * tiny. No joins at all. */
  def c23DfSpectrum(s: SparkSession, d: String): DataFrame = {
    // ~1000 hashes per document: the shingle hashing dominates this
    // query, and a parquet ROW GROUP cannot be split, so a few-split
    // source (this fixture is one row group; a freshly ingested hour
    // of data looks the same) would run the whole hash load in one
    // task. Spread the (tiny) doc rows first — but only when the
    // scan's own parallelism is short, so a many-split 100 TB corpus
    // never pays a pointless full-text shuffle.
    val docs0 = Tables.documents(s, d)
    val par = s.sparkContext.defaultParallelism
    val docs = if (docs0.rdd.getNumPartitions < par) docs0.repartition(par)
      else docs0
    // explode_OUTER, deliberately: plain explode lets
    // InferFiltersFromGenerate push a size(...)>0 filter to the scan
    // that re-derives the ENTIRE shingle+hash expression — the hash
    // pass would run twice (measured 3.3 s vs 1.4 s for the shingle
    // pass alone). The where(size>=n) inside shingleDocsOf already
    // guarantees non-empty arrays, so the row sets are identical.
    DedupOps.shingleDocsOf(docs, DF_N, hashed = true)
      .select(explode_outer(col("shs")).as("sh"))
      // The (sh)→df aggregation needs a sh-exchange either way; doing
      // it EXPLICITLY before the groupBy moves the hash-map build to
      // the post-exchange side (partial aggregation over near-unique
      // keys collapses nothing — the map is pure overhead on the
      // scan side). Same exchange count and bytes at every scale.
      .repartition(col("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n_ngrams"))
      .orderBy(col("df"))
  }

  // ---------------------------------------------------------------
  // t14 — deterministic sharded corpus shuffle
  // ---------------------------------------------------------------

  private val SHARDS = 64

  /** t14 — the global training-data shuffle, Spark-first: a seeded
    * portable hash gives every document a shuffle key, the key's
    * modulus picks one of 64 shards, and documents are ordered within
    * their shard by (key, doc_id). That is a uniform random
    * permutation of the corpus (read shards in index order, rows in
    * position order) WITHOUT a global sort: the per-shard window
    * sorts run shard-way parallel, any engine reproduces the same
    * order from doc_id + seed alone, and at 100 TB you raise SHARDS
    * to ≈ executors·cores so each sort stays memory-sized. A single
    * global row_number/ORDER BY would serialize the corpus through
    * one range-partitioned sort — this shape never does. */
  def t14CorpusShuffle(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        Portable.h60(concat(lit("shuffle:42:"), col("doc_id").cast(StringType)))
          .as("skey"))
      .withColumn("shard", col("skey") % SHARDS)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .orderBy(col("shard"), col("pos"))
  }

  /** t21 — GLOBAL quality-quartile bin assignment without a global
    * sort: the range-layout op (write the corpus laid out by quality
    * so readers of "top-quality data first" curricula prune files).
    * The naive `ntile(4) OVER (ORDER BY quality)` funnels the whole
    * corpus through ONE range-sorted partition; this shape never
    * does. Stage 1 collapses the corpus to the bounded fixed-point
    * histogram (t12's trick, globally: ≤ 10^6 + 1 rows whatever the
    * corpus size); stage 2 reads the three quartile boundaries off
    * the histogram's cumulative window (single-partition, but over
    * the BOUNDED histogram — the same argument as t12's per-source
    * window); stage 3 assigns bins per-row against the broadcast
    * 1-row boundary table — a narrow codegen'd pass, no shuffle.
    * VALUE-based binning (bin = 1 + #{boundaries below q}), so tied
    * scores always share a bin and the result is deterministic —
    * b_k is the ⌈n·k/4⌉-th smallest score, the type-1 quantile both
    * engines can select identically. */
  def t21QualityBins(s: SparkSession, d: String): DataFrame = {
    val qd = TextOps.withQualityCols(Tables.documents(s, d))
      .filter(col("quality").isNotNull)
      .select(col("doc_id"),
        round(col("quality") * QFP).cast(LongType).as("q_fp"))
    val hist = qd.groupBy(col("q_fp")).agg(count(lit(1)).as("cnt"))
    val byQ = Window.orderBy(col("q_fp"))
    val bounds = hist
      .withColumn("cum", sum(col("cnt")).over(byQ))
      .crossJoin(broadcast(hist.agg(sum(col("cnt")).as("n"))))
      .agg(
        min(when(col("cum") >= expr("(n + 3) div 4"), col("q_fp"))).as("b1"),
        min(when(col("cum") >= expr("(2 * n + 3) div 4"), col("q_fp"))).as("b2"),
        min(when(col("cum") >= expr("(3 * n + 3) div 4"), col("q_fp"))).as("b3"))
    qd.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("q_fp"),
        (lit(1) +
          when(col("q_fp") > col("b1"), 1).otherwise(0) +
          when(col("q_fp") > col("b2"), 1).otherwise(0) +
          when(col("q_fp") > col("b3"), 1).otherwise(0))
          .cast(LongType).as("bin"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // t22 — CCNet-style perplexity bucketing (head / middle / tail)
  // ---------------------------------------------------------------

  /** Fixed-point bins for the lm_score domain (0, 1]. 1024 bins keeps
    * the per-language histogram bounded (≤ 1024 rows/lang whatever
    * the corpus size) while bucket boundaries land within 0.1% of the
    * exact terciles on any non-degenerate score distribution. */
  private val PPL_BINS = 1024L

  /** t22 — per-language perplexity TERCILES (the CCNet curation
    * rule): score every document with the t15 bigram LM, then label
    * each language's best-scored third `head`, the next `middle`,
    * the rest `tail` — downstream pipelines keep head+middle and
    * audit tail.
    *
    * The scale-correct shape mirrors t12/t21, NOT `ntile`: a naive
    * `ntile(3) OVER (PARTITION BY lang ORDER BY lm_score)` funnels
    * every document of a language through one sorted partition —
    * exactly the skew-killer the survey warns about (one `en`
    * partition at 100 TB). Instead the corpus collapses to a
    * (lang, score-bin) histogram (map-side combine, ≤ 5×1024 rows),
    * tercile CUTOFF bins are read off the histogram's cumulative
    * window (bounded input), and each row gets its bucket from a
    * broadcast join on its own bin. Documents in the same bin always
    * share a bucket (value-based, like t21), so the result is
    * deterministic and engine-portable with no tie-break subtleties. */
  def t22PplBuckets(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val scored = TextOps.lmScore(docs, docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    // Materialize ONCE (round-14 opt): binned feeds both the
    // histogram→bucket-boundary branch (the broadcast build) and the
    // final probe join — without the checkpoint the whole LM-scoring
    // lineage (two bigram explosions + the model joins) ran twice,
    // once per branch. Eager, not lazy: the two consumers are
    // separate query stages under AQE, so a lazy checkpoint would
    // still compute the scan per branch.
    val binned = scored.select(col("doc_id"), col("lang"), col("lm_score"),
      least(lit(PPL_BINS - 1L),
        floor(col("lm_score") * PPL_BINS).cast(LongType)).as("bin"))
      .localCheckpoint()
    val hist = binned.groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("ct"))
    val wcum = Window.partitionBy(col("lang")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy(col("lang"))
    val buckets = hist
      .withColumn("cum", sum(col("ct")).over(wcum))
      .withColumn("n", sum(col("ct")).over(wtot))
      .select(col("lang"), col("bin"),
        when(col("cum") <= expr("n div 3"), "tail")
          .when(col("cum") <= expr("(2 * n) div 3"), "middle")
          .otherwise("head").as("ppl_bucket"))
    binned
      .join(broadcast(buckets), Seq("lang", "bin"))
      .select(col("doc_id"), col("lang"), col("lm_score"), col("bin"),
        col("ppl_bucket"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // t23 — dataset card: hierarchical corpus rollup
  // ---------------------------------------------------------------

  /** Fixed-point scale for the card's quality sums (exact BIGINT
    * accumulation — float sums would diverge across engines by
    * summation order). */
  private[graft] val CARD_Q = 1L << 20

  /** The card's per-row feature projection (source, lang, nt, nc,
    * qfp) — shared by batch t23 (rollup) and the streaming running
    * card (graft.streaming.Jobs.cardIngest, leaf grain only). */
  private[graft] def cardFeatures(docs: DataFrame): DataFrame =
    TextOps.withQualityCols(docs)
      .select(col("source"), col("lang"),
        coalesce(col("n_tok"), lit(0L)).as("nt"),
        coalesce(col("n_char"), lit(0L)).as("nc"),
        floor(col("quality") * CARD_Q).cast(LongType).as("qfp"))

  /** t23 — the DATASET CARD rollup: one query emitting the
    * (source × language), per-source, and whole-corpus grain of the
    * release-note stats every corpus ships with — document count,
    * token/char volume, mean quality. `ROLLUP` computes all three
    * grains from ONE scan with map-side partial aggregation (the
    * grain count multiplies rows only inside the agg, never a
    * re-scan); `lvl` = 2·grouping(source) + grouping(lang)
    * disambiguates a real NULL group value from a rollup total.
    * Quality is summed in fixed point (exact), divided once at the
    * end; null-text docs count toward n_docs but contribute no
    * token/quality mass (explicit coalesce, same on both sides). */
  def t23DatasetCard(s: SparkSession, d: String): DataFrame =
    datasetCardOf(Tables.documents(s, d))

  /** [[t23DatasetCard]] over any documents-shaped frame (s07's
    * release report computes the card from a snapshot read). */
  private[graft] def datasetCardOf(docs: DataFrame): DataFrame =
    cardFeatures(docs)
      .rollup(col("source"), col("lang"))
      .agg(
        (grouping(col("source")) * 2 + grouping(col("lang")))
          .cast(LongType).as("lvl"),
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(col("nc")).as("n_chars"),
        (sum(col("qfp")).cast(DoubleType) /
          count(col("qfp")).cast(DoubleType) /
          lit(CARD_Q).cast(DoubleType)).as("avg_quality"))
      .orderBy(col("lvl"), col("source").asc_nulls_first,
        col("lang").asc_nulls_first)

  // ---------------------------------------------------------------
  // t30 — per-document TF-IDF keyword extraction
  // ---------------------------------------------------------------

  private val TFIDF_K = 5
  /** idf fixed-point scale. The idf is kept as the raw ratio N/df in
    * truncating integer arithmetic — (Q·N) div df — instead of
    * ln(N/df): log is monotone, so per-document term RANKING is
    * unchanged, and dropping libm makes scores bit-portable across
    * engines (c24's trick). Overflow headroom: Q·N < 2^63 up to
    * N ≈ 8.8·10^12 documents; beyond that shrink Q — only score
    * resolution changes, ties still break on the term text. */
  private val TFIDF_Q = 1L << 20

  /** t30 — top-5 TF-IDF terms per document: the per-doc KEYWORD
    * extraction every corpus debugging/labeling UI runs (and the
    * classic relevance baseline BM25 (c24) refines). score =
    * tf · ((Q·N) div df), exact BIGINTs end-to-end.
    *
    * Scale shape: one (doc, term) count aggregation (map-side partial
    * collapses repeats inside a partition), a vocabulary-sized df
    * table joined back by term (vocabulary ≪ corpus; AQE broadcasts
    * at fixture scale and degrades to shuffle join when the vocab
    * outgrows executors), the 1-row corpus count broadcast, and a
    * per-doc rank filter that compiles to WindowGroupLimit — each
    * partition forwards only its local top-5 per document. */
  def t30TfidfTerms(s: SparkSession, d: String): DataFrame =
    tfidfTerms(Tables.documents(s, d))

  /** [[t30TfidfTerms]] core over any (doc_id, text) frame. */
  private[graft] def tfidfTerms(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", expr(s"tf * ((${TFIDF_Q}L * n) div df)"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= TFIDF_K)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"),
        col("df"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t30_tfidf_terms" -> t30TfidfTerms,
    "t12_quality_dist" -> t12QualityDist,
    "t12x_quality_dist_approx" -> t12xQualityDistApprox,
    "t13_ngram_topk" -> t13NgramTopK,
    "t13x_ngram_topk_approx" -> t13xNgramTopKApprox,
    "t14_corpus_shuffle" -> t14CorpusShuffle,
    "t21_quality_bins" -> t21QualityBins,
    "t22_ppl_buckets" -> t22PplBuckets,
    "t23_dataset_card" -> t23DatasetCard,
    "c23_df_spectrum" -> c23DfSpectrum)

  override val oracle: Map[String, String] = Map(
    "t30_tfidf_terms" ->
      s"""WITH tfq AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
         |        FROM documents)
         |  WHERE term <> '' GROUP BY doc_id, term),
         |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY term),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |scored AS (
         |  SELECT tfq.doc_id, tfq.term, tfq.tf, dfreq.df,
         |         tfq.tf * ((${TFIDF_Q} * n.n) // dfreq.df) AS score
         |  FROM tfq JOIN dfreq ON tfq.term = dfreq.term CROSS JOIN n),
         |ranked AS (
         |  SELECT *, CAST(row_number() OVER
         |    (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rk
         |  FROM scored)
         |SELECT doc_id, rk, term, tf, df, score
         |FROM ranked WHERE rk <= $TFIDF_K ORDER BY doc_id, rk""".stripMargin,
    "t12_quality_dist" ->
      s"""WITH hist AS (
         |  SELECT source, CAST(round(quality * ${QFP}) AS BIGINT) AS q_fp,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM (${TextOps.qualityColsSql})
         |  WHERE quality IS NOT NULL
         |  GROUP BY 1, 2),
         |cum AS (
         |  SELECT *,
         |    SUM(cnt) OVER (PARTITION BY source ORDER BY q_fp) AS cum,
         |    SUM(cnt) OVER (PARTITION BY source) AS n
         |  FROM hist)
         |SELECT source,
         |  CAST(MAX(n) AS BIGINT) AS n_docs,
         |  MIN(q_fp) AS q_min_fp,
         |  MAX(q_fp) AS q_max_fp,
         |  CAST(SUM(q_fp * cnt) AS BIGINT) AS q_sum_fp,
         |  MAX(CASE WHEN cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum THEN q_fp END) +
         |  MAX(CASE WHEN cum - cnt < n // 2 + 1 AND n // 2 + 1 <= cum THEN q_fp END)
         |    AS q_med2_fp,
         |  CAST(SUM(q_fp * cnt) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) / ${QFP} AS q_avg,
         |  CAST(MAX(CASE WHEN cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum THEN q_fp END) +
         |       MAX(CASE WHEN cum - cnt < n // 2 + 1 AND n // 2 + 1 <= cum THEN q_fp END)
         |       AS DOUBLE) / ${2 * QFP} AS q_med
         |FROM cum GROUP BY source ORDER BY source""".stripMargin,
    "t22_ppl_buckets" ->
      s"""WITH ${TextOps.lmCtes},
         |sc0 AS (${TextOps.lmSelect}),
         |sc AS (SELECT sc0.doc_id, d.lang, sc0.lm_score
         |       FROM sc0 JOIN documents d USING (doc_id)),
         |b AS (SELECT doc_id, lang, lm_score,
         |        least(${PPL_BINS - 1},
         |              CAST(floor(lm_score * $PPL_BINS) AS BIGINT)) AS bin
         |      FROM sc),
         |h AS (SELECT lang, bin, CAST(count(*) AS BIGINT) AS ct
         |      FROM b GROUP BY lang, bin),
         |m AS (SELECT lang, bin,
         |        CASE WHEN cum <= n // 3 THEN 'tail'
         |             WHEN cum <= (2 * n) // 3 THEN 'middle'
         |             ELSE 'head' END AS ppl_bucket
         |      FROM (SELECT lang, bin,
         |              SUM(ct) OVER (PARTITION BY lang ORDER BY bin
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |              SUM(ct) OVER (PARTITION BY lang) AS n
         |            FROM h))
         |SELECT b.doc_id, b.lang, b.lm_score, b.bin, m.ppl_bucket
         |FROM b JOIN m USING (lang, bin)
         |ORDER BY doc_id""".stripMargin,
    "t23_dataset_card" ->
      s"""SELECT source, lang,
         |  CAST(2 * GROUPING(source) + GROUPING(lang) AS BIGINT) AS lvl,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(nc) AS BIGINT) AS n_chars,
         |  CAST(SUM(qfp) AS DOUBLE) / CAST(count(qfp) AS DOUBLE) /
         |    CAST($CARD_Q AS DOUBLE) AS avg_quality
         |FROM (
         |  SELECT source, lang,
         |    CAST(COALESCE(n_tok, 0) AS BIGINT) AS nt,
         |    CAST(COALESCE(n_char, 0) AS BIGINT) AS nc,
         |    CAST(floor(quality * $CARD_Q) AS BIGINT) AS qfp
         |  FROM (${TextOps.qualityColsSql}))
         |GROUP BY ROLLUP (source, lang)
         |ORDER BY lvl, source NULLS FIRST, lang NULLS FIRST""".stripMargin,
    "c23_df_spectrum" ->
      s"""WITH ng AS (
         |  SELECT DISTINCT doc_id, ${Portable.h60Sql("s")} AS sh FROM (
         |    SELECT doc_id, unnest(list_transform(range(0, len(t) - ${DF_N - 1}),
         |      i -> array_to_string(t[i + 1:i + $DF_N], ' '))) AS s
         |    FROM (SELECT doc_id, string_split_regex(text, '\\s+') t FROM documents)
         |    WHERE len(t) >= $DF_N)),
         |dfreq AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM ng GROUP BY sh)
         |SELECT df, CAST(count(*) AS BIGINT) AS n_ngrams
         |FROM dfreq GROUP BY df ORDER BY df""".stripMargin,
    "t13_ngram_topk" ->
      s"""WITH bg AS (
         |  SELECT lang, unnest(list_transform(range(0, len(t) - 1),
         |    i -> array_to_string(t[i + 1:i + 2], ' '))) AS bigram
         |  FROM (SELECT lang, string_split_regex(text, '\\s+') t FROM documents)
         |  WHERE len(t) >= 2),
         |counted AS (SELECT lang, bigram, CAST(count(*) AS BIGINT) AS ct
         |            FROM bg GROUP BY 1, 2)
         |SELECT lang, bigram, ct, rk FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY lang ORDER BY ct DESC, bigram) AS BIGINT) AS rk
         |  FROM counted)
         |WHERE rk <= $TOPK
         |ORDER BY lang, rk""".stripMargin,
    "t14_corpus_shuffle" -> {
      val skey = Portable.h60Sql("'shuffle:42:' || CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, skey, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS BIGINT) AS pos
         |FROM (SELECT doc_id, $skey AS skey, $skey % $SHARDS AS shard FROM documents)
         |ORDER BY shard, pos""".stripMargin
    },
    // t21: b_k = the ⌈n·k/4⌉-th smallest q_fp (type-1 quantile) —
    // the oracle reads it off a row_number sort (fine at oracle
    // scale; the engine reads it off the bounded histogram instead)
    "t21_quality_bins" ->
      s"""WITH q AS (
         |  SELECT doc_id, CAST(round(quality * ${QFP}) AS BIGINT) AS q_fp
         |  FROM (${TextOps.qualityColsSql})
         |  WHERE quality IS NOT NULL),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
         |s AS (SELECT q_fp, row_number() OVER (ORDER BY q_fp) AS rk FROM q),
         |b AS (SELECT
         |    max(CASE WHEN rk = (n + 3) // 4 THEN q_fp END) AS b1,
         |    max(CASE WHEN rk = (2 * n + 3) // 4 THEN q_fp END) AS b2,
         |    max(CASE WHEN rk = (3 * n + 3) // 4 THEN q_fp END) AS b3
         |  FROM s CROSS JOIN n)
         |SELECT doc_id, q_fp,
         |  CAST(1 + CAST(q_fp > b.b1 AS INT) + CAST(q_fp > b.b2 AS INT)
         |         + CAST(q_fp > b.b3 AS INT) AS BIGINT) AS bin
         |FROM q CROSS JOIN b ORDER BY doc_id""".stripMargin)
}
