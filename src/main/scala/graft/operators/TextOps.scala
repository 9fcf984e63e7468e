package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: language ID, quality scoring, token counting,
  * and rolling-hash fingerprinting. These extend the reference's
  * keyword/tokenize surface (KeywordStatsApp) to the document-corpus
  * operations a 100 TB ingest actually needs.
  *
  * All of it is single-pass, per-row, whole-stage-codegen'd column
  * arithmetic — no shuffle except the final verification ORDER BY, so
  * the operators scale linearly with input splits. No UDFs: the
  * tokenizer/scorers are built-ins (split/filter/aggregate/transform),
  * and every numeric output is engine-portable (see graft.functions
  * .Portable) so the DuckDB oracle hash-matches bit-for-bit.
  */
object TextOps extends QueryModule {

  /** Tiny per-language stopword lists for the n-gram/stopword
    * language-ID heuristic. Real deployments swap in fuller lists;
    * the classifier shape (per-language hit ratio, argmax with a
    * fixed priority order) is what matters. */
  private val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est"),
    "es" -> Seq("el", "los", "de", "y", "un", "es"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  private def toks: Column = split(col("text"), "\\s+")

  /** Per-language stopword hit-count columns (`<lang>_hits`) —
    * shared by t01 and the t25 one-pass annotator. */
  private def langHitCols: Seq[Column] = langWords.map { case (lang, words) =>
    // native codegen'd membership count — bit-identical to
    // size(filter(toks, t => array_contains(arr, t))).cast(long), which
    // paid an interpreted per-token HOF lambda on every corpus scan
    // (graft.functions.CountIn; CountInSpec pins the parity)
    call_function("graft_count_in", toks, array(words.map(lit): _*))
      .as(s"${lang}_hits")
  }

  /** Argmax-with-priority language prediction over the hit columns;
    * 'und' (undetermined) when no list hits. Earlier language in
    * `langWords` order wins ties. */
  private def predLangExpr: Column = {
    val maxHits = greatest(langWords.map { case (l, _) => col(s"${l}_hits") }: _*)
    langWords.map { case (l, _) =>
      (l, col(s"${l}_hits") === maxHits && maxHits > 0)
    }.foldLeft[Option[Column]](None) {
      case (None, (l, cond)) => Some(when(cond, l))
      case (Some(c), (l, cond)) => Some(c.when(cond, l))
    }.get.otherwise("und")
  }

  /** t01 — language ID: per-language stopword hit counts over the
    * token stream; prediction = first language (in `langWords` order)
    * with the maximal count, 'und' (undetermined) when no list hits. */
  def t01LangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(Seq(col("doc_id"), col("lang")) ++ langHitCols: _*)
      .withColumn("pred_lang", predLangExpr)
      .orderBy(col("doc_id"))

  /** Adds the quality-feature columns (n_tok, n_char, stop_hits,
    * avg_word_len, stop_ratio, len_score, quality) to a documents
    * DataFrame. Linear arithmetic only (no exp/log) so both engines
    * produce identical doubles. Shared by t02 and the corpus-curation
    * pipeline (DedupOps c08). */
  def withQualityCols(df: DataFrame): DataFrame = {
    val en = array(langWords.head._2.map(lit): _*)
    df
      .withColumn("n_tok", size(toks).cast(LongType))
      .withColumn("n_char", length(col("text")).cast(LongType))
      .withColumn("stop_hits",
        // native count_in — same interpreted-HOF swap as langHitCols;
        // this column rides EVERY quality-scored pass (16 call sites)
        call_function("graft_count_in", toks, en))
      .withColumn("avg_word_len",
        (col("n_char") - (col("n_tok") - lit(1))).cast(DoubleType) / col("n_tok").cast(DoubleType))
      .withColumn("stop_ratio", col("stop_hits").cast(DoubleType) / col("n_tok").cast(DoubleType))
      .withColumn("len_score",
        least(col("n_tok").cast(DoubleType) / lit(100.0), lit(1.0)))
      .withColumn("quality",
        least(lit(1.0), greatest(lit(0.0),
          lit(0.4) * col("len_score") + lit(3.0) * col("stop_ratio") +
            lit(0.05) * col("avg_word_len"))))
  }

  /** DuckDB twin of [[withQualityCols]] as a derived-table SQL
    * fragment over any `(doc_id, lang, source, text)` source. */
  def qualityColsSqlFrom(src: String): String = {
    val stop = hitsSql(langWords.head._2)
    s"""SELECT *,
       |  least(1.0, greatest(0.0,
       |    0.4 * len_score + 3.0 * stop_ratio + 0.05 * avg_word_len)) AS quality
       |FROM (
       |  SELECT *,
       |    CAST(n_char - (n_tok - 1) AS DOUBLE) / CAST(n_tok AS DOUBLE) AS avg_word_len,
       |    CAST(stop_hits AS DOUBLE) / CAST(n_tok AS DOUBLE) AS stop_ratio,
       |    least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) AS len_score
       |  FROM (
       |    SELECT doc_id, lang, source,
       |      CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok,
       |      CAST(length(text) AS BIGINT) AS n_char,
       |      $stop AS stop_hits
       |    FROM $src))""".stripMargin
  }

  val qualityColsSql: String = qualityColsSqlFrom("documents")

  /** t02 — quality scoring per document. */
  def t02Quality(s: SparkSession, d: String): DataFrame =
    withQualityCols(Tables.documents(s, d))
      .select(col("doc_id"), col("n_tok"), col("n_char"), col("stop_hits"),
        col("avg_word_len"), col("stop_ratio"), col("quality"))
      .orderBy(col("doc_id"))

  /** t03 — token counting: whitespace tokens and a BPE-ish regex
    * tokenization (letter runs | digit runs | single other glyph). */
  def t03TokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(toks).cast(LongType).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast(LongType).as("bpe_tokens"),
        length(col("text")).cast(LongType).as("n_char"))
      .orderBy(col("doc_id"))

  /** t03b — vocabulary-driven subword token accounting: t03's
    * regex form is a PROXY (any letter run is "a token"); real
    * pipelines account tokens against an actual tokenizer
    * vocabulary. `graft_subword_arr` (graft.functions
    * .SubwordTokenize) segments each word by deterministic greedy
    * longest-match over the fixture vocab with single-char fallback
    * — per-row, codegen'd, no shuffle, same scale shape as t03.
    * `sw_text` is the full segmented stream, so the oracle pins the
    * SEGMENTATION itself (replayed in DuckDB by a recursive CTE over
    * the distinct words with the identical vocabulary literals), not
    * just the counts. */
  def t03bSubwordTokens(s: SparkSession, d: String): DataFrame =
    subwordTokens(Tables.documents(s, d))

  /** t03b core over any (doc_id, text) frame — total over null text. */
  def subwordTokens(docs: DataFrame): DataFrame =
    docs
      .withColumn("arr", call_function("graft_subword_arr", col("text")))
      .select(
        col("doc_id"),
        // null text ⇒ 0 tokens / empty stream on BOTH sides (the
        // DuckDB twin COALESCEs the same way) — totality over a
        // corpus with null-text rows, not just the current fixture.
        coalesce(size(toks), lit(0)).cast(LongType).as("ws_tokens"),
        coalesce(size(col("arr")), lit(0)).cast(LongType).as("sw_tokens"),
        coalesce(array_join(col("arr"), " "), lit("")).as("sw_text"))
      .orderBy(col("doc_id"))

  /** t04 — document fingerprinting: rolling 8-char windows hashed
    * portably; the fingerprint is the window-hash minimum (the
    * 1-sample winnowing sketch) — identical docs ⇒ identical prints,
    * and near-identical docs usually share them. */
  def t04Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_windows",
        greatest(length(col("text")) - lit(7), lit(1)).cast(LongType))
      // native one-pass winnow (graft.functions.Winnow60): the HOF
      // form evaluated an interpreted md5 lambda per window (~len
      // per doc); the oracle keeps the list_transform twin.
      .withColumn("fp", call_function("graft_winnow60", col("text")))
      .select(col("doc_id"), col("fp"), col("n_windows"))
      .orderBy(col("doc_id"))

  /** t05 — deterministic train/valid/test split: bucket =
    * h60("split:" + doc_id) mod 100, train < 80 ≤ valid < 90 ≤ test.
    * The standard reproducible-split idiom at corpus scale: no
    * global shuffle, no stored assignment table, any engine (or
    * later rerun over 100 TB) derives the identical split per-row
    * from the portable hash. */
  def t05TrainSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket",
        Portable.h60(concat(lit("split:"), col("doc_id").cast(StringType))) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))

  /** t06 — corpus length histogram: documents and tokens per
    * 32-token bucket — the shape-of-the-corpus summary every curation
    * pass reports. One narrow pass + one small aggregation; exact. */
  def t06LengthHistogram(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tok", size(toks).cast(LongType))
      .groupBy(expr("n_tok div 32").as("bucket"))
      .agg(
        count(lit(1)).as("doc_ct"),
        sum(col("n_tok")).as("tok_sum"),
        min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"))
      // Explicit NULLS FIRST (matched in the oracle): null text ⇒ null
      // bucket, and Spark's asc default (NULLS FIRST) differs from
      // DuckDB's (NULLS LAST) — pin it so a null-text fixture can't
      // diverge the ordered compare.
      .orderBy(col("bucket").asc_nulls_first)

  /** PII patterns shared by t07's Spark and DuckDB sides. Written
    * with character classes only (no backslash escapes) so the Java
    * and RE2-family regex dialects cannot diverge on escaping, and
    * both produce the same maximal matches. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private val longNumRe = "[0-9]{7,}"

  /** t07 — PII scrub: redact emails then long digit runs (phone/id
    * numbers) before training — pure per-row regexp work, codegen'd,
    * no shuffle. The corpus text is synthetic word soup with no real
    * PII, so each doc gets a DETERMINISTIC contact line appended
    * (same construction in the oracle) — the redaction logic is then
    * actually exercised, and the md5 of the redacted text verifies
    * the full output byte-for-byte without hauling long strings
    * through the compare. */
  def t07PiiScrub(s: SparkSession, d: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact: user"), col("doc_id").cast(StringType),
      lit("@example.com tel 555"),
      lpad(col("doc_id").cast(StringType), 7, "0"))
    val redacted = regexp_replace(
      regexp_replace(aug, emailRe, "<EMAIL>"), longNumRe, "<NUM>")
    // Sort BELOW the projection (t08's lesson, applied round 14): an
    // orderBy on top makes the range partitioner's sampling pass
    // evaluate the four regexp columns a second time; sorting the
    // narrow (doc_id, text) rows first costs the same exchange, and
    // the order-preserving projection runs once.
    Tables.documents(s, d)
      .orderBy(col("doc_id"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(aug, lit(emailRe), lit(0))).cast(LongType).as("n_emails"),
        size(regexp_extract_all(aug, lit(longNumRe), lit(0))).cast(LongType).as("n_long_nums"),
        length(redacted).cast(LongType).as("redacted_len"),
        md5(redacted).as("redacted_md5"))
  }

  /** t08 — repetition/duplication quality signals (the Gopher-style
    * repetition filters): distinct-token ratio, most-frequent-token
    * fraction, and duplicate-bigram fraction. All computed per row
    * with higher-order functions over the token array — no explode,
    * no shuffle, so the operator is a narrow codegen'd pass that
    * scales with input splits. Documents are short (max ~600 chars in
    * the fixture; cap any real corpus at tokenizer time), so the
    * per-row cost is bounded.
    *
    * Sorts BEFORE the projection: orderBy on top would make the range
    * partitioner's sampling pass evaluate the expensive HOF columns a
    * second time (measured 2.4 s vs 1.0 s at sf0.1). The global Sort
    * stays below the Projects (order-preserving), so the output order
    * contract is identical. */
  def t08Repetition(s: SparkSession, d: String): DataFrame =
    repetitionCols(Tables.documents(s, d).orderBy(col("doc_id")))

  /** Core of t08 over any `(doc_id, text, …)` frame. */
  def repetitionCols(docs: DataFrame): DataFrame =
    withRepetitionFeatures(docs)
      .select(
        col("doc_id"), col("n_tok"), col("n_distinct"),
        (col("n_distinct").cast(DoubleType) / col("n_tok").cast(DoubleType))
          .as("distinct_ratio"),
        col("top_tok_ct"),
        (col("top_tok_ct").cast(DoubleType) / col("n_tok").cast(DoubleType))
          .as("top_tok_frac"),
        col("n_bigram"),
        dupBigramFracExpr.as("dup_bigram_frac"))

  /** `dup_bigram_frac` over the feature columns [[withRepetitionFeatures]]
    * adds — shared by t08's select and the t25 annotator. */
  private def dupBigramFracExpr: Column =
    when(col("n_bigram") > 0,
      col("n_dup_bigram").cast(DoubleType) / col("n_bigram").cast(DoubleType))
      .otherwise(lit(0.0))

  /** Adds the t08 repetition feature columns (toks, n_tok,
    * n_distinct, top_tok_ct, n_bigram, n_dup_bigram) WITHOUT
    * projecting — composable into wider one-pass scans (t25). All
    * five signals come from ONE fused native pass
    * ([[graft.functions.RepStats]]); the HOF formulation it replaces
    * (`aggregate(array_sort(toks), …)` for the top-token run plus a
    * `transform(sequence(…))` bigram build and `array_distinct` over
    * the built strings) was the top cold line of the whole bench and
    * the per-row tax of the t25 one-pass annotator. Null text → null
    * struct → null n_tok/n_bigram, exactly as before (the oracle's
    * list_transform(range(1, NULL)) face). */
  private def withRepetitionFeatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", toks)
      .withColumn("__rep", call_function("graft_rep_stats", col("toks")))
      .withColumn("n_tok", col("__rep.n_tok"))
      .withColumn("n_distinct", col("__rep.n_distinct"))
      .withColumn("top_tok_ct", col("__rep.top_tok_ct"))
      .withColumn("n_bigram", col("__rep.n_bigram"))
      .withColumn("n_dup_bigram", col("__rep.n_dup_bigram"))
      .drop("__rep")

  /** t25 — the ONE-PASS annotator: language ID (t01), quality score
    * (t02), winnowed fingerprint (t04), PII counts (t07's detectors
    * over the raw text), and repetition signals (t08), emitted
    * together from a SINGLE corpus scan. This is the optimization a
    * real curation pipeline runs on: at 100 TB the dominant cost of
    * the per-row signal family is the scan itself, so computing five
    * operators' signals in one projection pays one scan instead of
    * five — every expression here is codegen'd, shuffle-free, and
    * already oracle-pinned through its standalone query. The sort
    * rides BELOW the projections (t08's lesson: an orderBy on top
    * makes the range sampler evaluate the HOF columns twice). */
  def t25Annotate(s: SparkSession, d: String): DataFrame =
    withRepetitionFeatures(
      withQualityCols(Tables.documents(s, d).orderBy(col("doc_id"))))
      .select(col("*") +: langHitCols: _*)
      .withColumn("pred_lang", predLangExpr)
      .select(col("doc_id"), col("lang"), col("source"), col("pred_lang"),
        col("n_tok"), col("n_char"), col("quality"),
        call_function("graft_winnow60", col("text")).as("fp"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
          .cast(LongType).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(longNumRe), lit(0)))
          .cast(LongType).as("n_long_nums"),
        (col("n_distinct").cast(DoubleType) / col("n_tok").cast(DoubleType))
          .as("distinct_ratio"),
        (col("top_tok_ct").cast(DoubleType) / col("n_tok").cast(DoubleType))
          .as("top_tok_frac"),
        dupBigramFracExpr.as("dup_bigram_frac"))

  /** t09 — sequence packing: assign documents to fixed-size context
    * windows (2048 tokens) for training-batch construction. Packing
    * is contiguous-fill per SHARD, not global: a single global
    * cumulative sum would serialize 100 TB through one window
    * partition, so docs are first sprayed across deterministic hash
    * shards and packed independently within each — the window
    * runs shard-way parallel (shards ≈ executors·4 at scale; 8 in the
    * fixture so sf0.01 already fills multiple bins per shard) and
    * every shard's bins are reproducible from the portable hash
    * alone. A doc longer than the window spans bins (standard packed
    * pretraining layout); `bin` is where the doc STARTS. */
  def t09PackSequences(s: SparkSession, d: String): DataFrame =
    packSequences(Tables.documents(s, d), shards = 8, ctx = 2048)
      .orderBy(col("doc_id"))

  /** Core of t09 over any `(doc_id, text, …)` frame. */
  def packSequences(docs: DataFrame, shards: Int, ctx: Int): DataFrame =
    packSequencesBy(docs, shards, ctx, size(toks).cast(LongType))

  /** [[packSequences]] with the per-doc token count supplied by the
    * caller — packing is token-accounting-agnostic, so the same
    * sharded cumulative-sum layout serves whitespace counts (t09)
    * and vocab-driven subword counts (t09c) unchanged. */
  def packSequencesBy(docs: DataFrame, shards: Int, ctx: Int,
      nTok: Column): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tok", nTok)
      .withColumn("shard",
        Portable.h60(concat(lit("pack:"), col("doc_id").cast(StringType))) % shards)
      .withColumn("start_tok", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        expr(s"start_tok div $ctx").as("bin"),
        (col("start_tok") % ctx).as("tok_offset"))
  }

  /** t09b — the packed-sequence MANIFEST: one row per (doc, context
    * window) segment. A doc starting at `start_tok` with `n_tok`
    * tokens covers bins floor(start/ctx) … floor((start+n-1)/ctx);
    * each bin row carries the segment's offset within the doc and its
    * length — exactly what a packed-pretraining dataloader consumes
    * to materialize fixed-size training rows. Same sharded-window
    * scale shape as t09 plus a bounded explode (a doc spans at most
    * n_tok/ctx + 1 bins). */
  def t09bPackSpans(s: SparkSession, d: String): DataFrame =
    packSpans(Tables.documents(s, d), shards = 8, ctx = 2048)
      .orderBy(col("doc_id"), col("bin"))

  /** Core of t09b over any `(doc_id, text, …)` frame. */
  def packSpans(docs: DataFrame, shards: Int, ctx: Int): DataFrame =
    packSequences(docs, shards, ctx)
      .withColumn("start_tok", col("bin") * ctx + col("tok_offset"))
      .withColumn("bin_last", expr(s"(start_tok + n_tok - 1) div $ctx"))
      .select(col("doc_id"), col("shard"), col("n_tok"), col("start_tok"),
        explode(sequence(col("bin"), col("bin_last"))).as("bin"))
      .select(
        col("doc_id"), col("shard"), col("bin"),
        (greatest(col("start_tok"), col("bin") * ctx) - col("start_tok"))
          .as("seg_off"),
        (least(col("start_tok") + col("n_tok"), (col("bin") + 1) * ctx) -
          greatest(col("start_tok"), col("bin") * ctx)).as("seg_len"))

  /** t09c — t09's packing under the REAL token accounting: context
    * windows are budgeted in subword tokens (what a trainer actually
    * consumes), not whitespace words. Same sharded cumulative-sum
    * layout via [[packSequencesBy]]; only the count column changes —
    * packing parity under both accountings is pinned by
    * SubwordTokenizeSpec. */
  def t09cPackSubword(s: SparkSession, d: String): DataFrame =
    packSequencesBy(Tables.documents(s, d), shards = 8, ctx = 2048,
      coalesce(size(call_function("graft_subword_arr", col("text"))), lit(0))
        .cast(LongType))
      .orderBy(col("doc_id"))

  private val LM_Q = 1L << 30

  /** Core of t15 — bigram-LM quality scoring (the CCNet recipe:
    * train a language model on a REFERENCE corpus, score candidate
    * documents by how predictable their text is; low scores = noisy
    * or non-linguistic content, the standard web-crawl quality
    * filter). Model = add-one-smoothed token bigrams:
    * P(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + V), counts from `ref`;
    * a document's score is the MEAN smoothed conditional likelihood
    * over its bigrams.
    *
    * Engine-portable by construction: each bigram's likelihood is
    * quantized to fixed-point — ((c2+1)·2^30) div (c1+V), exact
    * BIGINT arithmetic — so the per-doc SUM is an integer
    * (order-independent across partial aggregation) and only the
    * final mean touches IEEE doubles via two exact divisions. A
    * float log-prob would hang the oracle on libm's last-bit
    * differences; counts and ratios cannot.
    *
    * Scale shape: the unigram/bigram count tables saturate with the
    * vocabulary (t13's argument — map-side combine collapses every
    * partition before the exchange), the scoring join is
    * corpus-rows ⋈ vocabulary-sized tables (AQE broadcasts while the
    * model fits, degrades to shuffle when not), and the per-doc
    * reduce is one keyed aggregation. The exploded bigram frame is
    * localCheckpointed because both the count build and the scoring
    * join consume it — one tokenize pass, not two (the round-5 c14
    * trade). (c2+1)·2^30 stays under 2^63 up to ~10^9 occurrences of
    * a single bigram; past that, shrink the quantization scale. */
  def lmScore(ref: DataFrame, target: DataFrame): DataFrame = {
    // fused native pair build ([[graft.functions.GramPairs]]): the
    // HOF twin paid an interpreted lambda + struct allocation per
    // token, twice per LM build (ref + target) — bit-identical rows,
    // oracle unchanged (GramPairsSpec pins the parity)
    def bigrams(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode_outer(expr("graft_gram_pairs(toks)")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val refBig = bigrams(ref).localCheckpoint()
    val uni = ref.select(explode_outer(split(col("text"), "\\s+")).as("w"))
      .where(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val v = uni.agg(count(lit(1)).as("v"))
    val c2 = refBig.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    bigrams(target)
      .join(c2, Seq("w1", "w2"), "left")
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), expr(
        // greatest(..., 1) guards the degenerate EMPTY reference
        // corpus (v = 0, c1 null): every bigram then scores the
        // smoothing ceiling 1.0 instead of dividing by zero (null
        // rows, or an error under ANSI). A non-empty ref has v ≥ 1,
        // so the guard is a no-op there and the oracle is unchanged.
        s"((coalesce(c2, 0L) + 1L) * ${LM_Q}L) div " +
          "greatest(coalesce(c1, 0L) + v, 1L)").as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("__sq"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__sq").cast(DoubleType) / col("n_bigrams").cast(DoubleType) /
          lit(LM_Q).cast(DoubleType)).as("lm_score"))
    // UNSORTED core (round-14 opt): t15's query face adds the
    // presentation sort; t22's bucket composition re-joins and
    // re-sorts, so the core's range exchange was discarded work.
  }

  /** t15 — the fixture form: the corpus self-scored (ref = target),
    * every bigram seen ≥ 1 time so smoothing only dampens. In
    * production `ref` is a held-out clean corpus (CCNet uses
    * Wikipedia) and `target` the crawl — same plan, two inputs. */
  def t15LmScore(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    lmScore(docs, docs).orderBy(col("doc_id"))
  }

  private val KN_D = 0.75   // absolute discount (the standard KN value)
  private val KN_TOP = 50   // bigrams reported (by raw count)

  /** t31 — KNESER–NEY smoothed bigram model, the LM behind
    * CCNet/RefinedWeb-style perplexity filters (t15/t22 use add-V
    * smoothing; interpolated KN is what KenLM actually fits). For
    * the KN_TOP most frequent bigrams, emit the full sufficient
    * statistics and the smoothed probability
    *
    *   P(w2|w1) = (max(c(w1w2) − D, 0) + D·N1+(w1,·)·N1+(·,w2)/B)
    *              / c(w1·)
    *
    * where N1+ are the continuation-type counts and B the number of
    * distinct bigram types (Kneser & Ney 1995; Chen & Goodman 1999
    * eq. 4.25 with the unigram back-off in its continuation form).
    *
    * Scale shape: ONE corpus pass builds the bigram stream; after
    * the (w1,w2) count — a vocabulary-saturating hash agg with
    * map-side combine (t13's argument) — every other statistic
    * derives from the COUNT TABLE, not the corpus: c(w1·) and
    * N1+(w1,·) are one agg of c2 by w1, N1+(·,w2) one agg by w2, B
    * a scalar. c2 is localCheckpointed so the three derivations and
    * the final join replay no text scan. The probability is a fixed
    * IEEE expression tree over exact BIGINTs — identical operand
    * order in both engines, so the oracle matches bit-for-bit
    * (integer statistics would survive any order; the doubles are
    * order-pinned by writing the same parse tree). */
  def t31KnLm(s: SparkSession, d: String): DataFrame =
    knLm(Tables.documents(s, d))

  /** [[t31KnLm]] core over any frame with a `text` column. Tokens
    * are the NON-EMPTY whitespace splits (t32's convention — a
    * leading-whitespace document must not inject "" into the
    * vocabulary); the oracle applies the identical list_filter. */
  private[graft] def knLm(docs: DataFrame): DataFrame = {
    val big = docs
      .select(filter(split(col("text"), "\\s+"), x => x =!= "").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(explode(expr("graft_gram_pairs(toks)")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2")).localCheckpoint()
    val hist = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1r"))
    val cont = c2.groupBy(col("w2")).agg(count(lit(1)).as("n1l"))
    val btot = c2.agg(count(lit(1)).as("bt"))
    c2.join(hist, "w1").join(cont, "w2").crossJoin(broadcast(btot))
      .select(col("w1"), col("w2"), col("c2"), col("c1"),
        col("n1r"), col("n1l"),
        ((greatest(col("c2").cast(DoubleType) - lit(KN_D), lit(0.0)) +
          lit(KN_D) * col("n1r").cast(DoubleType) * col("n1l").cast(DoubleType) /
            col("bt").cast(DoubleType)) /
          col("c1").cast(DoubleType)).as("p_kn"))
      .orderBy(col("c2").desc, col("w1"), col("w2"))
      .limit(KN_TOP)
  }

  private val DRIFT_TOP = 50 // drifted tokens reported

  /** t32 — VOCABULARY DRIFT between two corpus snapshots (fixture:
    * even/odd doc_id halves; production: yesterday's ingest vs
    * today's): the tokens whose frequency SHARE moved most. The
    * monitoring panel every running ingest needs — a crawler source
    * gone spammy, a language mix shift, boilerplate flooding in —
    * all appear here before they hurt a trained model.
    *
    * Drift is ranked by |cA·totB − cB·totA| — the share difference
    * cross-multiplied into EXACT integer form, so the ordering (and
    * the reported statistic) is engine-portable with no float
    * comparison anywhere; the double shares are emitted for human
    * eyes only, each one division of exact BIGINTs. (Magnitude
    * bound: token count × corpus total < 2^63 up to ~3·10^9-token
    * snapshots with million-count tokens; at the 100 TB point,
    * rescale counts to per-2^20 shares first — same integer
    * discipline, documented rather than silent.)
    *
    * Scale shape: ONE corpus pass with a conditional aggregation
    * per snapshot — no self-join, no full-outer join of two count
    * tables; the (token → cA, cB) table saturates with vocabulary
    * (t13's argument) and is localCheckpointed, the totals derive
    * from IT, and top-K compiles to TakeOrdered. */
  def t32VocabDrift(s: SparkSession, d: String): DataFrame =
    vocabDrift(Tables.documents(s, d))

  /** [[t32VocabDrift]] core over any (doc_id, text) frame. */
  private[graft] def vocabDrift(docs: DataFrame): DataFrame = {
    val counts = docs
      .select((col("doc_id") % 2 === 0).as("in_a"),
        explode_outer(split(col("text"), "\\s+")).as("w"))
      .where(col("w").isNotNull && col("w") =!= "")
      .groupBy(col("w"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))
      .localCheckpoint()
    val tot = counts.agg(sum(col("c_a")).as("tot_a"), sum(col("c_b")).as("tot_b"))
    counts.crossJoin(broadcast(tot))
      .select(col("w"), col("c_a"), col("c_b"),
        abs(col("c_a") * col("tot_b") - col("c_b") * col("tot_a")).as("drift"),
        (col("c_a").cast(DoubleType) / col("tot_a").cast(DoubleType)).as("share_a"),
        (col("c_b").cast(DoubleType) / col("tot_b").cast(DoubleType)).as("share_b"))
      .orderBy(col("drift").desc, col("w"))
      .limit(DRIFT_TOP)
  }

  /** t18 — tokenizer FERTILITY by language: subword-per-word ratio
    * of the t03b tokenizer over each language slice (plus doc and
    * token totals). Fertility is the standard vocabulary-fit
    * diagnostic — a language whose fertility is far above the
    * corpus mean is under-served by the vocab and will waste context
    * window; pipelines read this table before fixing a token budget.
    * One narrow pass (both counts are per-row codegen'd expressions,
    * t03's shape) + one lang-keyed aggregation; the final ratio is a
    * double division of exact BIGINT sums, so the oracle reproduces
    * it bit-for-bit. */
  def t18Fertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        coalesce(size(toks), lit(0)).cast(LongType).as("ws"),
        coalesce(size(call_function("graft_subword_arr", col("text"))), lit(0))
          .cast(LongType).as("sw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"),
        sum(col("sw")).as("sw_tokens"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("sw_tokens"),
        (col("sw_tokens").cast(DoubleType) / col("ws_tokens").cast(DoubleType))
          .as("fertility"))
      .orderBy(col("lang"))

  private val MERGES = 50 // t20 merge candidates reported per iteration

  /** t20 — one BPE/WordPiece TRAINING iteration at corpus scale: the
    * frequency table of ADJACENT SUBWORD PAIRS under the current
    * vocabulary, i.e. exactly the statistic whose argmax becomes the
    * next merge rule (Sennrich et al. 2016 §3.2). The engine-side
    * trick is the one every real BPE trainer uses: first collapse
    * the corpus to its WORD-FREQUENCY DICT (a vocabulary-saturating
    * aggregation — partial agg collapses each partition to its local
    * vocabulary, the same argument as t13), then segment and
    * pair-count only DISTINCT words weighted by their counts — pair
    * work is proportional to the vocabulary, not the corpus, and
    * every later iteration would rescan only the dict. Pairs never
    * cross word boundaries (merges are intra-word), which is why
    * segmentation runs per word and not on the flat t03b stream.
    * Top-MERGES by frequency compiles to TakeOrderedAndProject — a
    * per-partition heap + driver merge, no global sort, no single
    * reducer. Ties broken by pair text for determinism. */
  def t20BpePairs(s: SparkSession, d: String): DataFrame = {
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    wc
      .withColumn("toks", call_function("graft_subword_arr", col("w")))
      .where(size(col("toks")) >= 2)
      .select(col("wc"), explode(expr("graft_gram_pairs(toks)")).as("p"))
      .groupBy(col("p.w1").as("a"), col("p.w2").as("b"))
      .agg(sum(col("wc")).as("freq"))
      .orderBy(col("freq").desc, col("a"), col("b"))
      .limit(MERGES)
  }

  private val DSIR_B = 4096     // hashed-bigram feature buckets
  private val DSIR_KEEP = 100   // kept docs per language stratum
  private val DSIR_TARGET = "en"

  /** t17 — DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"):
    * score every document by how target-like its hashed-bigram
    * feature distribution is — the ratio of a TARGET model to the
    * RAW-corpus model — and keep the top documents per stratum.
    * Here the target distribution is the corpus's `en` slice and the
    * raw model the whole corpus; in production the target is a small
    * clean corpus and raw the crawl — same plan, two inputs.
    *
    * Engine-portable by the t15 trade: each feature's target/raw
    * ratio is quantized to fixed point — ((ct+1)·2^30) div (cr+1),
    * exact BIGINT — so the per-doc SUM is an integer and only the
    * final mean touches doubles via exact divisions. (The corpus-
    * level normalizers (N_target+B)/(N_raw+B) are constant across
    * documents and features, so dropping them preserves every
    * ranking the resample reads.)
    *
    * Scale shape: ONE tokenize+hash pass (localCheckpoint — the
    * shared-scan pattern) feeds both count builds and the scoring
    * join; both models saturate at B = 4096 rows (map-side
    * combine collapses each partition before the exchange, t13's
    * argument), so the scoring join is corpus ⋈ two broadcast-sized
    * tables; the per-language quota is t16's WindowGroupLimit
    * partial top-k — no global sort anywhere. */
  def t17DsirSample(s: SparkSession, d: String): DataFrame =
    dsirSample(Tables.documents(s, d), DSIR_TARGET, DSIR_KEEP)

  /** The hashed-bigram feature stream of a (doc_id, lang, text)
    * frame: one row per bigram occurrence, bucketed to [[DSIR_B]]. */
  private[operators] def dsirFeatures(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("lang"), split(col("text"), "\\s+").as("toks"))
    .where(size(col("toks")) >= 2)
    // explode_outer: plain explode would infer a size>0 scan filter
    // that re-derives the bigram transform (see c23); the size>=2
    // guard above already makes the array non-empty. The fused native
    // bigram kernel replaces the per-token interpreted lambda —
    // identical output: split tokens never hold nulls or spaces, so
    // concat(a,' ',b) ≡ the kernel's concat_ws join (GramsSpec).
    .select(col("doc_id"), col("lang"),
      explode_outer(expr("graft_grams(toks, 2)")).as("bg"))
    .select(col("doc_id"), col("lang"),
      (call_function("graft_h60", concat(lit("dsir:"), col("bg"))) % DSIR_B)
        .as("b"))

  /** t17's scoring face: per-doc mean quantized target/raw ratio,
    * no quota — [[dsirSample]] adds the per-stratum keep, and the
    * streaming ingest twin scores against a FROZEN model instead. */
  def dsirScores(docs: DataFrame, targetLang: String): DataFrame = {
    val big = dsirFeatures(docs).localCheckpoint()
    val tgt = big.filter(col("lang") === targetLang)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rawm = big.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    big
      .join(rawm, "b")
      .join(tgt, Seq("b"), "left")
      .select(col("doc_id"), col("lang"),
        expr(s"((coalesce(ct, 0L) + 1L) * ${LM_Q}L) div (cr + 1L)").as("q1"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_big"), sum(col("q1")).as("__sq"))
      .select(col("doc_id"), col("lang"), col("n_big"),
        (col("__sq").cast(DoubleType) / col("n_big").cast(DoubleType) /
          lit(LM_Q).cast(DoubleType)).as("dsir_score"))
  }

  /** t17 core over any (doc_id, lang, text) frame. */
  def dsirSample(docs: DataFrame, targetLang: String, keep: Int): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
    dsirScores(docs, targetLang)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= keep)
      .orderBy(col("lang"), col("rk"))
  }

  /** The frozen DSIR model as a dense bucket→quantized-ratio table
    * (DSIR_B longs, driver-held): ratio[b] = ((ct+1)·2^30) div
    * (cr+1) with counts from `corpus`; buckets the corpus never
    * produced score the no-evidence ceiling 2^30 (ct = cr = 0) —
    * lmScore's empty-reference convention. Bounded collect: one row
    * per OCCUPIED bucket (≤ DSIR_B = 4096). */
  def dsirModel(corpus: DataFrame, targetLang: String): Seq[Long] = {
    val big = dsirFeatures(corpus).localCheckpoint()
    val counts = big
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        count(when(col("lang") === targetLang, 1)).as("ct"))
      .collect()
      .map(r => (r.getLong(0).toInt, (r.getLong(2), r.getLong(1)))).toMap
    Seq.tabulate(DSIR_B) { b =>
      val (ct, cr) = counts.getOrElse(b, (0L, 0L))
      ((ct + 1L) * LM_Q) / (cr + 1L)
    }
  }

  /** Score (doc_id, lang, text) rows against a FROZEN [[dsirModel]]
    * table: ONE narrow projection — tokenize, hash, fold the dense
    * ratio table — no joins, no shuffle, so it is safe per micro-batch
    * in a streaming ingest gate. Docs with < 2 tokens carry no
    * features and are dropped, the batch face's convention. Scores
    * are EXACTLY the batch scores when the model was built over a
    * corpus containing the doc (integer fold, same divisions). */
  def dsirScoreAgainst(docs: DataFrame, model: Seq[Long]): DataFrame = {
    require(model.length == DSIR_B, s"model must have $DSIR_B buckets")
    val ratio = typedLit(model)
    docs
      .withColumn("__toks", split(col("text"), "\\s+"))
      .where(size(col("__toks")) >= 2)
      .withColumn("__bs", transform(
        sequence(lit(0), size(col("__toks")) - 2),
        i => call_function("graft_h60", concat(lit("dsir:"),
          element_at(col("__toks"), i + 1), lit(" "),
          element_at(col("__toks"), i + 2))) % DSIR_B))
      .select(col("doc_id"), col("lang"),
        size(col("__bs")).cast(LongType).as("n_big"),
        (aggregate(col("__bs"), lit(0L), (acc, b) =>
          acc + element_at(ratio, (b + 1).cast(IntegerType)))
          .cast(DoubleType) /
          size(col("__bs")).cast(DoubleType) /
          lit(LM_Q).cast(DoubleType)).as("dsir_score"))
  }

  /** Per-language mixing rates for t10 as (lang, whole-epoch copies,
    * fractional-part threshold out of 10000): en 0.5×, de 1.0×,
    * fr 0.25×, es 1.5×, zh 2.5×. Integer thresholds keep the
    * sampling decision float-free and portable across engines. */
  private val mixRates: Seq[(String, Int, Int)] = Seq(
    ("en", 0, 5000), ("de", 1, 0), ("fr", 0, 2500), ("es", 1, 5000), ("zh", 2, 5000))

  /** t10 — deterministic stratified mixing: each document is emitted
    * `copies` times where copies = floor(rate) + Bernoulli(frac(rate))
    * decided by the portable hash — the standard "epochs per source"
    * data-mixing op (downsample rate<1, upsample rate>1). No shuffle:
    * the decision is per-row arithmetic and the fan-out is a bounded
    * explode; any engine recomputes the identical mix from doc_id
    * alone (same property as t05's split). */
  def t10MixSample(s: SparkSession, d: String): DataFrame =
    mixSample(Tables.documents(s, d), mixRates)
      .orderBy(col("doc_id"), col("epoch"))

  /** Core of t10 over any `(doc_id, lang, …)` frame; `rates` rows are
    * (lang, whole copies, fractional threshold / 10000). */
  def mixSample(docs: DataFrame, rates: Seq[(String, Int, Int)]): DataFrame = {
    // default for an unlisted language is rate 1.0× exactly: base 1,
    // threshold 0 (a shared default of 1 for both would give unlisted
    // docs a 1-in-10000 chance of a second copy)
    def chain(f: ((String, Int, Int)) => Int, default: Int): Column =
      rates.tail.foldLeft(
        when(col("lang") === rates.head._1, f(rates.head))) {
        case (c, r) => c.when(col("lang") === r._1, f(r))
      }.otherwise(default)
    docs
      .withColumn("roll",
        Portable.h60(concat(lit("mix:"), col("doc_id").cast(StringType))) % 10000)
      .withColumn("copies",
        (chain(_._2, 1) + when(col("roll") < chain(_._3, 0), 1).otherwise(0)).cast(LongType))
      .filter(col("copies") >= 1)
      .select(col("doc_id"), col("lang"), col("copies"),
        explode(sequence(lit(1L), col("copies"))).as("epoch"))
  }

  /** t24 — TEMPERATURE-scaled language rebalancing (the mT5/XLM-R
    * mixing rule): sampling weight per language ∝ p_l^α with α = ½,
    * normalized so the expected emitted volume stays ≈ the corpus
    * size, then fed through [[mixSample]]'s per-row copies decision.
    * Minority languages are upsampled, majority languages downsampled
    * — rate_l = √n_l · N / (Σ√n · n_l) is decreasing in n_l.
    *
    * α is fixed at ½ because `sqrt` is IEEE-754 correctly rounded in
    * every engine while `pow(x, α)` is not — the rate table (and so
    * the whole mix) stays bit-portable. The rate derivation is a
    * bounded collect (one row per language, the anchorVectors
    * pattern); the mix itself is t10's shape — per-row hash decision
    * + bounded explode, no shuffle. */
  def t24TemperatureMix(s: SparkSession, d: String): DataFrame =
    mixSample(Tables.documents(s, d).filter(col("lang").isNotNull),
      temperatureRates(Tables.documents(s, d)))
      .orderBy(col("doc_id"), col("epoch"))

  /** Per-language (copies, threshold/10000) rows for α=½ temperature
    * mixing. Every double op is ordered exactly like the DuckDB twin:
    * Σ√n folds language-ascending from a 0.0 seed, and each rate is
    * (√n_l · N) / (Σ√n · n_l) with that parenthesization. */
  def temperatureRates(docs: DataFrame): Seq[(String, Int, Int)] = {
    val counts = docs.filter(col("lang").isNotNull)
      .groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val n = counts.map(_._2).sum.toDouble
    val roots = counts.map { case (_, nl) => math.sqrt(nl.toDouble) }
    val stot = roots.foldLeft(0.0)(_ + _)
    counts.zip(roots).map { case ((l, nl), sl) =>
      val r = (sl * n) / (stot * nl.toDouble)
      val base = math.floor(r)
      val thr = math.floor((r - base) * 10000.0)
      (l, base.toInt, thr.toInt)
    }
  }

  /** t35 sample size. At sf0.001 the corpus is smaller than K (the
    * sample degenerates to the full corpus, still deterministic);
    * sf0.01/sf0.1 exercise the real top-K path. */
  private val WSAMP_K = 200

  /** t35 — EXACT-SIZE weighted sample without replacement: draw
    * [[WSAMP_K]] documents with inclusion probability approximately
    * proportional to token count — sequential Poisson sampling
    * (Ohlsson 1998, the order-πps estimator family; Rosén's Pareto
    * variant differs only in the priority transform). Each document
    * gets priority q = u / w with u uniform from the portable hash
    * and w its token weight; the K smallest priorities form the
    * sample. Unlike t10/t24 (per-row rate decisions → binomial
    * sample SIZE), the draw here is exactly K documents — what a
    * fixed annotation/eval budget needs ("label exactly 200 docs,
    * prefer big ones").
    *
    * Engine portability: u = (h60+1) and w are int64; both engines
    * cast each to DOUBLE (exactly-rounded IEEE conversion — h60
    * exceeds 2^53 but rounds identically) and divide once, so the
    * priority — and therefore the sample — is bit-identical and the
    * oracle replays the whole draw. Ties break on doc_id.
    *
    * Scale shape: ONE narrow scan computes (w, priority); the global
    * top-K compiles to TakeOrderedAndProject — every partition
    * forwards at most K rows and no global sort ever runs (pinned in
    * PlanShapeSpec). Shuffle volume is K·partitions rows of keys,
    * independent of corpus size. */
  def t35WeightedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        greatest(coalesce(size(toks).cast(LongType), lit(0L)), lit(1L))
          .as("w_tok"))
      .withColumn("priority",
        (Portable.h60(concat(lit("wsamp:"), col("doc_id").cast(StringType)))
          + lit(1L)).cast(DoubleType) / col("w_tok").cast(DoubleType))
      .orderBy(col("priority"), col("doc_id"))
      .limit(WSAMP_K)

  /** t36 knobs: spend half the corpus' tokens, repeat-cap any
    * language at 2.5 epochs, and unroll exactly [[MIX_ROUNDS]]
    * water-filling rounds (≥ #languages + 1 ⇒ the capped-set fixed
    * point is always reached; extra rounds are no-ops because each
    * round recomputes the set from scratch). */
  private val MIX_BUDGET_DEN = 2L
  private val MIX_CAP_X1000 = 2500L
  private val MIX_ROUNDS = 6

  /** t36 target weights — the zh-centric rebalancing scenario: the
    * smallest language family is upweighted toward majority share,
    * which its 2.5-epoch repeat cap cannot meet, so the fixture
    * exercises the cap-and-redistribute path on real data (a uniform
    * target never caps when every language holds ≥ 1/(2.5·n) of the
    * corpus). Unlisted languages default to weight 1. */
  private val mixWeights: Map[String, Long] = Map("zh" -> 20L)
  private def mixWeight(lang: String): Long = mixWeights.getOrElse(lang, 1L)

  /** t36 — token-BUDGET mix plan with repeat caps (water-filling):
    * given a token budget B = total/2 and a uniform per-language
    * target, compute each language's token allocation subject to the
    * cap "no language repeats beyond 2.5 epochs" and redistribute
    * what capped languages can't absorb to the rest — the static
    * mixing computation behind DoReMi-style domain reweighting and
    * every "epochs per domain" table in a pretraining data card.
    * t24 answers "what rates rebalance languages"; t36 answers "what
    * does each language actually get under a hard budget AND repeat
    * caps" — the two compose (plan here, emit with t10's mixSample).
    *
    * Water-filling as a monotone fixed point: round k recomputes the
    * capped set from scratch against ideal_k = ⌊rb_k / na_k⌋ where
    * rb_k/na_k exclude the previously capped languages. Removing
    * below-average caps never lowers the floor-average, so the set
    * grows monotonically and stabilizes within #languages rounds;
    * both engines run the identical [[MIX_ROUNDS]]-round unroll
    * (idempotent once stable), keeping every division an int64
    * floor — no float anywhere, bit-portable. Bounds: alloc·1000 and
    * nt·[[MIX_CAP_X1000]] stay under int64 while the corpus holds
    * < ~3.7e15 tokens — ample at 100 TB (~2.5e13).
    *
    * Scale shape: ONE corpus scan (the per-language token sum, map-
    * side combined); the fixed point runs on the collected language
    * table — bounded by language cardinality (t24's rate-table
    * pattern), a few dozen rows at web scale. The driver loop exits
    * on the fixed point and asserts it converged within the same
    * [[MIX_ROUNDS]] the oracle unrolls. */
  def t36MixPlan(s: SparkSession, d: String): DataFrame =
    mixPlanOfDocs(s, Tables.documents(s, d))

  /** [[t36MixPlan]] over any documents-shaped frame (s07's release
    * report plans the mix from a snapshot read). */
  private[graft] def mixPlanOfDocs(s: SparkSession, docs: DataFrame): DataFrame = {
    // bounded collect: one row per language (documented bound above)
    val counts = docs.filter(col("lang").isNotNull)
      .groupBy(col("lang"))
      .agg(sum(coalesce(size(toks), lit(0))).cast(LongType).as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    mixPlanOf(s, counts)
  }

  /** t36's water-fill over an arbitrary (lang, token-count) table
    * (spec surface — the fixed point and its accounting identities
    * are exercised on crafted multi-round cascades). Capping is
    * decided by integer cross-multiplication (cap·W ≤ rb·w — no
    * division in the decision); only the final uncapped share
    * divides, floored identically in the oracle. */
  private[operators] def mixPlanOf(s: SparkSession,
      counts: Seq[(String, Long)]): DataFrame = {
    val budget = counts.map(_._2).sum / MIX_BUDGET_DEN
    val caps = counts.map { case (l, nt) =>
      (l, mixWeight(l), nt, nt * MIX_CAP_X1000 / 1000L) }
    var capped = Set.empty[String]
    var stable = false
    var rounds = 0
    while (!stable && rounds < MIX_ROUNDS) {
      rounds += 1
      val rb = budget - caps.collect { case (l, _, _, c) if capped(l) => c }.sum
      val wa = caps.collect { case (l, w, _, _) if !capped(l) => w }.sum
      val next = caps.collect {
        case (l, w, _, c) if c * wa <= rb * w => l }.toSet
      stable = next == capped
      capped = next
    }
    require(stable, s"t36 water-fill unconverged after $MIX_ROUNDS rounds " +
      s"(${caps.length} languages) — raise MIX_ROUNDS with the oracle unroll")
    val rbF = budget - caps.collect { case (l, _, _, c) if capped(l) => c }.sum
    val waF = caps.collect { case (l, w, _, _) if !capped(l) => w }.sum
    val rows = caps.map { case (l, w, nt, cap) =>
      val alloc = if (capped(l)) cap else if (waF == 0) 0L else rbF * w / waF
      val ep = if (nt == 0) 0L else alloc * 1000L / nt
      (l, w, nt, cap, alloc, ep, if (capped(l)) 1L else 0L)
    }
    import s.implicits._
    rows.toDF("lang", "weight", "n_tok", "cap_tok", "alloc_tok",
      "epochs_x1000", "capped")
      .orderBy(col("lang"))
  }

  /** The t36 oracle: the identical [[MIX_ROUNDS]]-round unroll as
    * chained MATERIALIZED CTEs — round k's one-row (rb, na) state
    * CTE `s k` derives from round k−1's flags, and the flag CTE
    * `k k` recomputes the capped set from scratch against it.
    * MATERIALIZED is load-bearing: inlined, the chain re-expands the
    * whole prefix per reference and the plan blows up exponentially
    * in the round count. The na=0 corner (everything capped) keeps
    * flags true via the COALESCE-to-own-cap comparison. */
  private def t36Sql: String = {
    val wCase = mixWeights.toSeq.sortBy(_._1)
      .map { case (l, w) => s"WHEN '$l' THEN CAST($w AS BIGINT)" }
      .mkString("CASE lang ", " ", " ELSE CAST(1 AS BIGINT) END")
    val scalarCte = (from: String) =>
      s"""  SELECT CAST((SELECT b FROM tot)
         |           - COALESCE(SUM(CASE WHEN cp THEN cap END), 0) AS BIGINT) AS rb,
         |         CAST(COALESCE(SUM(CASE WHEN NOT cp THEN w END), 0) AS BIGINT) AS wa
         |  FROM $from""".stripMargin
    val base =
      s"""base AS MATERIALIZED (
         |  SELECT lang, $wCase AS w, nt, nt * $MIX_CAP_X1000 // 1000 AS cap
         |  FROM (SELECT lang,
         |          CAST(SUM(COALESCE(len(string_split_regex(text, '\\s+')), 0))
         |            AS BIGINT) AS nt
         |        FROM documents WHERE lang IS NOT NULL GROUP BY lang)),
         |tot AS MATERIALIZED (
         |  SELECT CAST(SUM(nt) // $MIX_BUDGET_DEN AS BIGINT) AS b FROM base),
         |k0 AS MATERIALIZED (SELECT lang, w, nt, cap, FALSE AS cp FROM base)""".stripMargin
    val rounds = (1 to MIX_ROUNDS).map { k =>
      s"""s$k AS MATERIALIZED (
         |${scalarCte(s"k${k - 1}")}),
         |k$k AS MATERIALIZED (
         |  SELECT lang, w, nt, cap,
         |    cap * (SELECT wa FROM s$k) <= (SELECT rb FROM s$k) * w AS cp
         |  FROM base)""".stripMargin
    }
    val fin = MIX_ROUNDS + 1
    val idealF = s"COALESCE((SELECT rb FROM s$fin) * w" +
      s" // NULLIF((SELECT wa FROM s$fin), 0), 0)"
    s"""WITH $base,
       |${rounds.mkString(",\n")},
       |s$fin AS MATERIALIZED (
       |${scalarCte(s"k$MIX_ROUNDS")})
       |SELECT lang, w AS weight, nt AS n_tok, cap AS cap_tok,
       |  CASE WHEN cp THEN cap ELSE $idealF END AS alloc_tok,
       |  CASE WHEN nt = 0 THEN 0 ELSE
       |    (CASE WHEN cp THEN cap ELSE $idealF END) * 1000 // nt
       |  END AS epochs_x1000,
       |  CAST(cp AS BIGINT) AS capped
       |FROM k$MIX_ROUNDS ORDER BY lang""".stripMargin
  }

  /** Merge rounds for t26 (production raises this to the target
    * vocabulary size; the loop shape is identical). */
  private val BPE_ROUNDS = 8

  /** t26 — BPE tokenizer TRAINING (Sennrich et al. 2016): learn the
    * first [[BPE_ROUNDS]] merge rules from the corpus, starting at
    * character level. Each round counts adjacent-pair frequencies
    * over the CURRENT segmentation (weighted by word frequency),
    * adopts the most frequent pair (ties broken lexicographically —
    * fully deterministic), and re-segments by merging that pair's
    * non-overlapping occurrences left-to-right.
    *
    * Scale stance — the reason this belongs on a 100 TB engine: the
    * corpus is scanned ONCE (the word count); every training round
    * then runs over the DISTINCT-WORD table, which is bounded by the
    * language's vocabulary, not the corpus (Heaps' law: ~10^6-10^7
    * rows at web scale). Per round: one pair aggregation over that
    * bounded table (map-side combine) + a 1-row collect — the same
    * driver-bounded loop discipline as c10's label propagation and
    * c12's Lloyd step. Re-segmentation is a per-row array fold, no
    * shuffle.
    *
    * Oracle: the merge recurrence (round r's counts depend on round
    * r−1's winner) unrolls into [[BPE_ROUNDS]] chained MATERIALIZED
    * CTEs with a closed form for the greedy left-to-right merge (see
    * [[bpeTaken]]) — full DuckDB row/hash checking, plus
    * BpeLearnSpec's independent in-memory reference. */
  def t26BpeLearn(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("wc"), expr(
        "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))")
        .as("toks"))
    bpeLearn(s, words, BPE_ROUNDS)
  }

  /** Core of t26: `words0` = (wc, toks) over the distinct-word
    * table; emits (rank, a, b, freq) — the learned merge table. */
  private[graft] def bpeLearn(s: SparkSession, words0: DataFrame,
      rounds: Int): DataFrame = {
    import scala.collection.mutable.ArrayBuffer
    // LAZY checkpoints (round-14 opt, the graph-loop pattern): each
    // round's top-1 collect is the materializing action for the
    // CURRENT word table, so the eager checkpoint's dedicated
    // materialize-only job per round fuses away — and the final
    // round's re-segmentation (whose output nothing reads) is never
    // computed at all. A superseded round's blocks are freed only
    // AFTER the next table materializes (the collect below), since
    // the lazy next's lineage is truncated at the superseded frame.
    var words = words0.localCheckpoint(false)
    var prev: Option[DataFrame] = None
    val merges = ArrayBuffer[(Long, String, String, Long)]()
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val top = words
        .where(size(col("toks")) >= 2)
        .select(col("wc"), explode(expr("graft_gram_pairs(toks)")).as("p"))
        .groupBy(col("p.w1").as("a"), col("p.w2").as("b"))
        .agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("a"), col("b"))
        .limit(1).collect()
      // `words` is materialized now — the previous round's blocks
      // have no further reader
      prev.foreach(DedupOps.freeCheckpoint)
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r + 1L, a, b, f))
        // merge non-overlapping (a, b) occurrences left-to-right:
        // fold rebuilds the token array, replacing a trailing `a`
        // when `b` arrives; the merged token never re-merges within
        // the same round (its VALUE a||b no longer equals `a`).
        val folded = aggregate(col("toks"),
          array().cast(ArrayType(StringType)),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(lit(a), lit(b)))))
            .otherwise(concat(acc, array(x))))
        val next = words.select(col("wc"), folded.as("toks"))
          .localCheckpoint(false)
        prev = Some(words)
        words = next
        r += 1
      }
    }
    import s.implicits._
    // the merge table is already driver-side — the last round's
    // word-table blocks have no further reader
    prev.foreach(DedupOps.freeCheckpoint)
    DedupOps.freeCheckpoint(words)
    merges.toSeq.toDF("rank", "a", "b", "freq")
      .orderBy(col("rank"))
  }

  /** t27 — APPLY the learned BPE tokenizer: segment every document
    * with t26's merge table, in rank order (the standard two-phase
    * tokenizer lifecycle: train once on a sample, apply everywhere —
    * the merge table is PERSISTED behind a corpus-drift token via
    * [[buildBpeModel]], so repeat applies never pay the training
    * scan). The merge table is driver-bounded (R rows) and compiles into R
    * chained per-row folds over each word's character array — one
    * narrow codegen-free-but-shuffle-free pass; the corpus is
    * touched once. Emits per doc: subword count under the learned
    * vocabulary, whitespace-word count, and the fertility ratio —
    * the end-to-end answer to "did training help" (compare against
    * t18's fixed-vocab fertility). Oracle: replays the t26 unroll and
    * segments the distinct-word table with round 8's token lists
    * (same closed-form merge), joined back onto occurrences —
    * DuckDB-checked like every other t row, with BpeLearnSpec's
    * independent reference on top. */
  def t27BpeApply(s: SparkSession, d: String): DataFrame = {
    val (mT, metaT) = bpeTables(d)
    def token(): Option[String] =
      if (!s.catalog.tableExists(metaT)) None
      else s.table(metaT).collect().headOption.map(_.getString(0))
    if (!token().contains(ScaleOps.corpusToken(s, d, "documents.parquet")))
      buildBpeModel(s, d)
    val merges = s.table(mT).orderBy(col("rank"))
      .select(col("a"), col("b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    bpeApply(Tables.documents(s, d), merges)
  }

  private def bpeTables(d: String): (String, String) = {
    val tag = Integer.toHexString(d.hashCode)
    (s"graft_bpe_merges_$tag", s"graft_bpe_meta_$tag")
  }

  /** Persist t26's learned merge table behind a corpus-drift token —
    * the c13b/c22c build-once lifecycle applied to the tokenizer:
    * training (one corpus scan + R rounds over the Heaps-bounded word
    * table) runs ONCE per corpus version; every later t27 apply reads
    * the R-row merge table and pays only the apply cost. The token is
    * the corpus file listing (ScaleOps.corpusToken), so a regenerated
    * corpus triggers retrain instead of a silently stale tokenizer. */
  def buildBpeModel(s: SparkSession, d: String): Unit = {
    val (mT, metaT) = bpeTables(d)
    Seq(mT, metaT).foreach(ScaleOps.dropStale(s, _))
    t26BpeLearn(s, d).write.mode("overwrite").format("parquet").saveAsTable(mT)
    s.createDataFrame(Seq(Tuple1(ScaleOps.corpusToken(s, d, "documents.parquet"))))
      .toDF("token").write.mode("overwrite").format("parquet").saveAsTable(metaT)
  }

  /** Core of t27: segment `docs` by `merges` (in order). */
  private[graft] def bpeApply(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    def mergeFold(toksCol: Column, a: String, b: String): Column =
      aggregate(toksCol, array().cast(ArrayType(StringType)),
        (acc, x) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(lit(a), lit(b)))))
          .otherwise(concat(acc, array(x))))
    val chars = expr(
      "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))")
    val seg = merges.foldLeft(chars) { case (c, (a, b)) => mergeFold(c, a, b) }
    // Segment the DISTINCT-WORD table (vocabulary-bound — the t03b
    // oracle's trick), then join counts back onto occurrences: the
    // R-fold chain runs |vocab| times, not once per token occurrence.
    val words = docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "")
    val wn = words.select(col("w")).distinct()
      .select(col("w"), size(seg).cast(LongType).as("n_sub"))
    words.join(wn, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ws_tokens"), sum(col("n_sub")).as("bpe_tokens"))
      .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"),
        (col("bpe_tokens").cast(DoubleType) / col("ws_tokens").cast(DoubleType))
          .as("fertility"))
      .orderBy(col("doc_id"))
  }

  /** The t26/t27 oracle: the identical [[BPE_ROUNDS]]-round merge
    * recurrence as chained MATERIALIZED CTEs (the t36 unroll
    * discipline) — round k's one-row winner CTE `m k` is the
    * freq-then-lex top pair over round k−1's segmentation, and `w k`
    * re-segments by merging that pair's non-overlapping occurrences
    * left-to-right. The sequential greedy merge has a CLOSED FORM the
    * SQL can evaluate per position: a candidate (toks[i]=a,
    * toks[i+1]=b) is taken iff a≠b (candidates can then never be
    * adjacent, so greedy takes all) or its offset into the maximal
    * run of `a`s ending the candidate chain is even (greedy takes
    * every other candidate of an aa…a run) — bit-identical to the
    * fold, which is what lets t26/t27 graduate from spec-pinned
    * no-oracle rows to full DuckDB-checked rows. */
  private def bpeTaken(i: String, a: String, b: String): String =
    s"($i < len(toks) AND toks[$i] = $a AND toks[$i+1] = $b " +
      s"AND ($a <> $b OR ($i - (1 + coalesce(list_max(" +
      s"list_filter(range(1, $i), j -> toks[j] <> $a)), 0))) % 2 = 0))"

  private def bpeLearnCtes: String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wc,
         |    list_transform(range(1, length(w) + 1),
         |      i -> substr(w, CAST(i AS INT), 1)) AS toks
         |  FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w
         |        FROM documents WHERE text IS NOT NULL)
         |  WHERE w <> '' GROUP BY w)""".stripMargin
    val rounds = (1 to BPE_ROUNDS).map { k =>
      val p = k - 1
      s"""p$k AS MATERIALIZED (
         |  SELECT pr.a AS a, pr.b AS b, CAST(SUM(wc) AS BIGINT) AS freq
         |  FROM (SELECT wc, unnest(list_transform(range(1, len(toks)),
         |          i -> {'a': toks[i], 'b': toks[i + 1]})) AS pr
         |        FROM w$p WHERE len(toks) >= 2)
         |  GROUP BY pr.a, pr.b),
         |m$k AS MATERIALIZED (
         |  SELECT a, b, freq FROM p$k ORDER BY freq DESC, a, b LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT w, wc,
         |    CASE WHEN m.a IS NULL OR len(toks) < 2 THEN toks ELSE
         |      list_transform(
         |        list_filter(range(1, len(toks) + 1),
         |          i -> i = 1 OR NOT ${bpeTaken("i - 1", "m.a", "m.b")}),
         |        i -> CASE WHEN ${bpeTaken("i", "m.a", "m.b")}
         |             THEN toks[i] || toks[i + 1] ELSE toks[i] END)
         |    END AS toks
         |  FROM w$p LEFT JOIN m$k m ON TRUE)""".stripMargin
    }
    (w0 +: rounds).mkString(",\n")
  }

  private def t26Sql: String = {
    val union = (1 to BPE_ROUNDS).map(k =>
      s"SELECT CAST($k AS BIGINT) AS rank, a, b, freq FROM m$k")
      .mkString("\n  UNION ALL ")
    s"WITH $bpeLearnCtes\n$union\nORDER BY rank"
  }

  private def t27Sql: String =
    s"""WITH $bpeLearnCtes,
       |seg AS MATERIALIZED (
       |  SELECT w, CAST(len(toks) AS BIGINT) AS n_sub FROM w$BPE_ROUNDS),
       |occ AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE w <> '')
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(n_sub) AS BIGINT) AS bpe_tokens,
       |  CAST(SUM(n_sub) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility
       |FROM occ JOIN seg USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** t28 hashing-trick feature space and weight fixed point. */
  private val CLF_B = 4096L
  private val CLF_Q = 1000L

  /** t28 — LINEAR-classifier quality filtering (the FineWeb-Edu /
    * fastText-style model-based gate): each document's hashed
    * bag-of-words margin  Σ_tok w[h(tok) mod B]  decides keep/drop.
    * The weight for a bucket is derived here from the portable hash
    * (w ∈ [−1000, 1000] fixed-point — a deterministic stand-in; in
    * production the literal weight table of a TRAINED classifier
    * ships exactly like dsirScoreAgainst's ratio table, and every
    * line of the plumbing — hashing, per-row fold, threshold — is
    * unchanged). The margin stays an exact BIGINT sum, so the keep
    * decision is bit-portable; only the reported mean margin divides
    * to double. One narrow codegen'd pass, no shuffle — at 100 TB
    * this rides whatever scan feeds the rest of the pipeline, the
    * t19 argument. Raw margins (not sigmoid probabilities): exp()
    * is not bit-portable across engines and the GATE only needs the
    * sign. */
  /** t28's fixed stand-in weight table, materialized driver-side: the
    * fold's nested hash `h60("clfw:" ∥ (h60(t) % B)) % (2Q+1) − Q`
    * only depends on the token through its bucket `h60(t) % B`, so
    * the outer hash is precomputable per bucket — the same numbers
    * the per-row expression derived, now a 4096-long literal feeding
    * the fused [[graft.functions.ClfMargin]] kernel (round-14 opt:
    * the interpreted fold paid a lambda dispatch + string concat +
    * TWO MD5s per token; the kernel runs ONE prefix-free MD5 per
    * token inside the scan's codegen). Bit-identical — ClfMarginSpec
    * pins the parity against the exact old fold. */
  private lazy val t28Weights: Seq[Long] =
    Seq.tabulate(CLF_B.toInt)(j =>
      (graft.functions.H60.hashString("clfw:" + j) % (2 * CLF_Q + 1)) - CLF_Q)

  def t28ClassifierFilter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("__toks", toks)
      .select(col("doc_id"),
        coalesce(size(col("__toks")), lit(0)).cast(LongType).as("n_tok"),
        call_function("graft_clf_margin",
          coalesce(col("__toks"), array().cast(ArrayType(StringType))),
          lit(""), typedLit(t28Weights))
          .as("margin_fp"))
      .select(col("doc_id"), col("n_tok"), col("margin_fp"),
        when(col("n_tok") > 0,
          col("margin_fp").cast(DoubleType) / col("n_tok").cast(DoubleType) /
            lit(CLF_Q).cast(DoubleType)).otherwise(lit(0.0)).as("margin"),
        (col("margin_fp") >= 0L).cast(LongType).as("kept"))
      .orderBy(col("doc_id"))

  /** t33 training hyper-parameters: hashed feature buckets, batch
    * rounds, and the damping divisor. B is deliberately small — the
    * weight table must stay a broadcast/driver-literal object (the
    * c12 centroid discipline), and 256 buckets are plenty for
    * distilling a 7-rule cascade. K damps each batch step (Δw//K,
    * toward-zero) — the plain batch perceptron 2-cycles on this
    * objective; fractional steps let it descend. */
  private val CLF_TRAIN_B = 256L
  private val CLF_TRAIN_R = 6
  private val CLF_TRAIN_K = 24L

  /** t33 — TRAIN the quality classifier distributed (the step t28
    * stubs with a fixed table): a batch perceptron over hashed
    * bag-of-words features, with t19's rule-cascade verdict as the
    * weak label (the rules-as-teacher distillation every production
    * curation stack runs to replace an expensive gate with a fast
    * linear one). All arithmetic is exact BIGINT fixed-point, so the
    * learned weights are bit-portable and the DuckDB oracle replays
    * training EXACTLY — each round unrolled as a CTE group, pocket
    * selection included.
    *
    * Per round (POCKET batch perceptron): margin_d = Σ_b w[b]·x[d,b];
    * every misclassified doc (y·margin ≤ 0) contributes y·x to Δw,
    * applied damped (Δw//K — the undamped batch step 2-cycles); the
    * kept model is the round with the best train accuracy (earliest
    * wins ties), so a late oscillation can never ship a worse model
    * than an earlier round found. Deterministic — no per-row update
    * order, no floats, no randomness.
    *
    * Scale shape: ONE corpus scan builds the (doc, bucket, count)
    * feature table (joined with t19's labels, checkpointed); each of
    * the R rounds is a doc-keyed window sum (margins) + a bucket-
    * keyed aggregation (Δw) over that counts-grain table, with the
    * current weights entering as a 256-literal array — never a
    * shuffle of the corpus text. The per-round collect is ≤ B rows.
    * The learned table persists behind a corpus-drift token (the
    * c13b/t27 lifecycle), so t33b applies never retrain.
    *
    * Magnitude bound (t32's discipline): |w| after R rounds ≤
    * R·Σ_docs x ≈ R·(corpus tokens), and a doc's margin multiplies
    * that by its token count — BIGINT holds to ~10^14 corpus tokens
    * for 10^4-token docs; past that, train on a hash-sampled seed
    * (the realistic regime: labels are the expensive part). */
  def t33ClassifierTrain(s: SparkSession, d: String): DataFrame = {
    ensureClfModel(s, d)
    s.table(clfTables(d)._1).orderBy(col("bucket"))
  }

  /** t33b — APPLY the trained classifier: t28's narrow per-row fold
    * with the LEARNED weight table (read from the persisted model,
    * drift-token guarded) instead of t28's fixed stand-in. Margin
    * stays an exact BIGINT sum → bit-portable keep decision; the
    * oracle replays training (t33's unrolled CTEs) then this join. */
  def t33bClassifierApply(s: SparkSession, d: String): DataFrame = {
    ensureClfModel(s, d)
    val w = s.table(clfTables(d)._1).orderBy(col("bucket"))
      .collect().map(_.getLong(1)) // exactly B rows — bounded
    // Fused margin kernel (round-14 opt, the t28 rationale): ONE
    // MD5-per-token codegen loop over the learned 256-long literal,
    // replacing the interpreted per-token fold + concat + element_at.
    // array_remove is the codegen'd twin of the old
    // `filter(…, t -> t =!= "")` — split output never carries nulls,
    // the one input where the two differ.
    Tables.documents(s, d)
      .withColumn("__toks",
        array_remove(split(coalesce(col("text"), lit("")), "\\s+"), ""))
      .select(col("doc_id"),
        size(col("__toks")).cast(LongType).as("n_tok"),
        call_function("graft_clf_margin",
          col("__toks"), lit("clfb:"), typedLit(w.toSeq))
          .as("margin_fp"))
      .select(col("doc_id"), col("n_tok"), col("margin_fp"),
        (col("margin_fp") >= 0L).cast(LongType).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Pocket batch-perceptron training core over any (doc_id, text)
    * frame — returns the B-entry weight array of the BEST round
    * (train accuracy over feature-bearing docs; earliest round wins
    * ties). Each round: margins per doc (one doc-keyed agg with the
    * current weights as a 256-literal array), the damped update
    * Δw//K from misclassified docs' features (one bucket-keyed agg),
    * and the round's accuracy (scalar). Spec-pinned against an
    * independent in-memory reference (ClassifierTrainSpec). */
  private[graft] def clfTrain(docs: DataFrame): Array[Long] = {
    val feats = docs
      .select(col("doc_id"),
        explode(filter(split(coalesce(col("text"), lit("")), "\\s+"),
          t => t =!= "")).as("tok"))
      .select(col("doc_id"),
        (Portable.h60(concat(lit("clfb:"), col("tok"))) % CLF_TRAIN_B).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("x"))
      .join(t19RuleFilterOf(docs)
        .select(col("doc_id"), (col("keep") * 2L - 1L).as("y")), Seq("doc_id"))
      .localCheckpoint()
    val w = Array.fill(CLF_TRAIN_B.toInt)(0L)
    var bestW = w.clone()
    var bestAcc = -1L
    // rounds 0..R: margins(w_r) feed BOTH the pocket check (r ≥ 1,
    // trained rounds only) and the next update (r < R) — one doc-
    // keyed aggregation per round, exactly the oracle's m{r} CTE
    for (r <- 0 to CLF_TRAIN_R) {
      val wCol = array(w.toSeq.map(lit): _*)
      val margins = feats
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(element_at(wCol, (col("b") + 1L).cast(IntegerType)) * col("x"))
          .as("m"))
        .localCheckpoint()
      if (r >= 1) {
        val acc = margins
          .where(when(col("m") >= 0L, 1L).otherwise(-1L) === col("y"))
          .count()
        if (acc > bestAcc) { bestAcc = acc; bestW = w.clone() }
      }
      if (r < CLF_TRAIN_R) {
        val delta = feats
          .join(margins.where(col("y") * col("m") <= 0L)
            .select(col("doc_id")), Seq("doc_id"), "left_semi")
          .groupBy(col("b")).agg(sum(col("y") * col("x")).as("dw"))
          .collect() // ≤ B rows — bounded
        // toward-zero damping (Scala Long division), mirrored
        // sign-symmetrically in the oracle's floor-division CASE
        delta.foreach(d => w(d.getLong(0).toInt) += d.getLong(1) / CLF_TRAIN_K)
      }
      DedupOps.freeCheckpoint(margins)
    }
    DedupOps.freeCheckpoint(feats)
    bestW
  }

  private def clfTables(d: String): (String, String) = {
    val tag = Integer.toHexString(d.hashCode)
    (s"graft_clf_w_$tag", s"graft_clf_meta_$tag")
  }

  /** Stored-model identity: corpus listing PLUS the training
    * hyper-parameters — a hyper-parameter (or algorithm-version)
    * change must invalidate the persisted model exactly like corpus
    * drift, or a re-deployed engine silently serves weights trained
    * by the previous code. */
  private def clfToken(s: SparkSession, d: String): String =
    s"pocket-perceptron|B=$CLF_TRAIN_B|R=$CLF_TRAIN_R|K=$CLF_TRAIN_K|" +
      ScaleOps.corpusToken(s, d, "documents.parquet")

  /** Persist the learned weight table behind a corpus-drift token
    * (the c13b/t27 build-once lifecycle). */
  def buildClfModel(s: SparkSession, d: String): Unit = {
    val (wT, metaT) = clfTables(d)
    Seq(wT, metaT).foreach(ScaleOps.dropStale(s, _))
    val w = clfTrain(Tables.documents(s, d))
    import s.implicits._
    w.toSeq.zipWithIndex.map { case (wt, b) => (b.toLong, wt) }
      .toDF("bucket", "w")
      .write.mode("overwrite").format("parquet").saveAsTable(wT)
    s.createDataFrame(Seq(Tuple1(clfToken(s, d))))
      .toDF("token").write.mode("overwrite").format("parquet").saveAsTable(metaT)
  }

  private def ensureClfModel(s: SparkSession, d: String): Unit = {
    val (_, metaT) = clfTables(d)
    def token(): Option[String] =
      if (!s.catalog.tableExists(metaT)) None
      else s.table(metaT).collect().headOption.map(_.getString(0))
    if (!token().contains(clfToken(s, d)))
      buildClfModel(s, d)
  }

  /** t29 chunk geometry: 64-token windows, stride 48 (16 overlap). */
  private val CHUNK_N = 64
  private val CHUNK_STRIDE = 48

  /** t29 — strided document CHUNKING: split every document into
    * fixed-size token windows with overlap — the preprocessing step
    * both RAG indexing and long-document training pipelines run
    * before embedding/packing (overlap keeps boundary-straddling
    * context retrievable). One narrow pass with a bounded explode
    * (≤ n_tok/stride + 1 chunks per doc), no shuffle; chunk identity
    * is (doc_id, chunk_idx), reproducible from the text alone.
    * Emits the chunk text plus its exact token span so downstream
    * stages (c06/c22 embedding search, t09 packing) can join back
    * without re-tokenizing. */
  def t29Chunk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .where(col("text").isNotNull)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("n_tok"))
      .where(col("n_tok") >= 1)
      .select(col("doc_id"), col("toks"), col("n_tok"),
        posexplode(sequence(lit(0L), col("n_tok") - 1L, lit(CHUNK_STRIDE.toLong))))
      .toDF("doc_id", "toks", "n_tok", "chunk_idx", "start_tok")
      .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
        col("start_tok"),
        least(lit(CHUNK_N.toLong), col("n_tok") - col("start_tok"))
          .as("n_chunk_tok"),
        array_join(slice(col("toks"), (col("start_tok") + 1L).cast("int"),
          lit(CHUNK_N)), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** t38 — intra-document DE-REPETITION (the rewrite face of t08's
    * repetition detector): collapse every run of consecutive
    * identical tokens to a single occurrence and report the cleaned
    * text, with before/after token counts, for every document the
    * pass changed. Generation artifacts and boilerplate stutter
    * ("buy now buy now buy now") survive doc-level dedup because the
    * ENCLOSING documents differ; this removes the redundancy within
    * the document before anything downstream counts or packs tokens.
    *
    * Scale shape: ONE narrow codegen'd pass — the run-collapse is
    * the native [[graft.functions.CollapseRuns]] expression (an
    * element survives iff it null-safe-differs from its
    * predecessor), no explode, no shuffle, no UDF; the only exchange
    * is the output sort. The original indexed-lambda `filter`
    * formulation paid the HOF interpreter tax per token — twice,
    * because the `n_kept < n_tok` filter substitutes below the sort
    * — and cost 5.7 s warm at sf0.1; the fused loop costs 0.85 s.
    * The DuckDB oracle replays the indexed-lambda rule (1-based
    * `t[i-1]`, where the first element's predecessor probe is
    * ANSI-safe null), so the engines agree token-for-token. */
  def t38Derepetition(s: SparkSession, d: String): DataFrame =
    derepetitionOf(Tables.documents(s, d))

  /** Core of t38 over any `(doc_id, text, …)` frame.
    *
    * Sorts the INPUT (t08's discipline): orderBy on top of the HOF
    * projection makes the range partitioner's sampling pass execute
    * the projection a second time; below it, sampling touches only
    * the scan (A/B at sf0.1: 7.5 → 7.0 s cold — the pass is
    * read-dominated, so the win is modest but the shape is right).
    * The global Sort stays below the Projects and the Filter (both
    * order-preserving), so the output order contract is identical. */
  private[graft] def derepetitionOf(docs: DataFrame): DataFrame =
    docs
      .orderBy(col("doc_id"))
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), size(col("t")).cast(LongType).as("n_tok"),
        call_function("graft_collapse_runs", col("t")).as("kept"))
      .select(col("doc_id"), col("n_tok"),
        size(col("kept")).cast(LongType).as("n_kept"),
        array_join(col("kept"), " ").as("text_clean"))
      .where(col("n_kept") < col("n_tok"))

  /** c31 — CHUNK-granularity exact dedup: t29's windows hashed and
    * grouped, keeping hashes that recur (in other documents or
    * elsewhere in the same one). This is boilerplate detection at
    * the retrieval grain — a chunk store (RAG index, packed
    * pretraining shards) wants each chunk ONCE, and the chunk grain
    * catches repeated spans c01's whole-document hash can never see.
    * Same scale shape as c01: one keyed aggregation on the content
    * hash, grain rows only across the shuffle. */
  def c31ChunkDedup(s: SparkSession, d: String): DataFrame =
    t29Chunk(s, d)
      .select(md5(regexp_replace(lower(col("chunk_text")), "\\s+", " "))
        .as("chunk_hash"),
        col("doc_id"), col("chunk_idx"))
      .groupBy(col("chunk_hash"))
      .agg(
        count(lit(1)).as("dup_ct"),
        countDistinct(col("doc_id")).as("n_docs"),
        // canonical (doc, chunk) as one packed BIGINT min — portable
        // across engines where a struct-min's ordering might not be
        min(col("doc_id") * lit(1048576L) + col("chunk_idx")).as("ck"))
      .filter(col("dup_ct") >= 2)
      .select(col("chunk_hash"), col("dup_ct"), col("n_docs"),
        expr("ck div 1048576").as("canonical_doc"),
        (col("ck") % 1048576L).as("canonical_chunk"))
      .orderBy(col("canonical_doc"), col("canonical_chunk"), col("chunk_hash"))

  /** t04b — the fingerprint query as SQL TEXT (the a23b precedent
    * extended to the pipeline surface): the native `graft_winnow60`
    * expression is registered through SparkSessionExtensions, so a
    * SQL-only user reaches the same codegen'd sketch — no DataFrame
    * code, no UDF. Oracle identical to t04. */
  def t04bFingerprintSql(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(
      """SELECT doc_id, graft_winnow60(text) AS fp,
        |       CAST(greatest(length(text) - 7, 1) AS BIGINT) AS n_windows
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  /** t11 — top-3 documents per source by quality score: the
    * "best-of-each-stratum" sampling report every curation pass
    * produces. The rank-filter compiles to WindowGroupLimit, so each
    * partition keeps only its running top-3 BEFORE the shuffle —
    * at corpus scale the exchange carries ≤ 3·partitions rows per
    * source, not the corpus. */
  def t11TopQualityPerSource(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    withQualityCols(Tables.documents(s, d))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk"), col("doc_id"), col("quality"))
      .orderBy(col("source"), col("rk"))
  }

  /** t16 quota: exact docs per (lang) stratum. */
  private val QUOTA_N = 25

  /** t16 — EXACT-quota stratified sampling: exactly
    * min(QUOTA_N, stratum size) documents per language, chosen by a
    * seeded hash order. t10's hash-threshold sampler hits a RATE in
    * expectation — fine for mixing — but eval-set construction needs
    * an exact budget ("give me exactly N per language,
    * reproducibly"). Ordering by the salted h60 of the doc_id makes
    * the draw uniform and deterministic — re-running on the same
    * corpus returns byte-identical samples, and adding documents
    * only perturbs strata whose hash frontier moved.
    *
    * Scale shape: rank ≤ N over a hash order compiles to
    * WindowGroupLimit (pinned in PlanShapeSpec) — each partition
    * keeps its local top-N per stratum before the single per-stratum
    * exchange, so the shuffle carries O(strata · N) rows, not the
    * corpus. */
  def t16QuotaSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("hk"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("hk",
        Portable.h60(concat(lit("quota:"), col("doc_id").cast(StringType))))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= QUOTA_N)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  /** t37 token budget per source — sized so the sf0.01/sf0.1
    * fixtures keep roughly a third of each source (the budget binds)
    * while sf0.001 sources fit entirely (degenerate but still
    * deterministic). */
  private val TOKEN_QUOTA = 500L

  /** t37 — per-source TOKEN-budget quota: keep documents from each
    * source, in seeded hash order, until [[TOKEN_QUOTA]] tokens are
    * spent — the budget version of t16 (which counts DOCUMENTS; a
    * token budget is what a training mix actually allocates, and doc
    * counts misprice sources with long documents). Whole documents
    * only: a doc is kept iff the budget BEFORE it is unspent, so the
    * crossing document is included — progress is guaranteed even
    * when a single doc exceeds the whole budget (the packing
    * convention t09 uses).
    *
    * Scale shape: ONE per-source exchange — the seeded rank and the
    * running token sum share the same Window partitioning, so
    * Catalyst plans a single Exchange + Window (t34's shape); the
    * decision is then a per-row comparison. Linear in the corpus,
    * no rank limit to push because the cut depends on the running
    * sum, not a fixed row count. */
  def t37TokenQuota(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        coalesce(size(toks), lit(0)).cast(LongType).as("nt"),
        Portable.h60(concat(lit("tq:"), col("doc_id").cast(StringType)))
          .as("hk"))
      .withColumn("spent_before", coalesce(sum(col("nt")).over(w), lit(0L)))
      .filter(col("spent_before") < TOKEN_QUOTA)
      .select(col("source"), col("spent_before"), col("doc_id"), col("nt"))
      .orderBy(col("source"), col("spent_before"), col("doc_id"))
  }

  /** t39 — MIX-PLAN EXECUTION: turn t36's per-language token
    * allocations into the actual draw. A language allocated
    * `alloc_tok` against its `n_tok` corpus emits
    * full_epochs = alloc div n_tok COMPLETE passes plus one seeded
    * PARTIAL pass spending the remainder alloc mod n_tok — docs kept
    * in hash order while the tokens before them are unspent, whole
    * docs, crossing doc included (t37's convention). The report per
    * language: full_epochs, the partial pass's doc/token counts, and
    * emitted_tok = full_epochs·n_tok + partial_tok — the number the
    * training loader actually materializes, closing the loop from
    * plan (t36) to sample (this). Upweighted-but-capped languages
    * surface as full_epochs ≥ 1 with a half-corpus partial; plain
    * languages as full_epochs 0 with a subset partial.
    *
    * Scale shape: the plan is language-cardinality-bounded driver
    * rows (broadcast); the corpus pays ONE per-language Window
    * exchange shared by the running sum — t37's shape with the quota
    * joined in instead of constant. All decisions are int64 (div and
    * mod guarded for the zero-token language, where the plan
    * allocates zero anyway). The oracle composes t36's full
    * fixed-point unroll as a CTE with the identical window. */
  def t39MixExecute(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val plan = mixPlanOfDocs(s, docs)
      .select(col("lang"), col("n_tok").as("lang_tok"), col("alloc_tok"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fullEp =
      when(col("lang_tok") > 0, expr("alloc_tok div lang_tok")).otherwise(0L)
    val rem =
      when(col("lang_tok") > 0, col("alloc_tok") % col("lang_tok")).otherwise(0L)
    docs.filter(col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        coalesce(size(toks), lit(0)).cast(LongType).as("nt"),
        Portable.h60(concat(lit("mx:"), col("doc_id").cast(StringType)))
          .as("hk"))
      .join(broadcast(plan), Seq("lang"))
      .withColumn("spent_before", coalesce(sum(col("nt")).over(w), lit(0L)))
      .withColumn("in_partial", col("spent_before") < rem)
      .groupBy(col("lang"))
      .agg(
        max(fullEp).as("full_epochs"),
        sum(when(col("in_partial"), 1L).otherwise(0L)).as("n_partial_docs"),
        sum(when(col("in_partial"), col("nt")).otherwise(0L)).as("partial_tok"),
        (max(fullEp) * max(col("lang_tok")) +
          sum(when(col("in_partial"), col("nt")).otherwise(0L)))
          .as("emitted_tok"))
      .orderBy(col("lang"))
  }

  /** t40 — CLASSIFIER EVALUATION on the held-out split: per-language
    * confusion counts and integer accuracy of t33's distilled
    * quality classifier against its t19 rule-teacher labels,
    * restricted to t34's held-out stratum — the report a model-based
    * quality gate owes before it replaces the rules it distilled:
    * WHERE does the cheap model disagree with the teacher, and is
    * the disagreement concentrated in a language? Evaluating on the
    * held-out stratum (not training data) is the point — train
    * accuracy is already reported by t33's pocket selection.
    *
    * Scale shape: three already-benchmarked passes (t34's one-Window
    * split, t33b's frozen-weights scoring, t19's narrow rule pass)
    * joined at doc_id grain, then a language rollup — no new
    * exchange class. All decisions stay integer; accuracy is
    * (1000·matches) div n. The oracle composes the three faces'
    * own SQL (including t33's bit-exact training replay). */
  def t40ClassifierEval(s: SparkSession, d: String): DataFrame = {
    val held = t34StratifiedSplit(s, d)
      .filter(col("split") === "heldout")
      .select(col("doc_id"), col("lang"))
    val pred = t33bClassifierApply(s, d).select(col("doc_id"), col("kept"))
    val lab = t19RuleFilterOf(Tables.documents(s, d))
      .select(col("doc_id"), col("keep").cast(LongType).as("keep"))
    held.join(pred, Seq("doc_id")).join(lab, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(
        sum(when(col("keep") === 1L && col("kept") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("keep") === 0L && col("kept") === 1L, 1L).otherwise(0L)).as("fp"),
        sum(when(col("keep") === 1L && col("kept") === 0L, 1L).otherwise(0L)).as("fn"),
        sum(when(col("keep") === 0L && col("kept") === 0L, 1L).otherwise(0L)).as("tn"))
      .select(col("lang"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(1000 * (tp + tn)) div (tp + fp + fn + tn)").as("acc_x1000"))
      .orderBy(col("lang"))
  }

  /** t34 held-out share: 1/HELD_DEN of every stratum, exactly. */
  private val HELD_DEN = 10

  /** t34 — EXACT STRATIFIED train/held-out split: every
    * (source, lang) stratum gives up exactly ⌈n/10⌉ documents,
    * chosen by a seeded hash order. t05's hash-bucket split hits
    * 80/10/10 only in expectation — fine for big strata, but a
    * stratified eval set must cover SMALL strata too (a 7-doc
    * stratum gets exactly 1 held-out doc here; t05 gives it 0 or 2+
    * with high probability). The per-stratum quota derives from the
    * stratum's own size, so the split is self-calibrating:
    * re-running on the same corpus is byte-identical, and adding
    * documents only moves the frontier of the strata they join.
    *
    * Scale shape: ONE per-stratum exchange (row_number and the
    * stratum count share the same Window partitioning, so Catalyst
    * plans a single Exchange + Window) — linear in the corpus like
    * t14's shuffle; no rank limit exists to push down because every
    * row gets an assignment. The quota arithmetic is integer
    * (⌈n/10⌉ = (n+9) div 10 — positive operands, so Spark div and
    * DuckDB // agree). */
  def t34StratifiedSplit(s: SparkSession, d: String): DataFrame = {
    val part = Window.partitionBy(col("source"), col("lang"))
    val w = part.orderBy(col("hk"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("hk",
        Portable.h60(concat(lit("strat:"), col("doc_id").cast(StringType))))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(part))
      .select(col("doc_id"), col("source"), col("lang"),
        when(col("rk") <= expr(s"(n + ${HELD_DEN - 1}) div $HELD_DEN"),
          "heldout").otherwise("train").as("split"))
      .orderBy(col("doc_id"))
  }

  /** t19 — composite published-rule document filter (the Gopher /
    * MassiveText rule family, Rae et al. 2021 §A.1.1): a document is
    * kept only if every structural rule holds. Distinct from t02's
    * scalar quality SCORE: these are hard pass/fail gates a corpus
    * pass applies before any model-based scoring.
    *
    * Rules (thresholds follow the paper where the fixture can
    * exercise them):
    *   r_words    — 50 ≤ word count ≤ 100,000
    *   r_meanlen  — mean word length in [3, 10] chars
    *   r_symbol   — (# '#' + '...' occurrences) / words ≤ 0.1
    *   r_alpha    — ≥ 80% of words contain an [a-zA-Z] character
    *   r_stop     — ≥ 2 hits from the English stopword list
    *   r_bullet   — ≤ 90% of lines start with a bullet
    *   r_ellipsis — ≤ 30% of lines end with an ellipsis
    *
    * Every ratio threshold is evaluated by integer cross-
    * multiplication (10·cnt ≤ k·total) — zero float comparisons, so
    * the keep decision is bit-portable across engines and immune to
    * divide-by-zero on degenerate rows. One narrow projection, no
    * shuffle; at 100 TB this is a free rider on whatever scan feeds
    * the rest of the pass. */
  def t19RuleFilter(s: SparkSession, d: String): DataFrame =
    t19RuleFilterOf(Tables.documents(s, d))

  /** Core of t19 over any `(doc_id, text)` frame (spec-injectable). */
  def t19RuleFilterOf(docs: DataFrame): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    val tk = split(txt, "\\s+")
    val lines = split(txt, "\n")
    val en = array(langWords.head._2.map(lit): _*)
    docs
      .select(col("doc_id"),
        size(tk).cast(LongType).as("n_tok"),
        // native codegen'd kernels (round-14 opt) — bit-identical to
        // the interpreted HOF folds/filters they replace (the
        // aggregate(+length) fold and three rlike filter-counts, four
        // per-token/per-line lambda dispatches on every rule-gated
        // document; CountRlikeSpec/SumStrLenSpec pin the parity incl.
        // null poisoning and RLIKE find() semantics)
        call_function("graft_sum_strlen", tk).as("wchars"),
        size(regexp_extract_all(txt, lit("#|\\.\\.\\."), lit(0)))
          .cast(LongType).as("sym_cnt"),
        call_function("graft_count_rlike", tk, lit("[a-zA-Z]")).as("alpha_words"),
        call_function("graft_count_in", tk, en).as("stop_hits"),
        size(lines).cast(LongType).as("n_lines"),
        call_function("graft_count_rlike", lines, lit("^(- |\\* |• )"))
          .as("bullet_lines"),
        call_function("graft_count_rlike", lines, lit("\\.\\.\\.$"))
          .as("ellipsis_lines"))
      .withColumn("r_words",
        (col("n_tok") >= 50 && col("n_tok") <= 100000).cast(LongType))
      .withColumn("r_meanlen",
        (col("wchars") >= lit(3) * col("n_tok") &&
          col("wchars") <= lit(10) * col("n_tok")).cast(LongType))
      .withColumn("r_symbol",
        (lit(10) * col("sym_cnt") <= col("n_tok")).cast(LongType))
      .withColumn("r_alpha",
        (lit(10) * col("alpha_words") >= lit(8) * col("n_tok")).cast(LongType))
      .withColumn("r_stop", (col("stop_hits") >= 2).cast(LongType))
      .withColumn("r_bullet",
        (lit(10) * col("bullet_lines") <= lit(9) * col("n_lines")).cast(LongType))
      .withColumn("r_ellipsis",
        (lit(10) * col("ellipsis_lines") <= lit(3) * col("n_lines")).cast(LongType))
      .withColumn("n_failed",
        lit(7L) - col("r_words") - col("r_meanlen") - col("r_symbol") -
          col("r_alpha") - col("r_stop") - col("r_bullet") - col("r_ellipsis"))
      .withColumn("keep", (col("n_failed") === 0).cast(LongType))
      .select(col("doc_id"), col("n_tok"), col("wchars"), col("alpha_words"),
        col("stop_hits"), col("r_words"), col("r_meanlen"), col("r_symbol"),
        col("r_alpha"), col("r_stop"), col("r_bullet"), col("r_ellipsis"),
        col("n_failed"), col("keep"))
      .orderBy(col("doc_id"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_lang_id" -> t01LangId,
    "t16_quota_sample" -> t16QuotaSample,
    "t37_token_quota" -> t37TokenQuota,
    "t34_stratified_split" -> t34StratifiedSplit,
    "t02_quality" -> t02Quality,
    "t03_token_count" -> t03TokenCount,
    "t03b_subword_tokens" -> t03bSubwordTokens,
    "t04_fingerprint" -> t04Fingerprint,
    "t04b_fingerprint_sql" -> t04bFingerprintSql,
    "t05_train_split" -> t05TrainSplit,
    "t06_length_histogram" -> t06LengthHistogram,
    "t07_pii_scrub" -> t07PiiScrub,
    "t08_repetition" -> t08Repetition,
    "t09_pack_sequences" -> t09PackSequences,
    "t09b_pack_spans" -> t09bPackSpans,
    "t09c_pack_subword" -> t09cPackSubword,
    "t10_mix_sample" -> t10MixSample,
    "t11_top_quality_per_source" -> t11TopQualityPerSource,
    "t15_lm_score" -> t15LmScore,
    "t31_kn_lm" -> t31KnLm,
    "t32_vocab_drift" -> t32VocabDrift,
    "t17_dsir_sample" -> t17DsirSample,
    "t18_fertility" -> t18Fertility,
    "t19_rule_filter" -> t19RuleFilter,
    "t20_bpe_pairs" -> t20BpePairs,
    "t24_temperature_mix" -> t24TemperatureMix,
    "t35_weighted_sample" -> t35WeightedSample,
    "t36_mix_plan" -> t36MixPlan,
    "t39_mix_execute" -> t39MixExecute,
    "t25_annotate" -> t25Annotate,
    "t26_bpe_learn" -> t26BpeLearn,
    "t27_bpe_apply" -> t27BpeApply,
    "t28_classifier_filter" -> t28ClassifierFilter,
    "t33_classifier_train" -> t33ClassifierTrain,
    "t33b_classifier_apply" -> t33bClassifierApply,
    "t40_classifier_eval" -> t40ClassifierEval,
    "t29_chunk" -> t29Chunk,
    "t38_derepetition" -> t38Derepetition,
    "c31_chunk_dedup" -> c31ChunkDedup)

  /** The t29 oracle body (no ORDER BY) — shared with c31. */
  private val t29Sql: String =
    s"""SELECT doc_id,
       |  CAST(i AS BIGINT) AS chunk_idx,
       |  CAST(s AS BIGINT) AS start_tok,
       |  CAST(least($CHUNK_N, n_tok - s) AS BIGINT) AS n_chunk_tok,
       |  array_to_string(t[s + 1:s + $CHUNK_N], ' ') AS chunk_text
       |FROM (
       |  SELECT doc_id, t, n_tok,
       |    generate_subscripts(starts, 1) - 1 AS i,
       |    unnest(starts) AS s
       |  FROM (
       |    SELECT doc_id, t, n_tok,
       |      range(0, CAST(n_tok AS BIGINT), $CHUNK_STRIDE) AS starts
       |    FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t,
       |            len(string_split_regex(text, '\\s+')) AS n_tok
       |          FROM documents WHERE text IS NOT NULL)
       |    WHERE n_tok >= 1))""".stripMargin

  /** The t19 oracle body (no ORDER BY) — shared with t33/t33b, whose
    * training labels replay the rule cascade. */
  private val t19Sql: String =
    s"""SELECT doc_id, n_tok, wchars, alpha_words, stop_hits,
       |  r_words, r_meanlen, r_symbol, r_alpha, r_stop, r_bullet, r_ellipsis,
       |  (7 - r_words - r_meanlen - r_symbol - r_alpha - r_stop
       |     - r_bullet - r_ellipsis) AS n_failed,
       |  CAST((r_words + r_meanlen + r_symbol + r_alpha + r_stop
       |     + r_bullet + r_ellipsis) = 7 AS BIGINT) AS keep
       |FROM (
       |  SELECT doc_id, n_tok, wchars, alpha_words, stop_hits,
       |    CAST(n_tok >= 50 AND n_tok <= 100000 AS BIGINT) AS r_words,
       |    CAST(wchars >= 3 * n_tok AND wchars <= 10 * n_tok AS BIGINT) AS r_meanlen,
       |    CAST(10 * sym_cnt <= n_tok AS BIGINT) AS r_symbol,
       |    CAST(10 * alpha_words >= 8 * n_tok AS BIGINT) AS r_alpha,
       |    CAST(stop_hits >= 2 AS BIGINT) AS r_stop,
       |    CAST(10 * bullet_lines <= 9 * n_lines AS BIGINT) AS r_bullet,
       |    CAST(10 * ellipsis_lines <= 3 * n_lines AS BIGINT) AS r_ellipsis
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(tk) AS BIGINT) AS n_tok,
       |      CAST(COALESCE(list_sum(list_transform(tk, w -> length(w))), 0) AS BIGINT) AS wchars,
       |      CAST(len(regexp_extract_all(txt, '#|\\.\\.\\.')) AS BIGINT) AS sym_cnt,
       |      CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS alpha_words,
       |      CAST(len(list_filter(tk, w -> list_contains(${langWords.head._2.map(w => s"'$w'").mkString("[", ", ", "]")}, w))) AS BIGINT) AS stop_hits,
       |      CAST(len(ln) AS BIGINT) AS n_lines,
       |      CAST(len(list_filter(ln, l -> regexp_matches(l, '^(- |\\* |• )'))) AS BIGINT) AS bullet_lines,
       |      CAST(len(list_filter(ln, l -> regexp_matches(l, '\\.\\.\\.$$'))) AS BIGINT) AS ellipsis_lines
       |    FROM (
       |      SELECT doc_id, txt,
       |        string_split_regex(txt, '\\s+') AS tk,
       |        string_split(txt, chr(10)) AS ln
       |      FROM (SELECT doc_id, COALESCE(text, '') AS txt FROM documents))))""".stripMargin

  /** Shared CTE chain for t33/t33b: rule labels, hashed features,
    * the R unrolled pocket-perceptron rounds (per round: margins
    * m{r} with w{r}, the damped update to w{r+1}, the round's train
    * accuracy acc{r}), and the pocket selection `clfbest` — the
    * best-accuracy round's weight table (earliest round wins ties).
    * Plain chained CTEs, not WITH RECURSIVE, so every round's tables
    * can be referenced freely. Bit-exact replay of [[clfTrain]]. */
  private lazy val clfTrainCtes: String = {
    val base =
      s"""clflab AS (SELECT doc_id, CAST(2 * keep - 1 AS BIGINT) AS y FROM ($t19Sql)),
         |clftok AS (
         |  SELECT doc_id, ${Portable.h60Sql("'clfb:' || tok")} % $CLF_TRAIN_B AS b
         |  FROM (SELECT doc_id,
         |          unnest(list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
         |                             t -> t <> '')) AS tok
         |        FROM documents)),
         |clffeats AS (
         |  SELECT t.doc_id, t.b, CAST(count(*) AS BIGINT) AS x, l.y
         |  FROM clftok t JOIN clflab l USING (doc_id)
         |  GROUP BY t.doc_id, t.b, l.y),
         |w0 AS (SELECT CAST(range AS BIGINT) AS b, CAST(0 AS BIGINT) AS wt
         |       FROM range($CLF_TRAIN_B))""".stripMargin
    val rounds = (0 to CLF_TRAIN_R).map { r =>
      val m =
        s"""m$r AS (
           |  SELECT f.doc_id, f.y, SUM(w.wt * f.x) AS m
           |  FROM w$r w JOIN clffeats f ON f.b = w.b
           |  GROUP BY f.doc_id, f.y)""".stripMargin
      val acc = if (r >= 1) Some(
        s"""acc$r AS (
           |  SELECT CAST(count(*) AS BIGINT) AS acc FROM m$r
           |  WHERE (CASE WHEN m >= 0 THEN 1 ELSE -1 END) = y)""".stripMargin)
      else None
      val next = if (r < CLF_TRAIN_R) Some(
        s"""w${r + 1} AS (
           |  SELECT w.b, w.wt + (CASE WHEN COALESCE(dd.d, 0) >= 0
           |      THEN COALESCE(dd.d, 0) // $CLF_TRAIN_K
           |      ELSE -((-COALESCE(dd.d, 0)) // $CLF_TRAIN_K) END) AS wt
           |  FROM w$r w LEFT JOIN (
           |    SELECT f.b, CAST(SUM(f.y * f.x) AS BIGINT) AS d
           |    FROM clffeats f JOIN m$r q ON f.doc_id = q.doc_id
           |    WHERE q.y * q.m <= 0 GROUP BY f.b) dd ON dd.b = w.b)""".stripMargin)
      else None
      (Seq(m) ++ acc ++ next).mkString(",\n")
    }.mkString(",\n")
    val pocket =
      s"""clfcand AS (${(1 to CLF_TRAIN_R)
            .map(r => s"SELECT $r AS r, acc FROM acc$r")
            .mkString("\n  UNION ALL ")}),
         |clfbestr AS (SELECT r FROM clfcand ORDER BY acc DESC, r LIMIT 1),
         |clfallw AS (${(1 to CLF_TRAIN_R)
            .map(r => s"SELECT $r AS r, b, wt FROM w$r")
            .mkString("\n  UNION ALL ")}),
         |clfbest AS (SELECT b, wt FROM clfallw JOIN clfbestr USING (r))""".stripMargin
    base + ",\n" + rounds + ",\n" + pocket
  }

  /** The t08 oracle body (no ORDER BY) — shared with t25. */
  private val t08Sql: String =
    """SELECT doc_id, n_tok, n_distinct,
      |  CAST(n_distinct AS DOUBLE) / CAST(n_tok AS DOUBLE) AS distinct_ratio,
      |  top_tok_ct,
      |  CAST(top_tok_ct AS DOUBLE) / CAST(n_tok AS DOUBLE) AS top_tok_frac,
      |  n_bigram,
      |  CASE WHEN n_bigram > 0
      |       THEN CAST(n_bigram - n_bigram_distinct AS DOUBLE) / CAST(n_bigram AS DOUBLE)
      |       ELSE 0.0 END AS dup_bigram_frac
      |FROM (
      |  SELECT doc_id, n_tok,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      |    CAST(list_max(list_transform(list_distinct(toks),
      |      t -> len(list_filter(toks, x -> x = t)))) AS BIGINT) AS top_tok_ct,
      |    CAST(len(bigrams) AS BIGINT) AS n_bigram,
      |    CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_bigram_distinct
      |  FROM (
      |    SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok,
      |      list_transform(range(1, CAST(len(toks) AS BIGINT)),
      |        i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      |    FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks
      |          FROM documents)))""".stripMargin

  /** The t01 oracle's pred-lang derivation (no ORDER BY) — shared
    * with t25. */
  private def predLangSql: String = {
    val hits = langWords.map { case (l, ws) => s"${hitsSql(ws)} AS ${l}_hits" }
      .mkString(",\n       ")
    val maxExpr = langWords.map { case (l, _) => s"${l}_hits" }
      .mkString("greatest(", ", ", ")")
    val cases = langWords.map { case (l, _) =>
      s"WHEN ${l}_hits = $maxExpr AND $maxExpr > 0 THEN '$l'"
    }.mkString("\n       ")
    s"""SELECT doc_id, lang, en_hits, de_hits, fr_hits, es_hits, zh_hits,
       |  CASE $cases ELSE 'und' END AS pred_lang
       |FROM (
       |  SELECT doc_id, lang,
       |       $hits
       |  FROM documents)""".stripMargin
  }

  /** The t15 oracle's CTE list (toks/big/uni/vv/c2) — shared with the
    * t22 perplexity bucketing in [[CorpusStats]]. */
  private[operators] val lmCtes: String =
    s"""toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       |big AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
       |    unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
       |  FROM toks WHERE len(t) >= 2),
       |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
       |        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
       |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
       |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY w1, w2)""".stripMargin

  /** The t15 oracle's final select (no ORDER BY — composable). */
  private[operators] val lmSelect: String =
    s"""SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / CAST($LM_Q AS DOUBLE) AS lm_score
       |FROM (
       |  SELECT b.doc_id, ((c2.c2 + 1) * $LM_Q) // (u.c1 + vv.v) AS q
       |  FROM big b JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
       |             JOIN uni u ON b.w1 = u.w
       |             CROSS JOIN vv)
       |GROUP BY doc_id""".stripMargin

  /** Recursive-CTE subword segmentation of the corpus's DISTINCT
    * words (`wtok`: w → toks) — the DuckDB twin of
    * graft.functions.SubwordTokenize. Segmenting the distinct-word
    * table (tiny: vocabulary-sized) instead of every occurrence is
    * also why the recursion is cheap; the same vocabulary literals,
    * pre-sorted (length desc, unit), make `list_filter(...)[1]` the
    * longest match exactly like the Scala scan. */
  private def subwordCtes: String =
    s"""words AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents)
       |  WHERE w <> ''),
       |seg(w, rest, toks) AS (
       |  SELECT w, w, CAST([] AS VARCHAR[]) FROM words
       |  UNION ALL
       |  SELECT w, substr(rest, len(step) + 1), list_append(toks, step) FROM (
       |    SELECT w, rest, toks,
       |      COALESCE(list_filter(${graft.functions.SubwordTokenize.vocabSqlList},
       |                           u -> starts_with(rest, u))[1],
       |               substr(rest, 1, 1)) AS step
       |    FROM seg WHERE rest <> '')),
       |wtok AS (SELECT w, toks FROM seg WHERE rest = '')""".stripMargin

  private def hitsSql(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> list_contains($arr, t))) AS BIGINT)"
  }

  override val oracle: Map[String, String] = Map(
    // the identical indexed-lambda run-collapse rule, 1-based there
    "t38_derepetition" ->
      s"""SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
         |       CAST(len(kept) AS BIGINT) AS n_kept,
         |       array_to_string(kept, ' ') AS text_clean
         |FROM (SELECT doc_id, t,
         |        list_filter(t, (x, i) -> i = 1 OR x != t[i-1]) AS kept
         |      FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t
         |            FROM documents))
         |WHERE len(kept) < len(t) ORDER BY doc_id""".stripMargin,
    "t01_lang_id" ->
      s"""$predLangSql
         |ORDER BY doc_id""".stripMargin,
    "t25_annotate" ->
      s"""WITH q AS (${qualityColsSql}),
         |r AS (SELECT doc_id, distinct_ratio, top_tok_frac, dup_bigram_frac
         |      FROM ($t08Sql)),
         |l AS (SELECT doc_id, pred_lang FROM ($predLangSql)),
         |x AS (SELECT doc_id,
         |        list_min(list_transform(range(1, CAST(greatest(length(text) - 7, 1) AS BIGINT) + 1),
         |          i -> ${Portable.h60Sql("substr(text, CAST(i AS INT), 8)")})) AS fp,
         |        CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
         |        CAST(len(regexp_extract_all(text, '$longNumRe')) AS BIGINT) AS n_long_nums
         |      FROM documents)
         |SELECT q.doc_id, q.lang, q.source, l.pred_lang, q.n_tok, q.n_char,
         |       q.quality, x.fp, x.n_emails, x.n_long_nums,
         |       r.distinct_ratio, r.top_tok_frac, r.dup_bigram_frac
         |FROM q JOIN r USING (doc_id) JOIN l USING (doc_id) JOIN x USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "t02_quality" -> {
      val stop = hitsSql(langWords.head._2)
      s"""SELECT doc_id, n_tok, n_char, stop_hits, avg_word_len, stop_ratio,
         |  least(1.0, greatest(0.0,
         |    0.4 * len_score + 3.0 * stop_ratio + 0.05 * avg_word_len)) AS quality
         |FROM (
         |  SELECT *,
         |    CAST(n_char - (n_tok - 1) AS DOUBLE) / CAST(n_tok AS DOUBLE) AS avg_word_len,
         |    CAST(stop_hits AS DOUBLE) / CAST(n_tok AS DOUBLE) AS stop_ratio,
         |    least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) AS len_score
         |  FROM (
         |    SELECT doc_id,
         |      CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok,
         |      CAST(length(text) AS BIGINT) AS n_char,
         |      $stop AS stop_hits
         |    FROM documents))
         |ORDER BY doc_id""".stripMargin
    },
    "t03_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_char
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t03b_subword_tokens" ->
      s"""WITH RECURSIVE $subwordCtes,
         |docw AS (
         |  SELECT doc_id,
         |    unnest(range(0, CAST(len(t) AS BIGINT))) AS wi,
         |    unnest(t) AS w
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents)),
         |agg AS (
         |  SELECT d.doc_id,
         |    CAST(SUM(len(k.toks)) AS BIGINT) AS sw_tokens,
         |    string_agg(array_to_string(k.toks, ' '), ' ' ORDER BY d.wi) AS sw_text
         |  FROM docw d JOIN wtok k ON d.w = k.w
         |  GROUP BY d.doc_id)
         |SELECT doc_id,
         |  CAST(COALESCE(len(string_split_regex(text, '\\s+')), 0) AS BIGINT) AS ws_tokens,
         |  COALESCE(a.sw_tokens, 0) AS sw_tokens,
         |  COALESCE(a.sw_text, '') AS sw_text
         |FROM documents LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "t09c_pack_subword" ->
      s"""WITH RECURSIVE $subwordCtes,
         |docw AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
         |         FROM documents),
         |ntok AS (
         |  SELECT d0.doc_id, CAST(COALESCE(SUM(len(k.toks)), 0) AS BIGINT) AS n_tok
         |  FROM documents d0
         |  LEFT JOIN docw d ON d0.doc_id = d.doc_id
         |  LEFT JOIN wtok k ON d.w = k.w
         |  GROUP BY d0.doc_id)
         |SELECT doc_id, shard, n_tok,
         |  CAST((running - n_tok) // 2048 AS BIGINT) AS bin,
         |  CAST((running - n_tok) % 2048 AS BIGINT) AS tok_offset
         |FROM (
         |  SELECT doc_id, shard, n_tok,
         |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         |  FROM (SELECT doc_id, n_tok,
         |          ${Portable.h60Sql("'pack:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard
         |        FROM ntok))
         |ORDER BY doc_id""".stripMargin,
    "t18_fertility" ->
      s"""WITH RECURSIVE $subwordCtes,
         |docw AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
         |         FROM documents),
         |sw AS (SELECT d.doc_id, CAST(SUM(len(k.toks)) AS BIGINT) AS sw
         |       FROM docw d JOIN wtok k ON d.w = k.w GROUP BY d.doc_id),
         |base AS (SELECT doc_id, lang,
         |           CAST(COALESCE(len(string_split_regex(text, '\\s+')), 0) AS BIGINT) AS ws
         |         FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(ws) AS BIGINT) AS ws_tokens,
         |  CAST(SUM(COALESCE(s.sw, 0)) AS BIGINT) AS sw_tokens,
         |  CAST(SUM(COALESCE(s.sw, 0)) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility
         |FROM base b LEFT JOIN sw s USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // t19: same integer cross-multiplied thresholds as the Spark
    // side — no float comparison anywhere in the keep decision.
    "t19_rule_filter" -> s"$t19Sql\nORDER BY doc_id",
    "t33_classifier_train" ->
      s"""WITH $clfTrainCtes
         |SELECT b AS bucket, wt AS w FROM clfbest ORDER BY bucket""".stripMargin,
    // the three faces' own SQL composed: t33's bit-exact training
    // replay scores, t19 labels, t34's held-out stratum filters
    "t40_classifier_eval" ->
      s"""WITH $clfTrainCtes,
         |appagg AS (
         |  SELECT doc_id, CAST(SUM(w.wt * f.x) AS BIGINT) AS margin_fp
         |  FROM clffeats f JOIN clfbest w ON w.b = f.b
         |  GROUP BY doc_id),
         |prd AS (SELECT d.doc_id,
         |          CAST(COALESCE(g.margin_fp, 0) >= 0 AS BIGINT) AS kept
         |        FROM documents d LEFT JOIN appagg g USING (doc_id)),
         |lab AS (SELECT doc_id, CAST(keep AS BIGINT) AS keep FROM ($t19Sql)),
         |hld AS (SELECT doc_id, lang FROM (
         |          SELECT doc_id, lang,
         |            row_number() OVER (PARTITION BY source, lang ORDER BY
         |              ${Portable.h60Sql("'strat:' || CAST(doc_id AS VARCHAR)")},
         |              doc_id) AS rk,
         |            count(*) OVER (PARTITION BY source, lang) AS n
         |          FROM documents)
         |        WHERE rk <= (n + ${HELD_DEN - 1}) // $HELD_DEN)
         |SELECT lang,
         |  CAST(SUM(CASE WHEN keep = 1 AND kept = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN keep = 0 AND kept = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(SUM(CASE WHEN keep = 1 AND kept = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(SUM(CASE WHEN keep = 0 AND kept = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |  CAST((1000 * SUM(CASE WHEN keep = kept THEN 1 ELSE 0 END)) // count(*)
         |    AS BIGINT) AS acc_x1000
         |FROM hld JOIN prd USING (doc_id) JOIN lab USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "t33b_classifier_apply" ->
      s"""WITH $clfTrainCtes,
         |appagg AS (
         |  SELECT doc_id, CAST(SUM(x) AS BIGINT) AS n_tok,
         |    CAST(SUM(w.wt * f.x) AS BIGINT) AS margin_fp
         |  FROM clffeats f JOIN clfbest w ON w.b = f.b
         |  GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(g.n_tok, 0) AS n_tok,
         |  COALESCE(g.margin_fp, 0) AS margin_fp,
         |  CAST(COALESCE(g.margin_fp, 0) >= 0 AS BIGINT) AS kept
         |FROM documents d LEFT JOIN appagg g USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // t26/t27: the 8-round merge recurrence unrolled as MATERIALIZED
    // CTEs (the t36 discipline) with the greedy merge's closed form
    // — see the bpeTaken scaladoc for the a==b parity argument.
    "t26_bpe_learn" -> t26Sql,
    "t27_bpe_apply" -> t27Sql,
    // t20: wtok segments the DISTINCT words (the same recursion as
    // t03b); pair counting joins the word-frequency dict and zips
    // the two shifted unnests into adjacent (a, b) pairs.
    "t20_bpe_pairs" ->
      s"""WITH RECURSIVE $subwordCtes,
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
         |    SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents)
         |  WHERE w <> '' GROUP BY w),
         |pairs AS (
         |  SELECT unnest(k.toks[1:len(k.toks) - 1]) AS a,
         |         unnest(k.toks[2:len(k.toks)]) AS b,
         |         c.wc
         |  FROM wc c JOIN wtok k ON c.w = k.w
         |  WHERE len(k.toks) >= 2)
         |SELECT a, b, CAST(SUM(wc) AS BIGINT) AS freq
         |FROM pairs GROUP BY a, b
         |ORDER BY freq DESC, a, b LIMIT $MERGES""".stripMargin,
    "t17_dsir_sample" ->
      s"""WITH toks AS (SELECT doc_id, lang, string_split_regex(text, '\\s+') AS t FROM documents),
         |big AS (
         |  SELECT doc_id, lang,
         |    ${Portable.h60Sql("'dsir:' || w1 || ' ' || w2")} % $DSIR_B AS b
         |  FROM (
         |    SELECT doc_id, lang,
         |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         |      unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
         |    FROM toks WHERE len(t) >= 2)),
         |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct
         |        FROM big WHERE lang = '$DSIR_TARGET' GROUP BY b),
         |rawm AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM big GROUP BY b),
         |sc AS (
         |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_big,
         |    CAST(SUM(q1) AS DOUBLE) / CAST(count(*) AS DOUBLE) / CAST($LM_Q AS DOUBLE) AS dsir_score
         |  FROM (
         |    SELECT b2.doc_id, b2.lang,
         |           ((COALESCE(t.ct, 0) + 1) * $LM_Q) // (r.cr + 1) AS q1
         |    FROM big b2 JOIN rawm r ON b2.b = r.b LEFT JOIN tgt t ON b2.b = t.b)
         |  GROUP BY doc_id, lang)
         |SELECT doc_id, lang, n_big, dsir_score, rk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY dsir_score DESC, doc_id) AS BIGINT) AS rk
         |  FROM sc)
         |WHERE rk <= $DSIR_KEEP
         |ORDER BY lang, rk""".stripMargin,
    "t15_lm_score" ->
      s"""WITH $lmCtes
         |$lmSelect
         |ORDER BY doc_id""".stripMargin,
    "t31_kn_lm" ->
      s"""WITH toks AS (SELECT list_filter(string_split_regex(text, '\\s+'),
         |                                 x -> x <> '') AS t FROM documents),
         |big AS (
         |  SELECT
         |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         |    unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
         |  FROM toks WHERE len(t) >= 2),
         |c2t AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY w1, w2),
         |hist AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
         |                CAST(count(*) AS BIGINT) AS n1r FROM c2t GROUP BY w1),
         |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1l FROM c2t GROUP BY w2),
         |btot AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM c2t)
         |SELECT c.w1, c.w2, c.c2, h.c1, h.n1r, o.n1l,
         |  (greatest(CAST(c.c2 AS DOUBLE) - $KN_D, 0.0) +
         |    $KN_D * CAST(h.n1r AS DOUBLE) * CAST(o.n1l AS DOUBLE) /
         |      CAST(b.bt AS DOUBLE)) / CAST(h.c1 AS DOUBLE) AS p_kn
         |FROM c2t c JOIN hist h ON c.w1 = h.w1
         |           JOIN cont o ON c.w2 = o.w2
         |           CROSS JOIN btot b
         |ORDER BY c.c2 DESC, c.w1, c.w2 LIMIT $KN_TOP""".stripMargin,
    "t32_vocab_drift" ->
      s"""WITH tok AS (
         |  SELECT doc_id % 2 = 0 AS in_a,
         |         unnest(string_split_regex(text, '\\s+')) AS w
         |  FROM documents),
         |counts AS (
         |  SELECT w,
         |         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         |         CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
         |  FROM tok WHERE w IS NOT NULL AND w <> '' GROUP BY w),
         |tot AS (SELECT CAST(SUM(c_a) AS BIGINT) AS tot_a,
         |               CAST(SUM(c_b) AS BIGINT) AS tot_b FROM counts)
         |SELECT w, c_a, c_b,
         |       CAST(abs(c_a * tot_b - c_b * tot_a) AS BIGINT) AS drift,
         |       CAST(c_a AS DOUBLE) / CAST(tot_a AS DOUBLE) AS share_a,
         |       CAST(c_b AS DOUBLE) / CAST(tot_b AS DOUBLE) AS share_b
         |FROM counts CROSS JOIN tot
         |ORDER BY drift DESC, w LIMIT $DRIFT_TOP""".stripMargin,
    "t04_fingerprint" ->
      s"""SELECT doc_id,
         |  list_min(list_transform(range(1, CAST(greatest(length(text) - 7, 1) AS BIGINT) + 1),
         |    i -> ${Portable.h60Sql("substr(text, CAST(i AS INT), 8)")})) AS fp,
         |  CAST(greatest(length(text) - 7, 1) AS BIGINT) AS n_windows
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t04b_fingerprint_sql" ->
      s"""SELECT doc_id,
         |  list_min(list_transform(range(1, CAST(greatest(length(text) - 7, 1) AS BIGINT) + 1),
         |    i -> ${Portable.h60Sql("substr(text, CAST(i AS INT), 8)")})) AS fp,
         |  CAST(greatest(length(text) - 7, 1) AS BIGINT) AS n_windows
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t16_quota_sample" ->
      s"""SELECT lang, rk, doc_id FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang ORDER BY
         |      ${Portable.h60Sql("'quota:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= $QUOTA_N ORDER BY lang, rk""".stripMargin,
    "t37_token_quota" ->
      s"""SELECT source, spent_before, doc_id, nt FROM (
         |  SELECT source, doc_id, nt,
         |    CAST(COALESCE(SUM(nt) OVER (PARTITION BY source
         |      ORDER BY hk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS spent_before
         |  FROM (SELECT doc_id, source,
         |          CAST(COALESCE(len(string_split_regex(text, '\\s+')), 0)
         |            AS BIGINT) AS nt,
         |          ${Portable.h60Sql("'tq:' || CAST(doc_id AS VARCHAR)")} AS hk
         |        FROM documents))
         |WHERE spent_before < $TOKEN_QUOTA
         |ORDER BY source, spent_before, doc_id""".stripMargin,
    "t34_stratified_split" ->
      s"""SELECT doc_id, source, lang,
         |  CASE WHEN rk <= (n + ${HELD_DEN - 1}) // $HELD_DEN
         |       THEN 'heldout' ELSE 'train' END AS split
         |FROM (SELECT doc_id, source, lang,
         |        row_number() OVER (PARTITION BY source, lang ORDER BY
         |          ${Portable.h60Sql("'strat:' || CAST(doc_id AS VARCHAR)")},
         |          doc_id) AS rk,
         |        count(*) OVER (PARTITION BY source, lang) AS n
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "t05_train_split" ->
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        ${Portable.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "t06_length_histogram" ->
      """SELECT n_tok // 32 AS bucket,
        |  CAST(count(*) AS BIGINT) AS doc_ct,
        |  CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
        |  MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok
        |FROM (SELECT CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |      FROM documents)
        |GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin,
    "t08_repetition" ->
      s"""$t08Sql
         |ORDER BY doc_id""".stripMargin,
    "t09_pack_sequences" ->
      // CAST the windowed-sum derivatives back to BIGINT: DuckDB's
      // SUM(BIGINT) widens to HUGEINT, which would diverge from
      // Spark's LongType schema.
      s"""SELECT doc_id, shard, n_tok,
         |  CAST((running - n_tok) // 2048 AS BIGINT) AS bin,
         |  CAST((running - n_tok) % 2048 AS BIGINT) AS tok_offset
         |FROM (
         |  SELECT doc_id, shard, n_tok,
         |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         |  FROM (SELECT doc_id,
         |          CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok,
         |          ${Portable.h60Sql("'pack:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard
         |        FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "t11_top_quality_per_source" ->
      s"""SELECT source, rk, doc_id, quality FROM (
         |  SELECT source, doc_id, quality,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY quality DESC, doc_id) AS BIGINT) AS rk
         |  FROM (${qualityColsSql}))
         |WHERE rk <= 3
         |ORDER BY source, rk""".stripMargin,
    "t09b_pack_spans" ->
      s"""SELECT doc_id, shard, bin,
         |  greatest(start_tok, bin * 2048) - start_tok AS seg_off,
         |  least(start_tok + n_tok, (bin + 1) * 2048) -
         |    greatest(start_tok, bin * 2048) AS seg_len
         |FROM (
         |  SELECT doc_id, shard, n_tok, start_tok,
         |    unnest(range(start_tok // 2048, (start_tok + n_tok - 1) // 2048 + 1)) AS bin
         |  FROM (
         |    SELECT doc_id, shard, n_tok, CAST(running - n_tok AS BIGINT) AS start_tok
         |    FROM (
         |      SELECT doc_id, shard, n_tok,
         |        SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         |      FROM (SELECT doc_id,
         |              CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok,
         |              ${Portable.h60Sql("'pack:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard
         |            FROM documents))))
         |ORDER BY doc_id, bin""".stripMargin,
    "t29_chunk" ->
      s"""$t29Sql
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "c31_chunk_dedup" ->
      s"""WITH ch AS ($t29Sql)
         |SELECT chunk_hash, dup_ct, n_docs,
         |  ck // 1048576 AS canonical_doc,
         |  ck % 1048576 AS canonical_chunk
         |FROM (
         |  SELECT md5(regexp_replace(lower(chunk_text), '\\s+', ' ', 'g')) AS chunk_hash,
         |    CAST(count(*) AS BIGINT) AS dup_ct,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |    CAST(MIN(doc_id * 1048576 + chunk_idx) AS BIGINT) AS ck
         |  FROM ch GROUP BY chunk_hash)
         |WHERE dup_ct >= 2
         |ORDER BY canonical_doc, canonical_chunk, chunk_hash""".stripMargin,
    "t28_classifier_filter" -> {
      val wTok = s"(${Portable.h60Sql(
        s"'clfw:' || CAST(${Portable.h60Sql("tok")} % $CLF_B AS VARCHAR)")} " +
        s"% ${2 * CLF_Q + 1}) - $CLF_Q"
      s"""SELECT doc_id, n_tok, margin_fp,
         |  CASE WHEN n_tok > 0
         |       THEN CAST(margin_fp AS DOUBLE) / CAST(n_tok AS DOUBLE) /
         |            CAST($CLF_Q AS DOUBLE)
         |       ELSE 0.0 END AS margin,
         |  CAST(CASE WHEN margin_fp >= 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM (
         |  SELECT doc_id,
         |    CAST(COALESCE(len(t), 0) AS BIGINT) AS n_tok,
         |    CAST(list_reduce([CAST(0 AS BIGINT)] ||
         |      list_transform(COALESCE(t, CAST([] AS VARCHAR[])),
         |        tok -> $wTok),
         |      (x, y) -> x + y) AS BIGINT) AS margin_fp
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t
         |        FROM documents))
         |ORDER BY doc_id""".stripMargin
    },
    "t24_temperature_mix" ->
      s"""WITH lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
         |            FROM documents WHERE lang IS NOT NULL GROUP BY lang),
         |tot AS (SELECT CAST(SUM(nl) AS BIGINT) AS n FROM lc),
         |st AS (SELECT list_reduce(
         |         [CAST(0.0 AS DOUBLE)] ||
         |           list(sqrt(CAST(nl AS DOUBLE)) ORDER BY lang),
         |         (x, y) -> x + y) AS stot FROM lc),
         |rt AS (SELECT lang,
         |         CAST(floor(r) AS BIGINT) AS base,
         |         CAST(floor((r - floor(r)) * 10000.0) AS BIGINT) AS thr
         |       FROM (SELECT lang,
         |               (sqrt(CAST(nl AS DOUBLE)) * CAST(n AS DOUBLE)) /
         |                 (stot * CAST(nl AS DOUBLE)) AS r
         |             FROM lc CROSS JOIN tot CROSS JOIN st))
         |SELECT doc_id, lang, copies, epoch FROM (
         |  SELECT doc_id, lang, copies,
         |    unnest(range(1, copies + 1)) AS epoch
         |  FROM (
         |    SELECT d.doc_id, d.lang,
         |      CAST(rt.base + CASE WHEN
         |          ${Portable.h60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000
         |            < rt.thr THEN 1 ELSE 0 END AS BIGINT) AS copies
         |    FROM documents d JOIN rt USING (lang))
         |  WHERE copies >= 1)
         |ORDER BY doc_id, epoch""".stripMargin,
    "t10_mix_sample" -> {
      val baseCase = mixRates.map { case (l, b, _) => s"WHEN lang = '$l' THEN $b" }
        .mkString("CASE ", " ", " ELSE 1 END")
      val thrCase = mixRates.map { case (l, _, t) => s"WHEN lang = '$l' THEN $t" }
        .mkString("CASE ", " ", " ELSE 0 END")
      s"""SELECT doc_id, lang, copies, epoch FROM (
         |  SELECT doc_id, lang, copies,
         |    unnest(range(1, copies + 1)) AS epoch
         |  FROM (
         |    SELECT doc_id, lang,
         |      CAST($baseCase +
         |        CASE WHEN ${Portable.h60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000
         |               < $thrCase THEN 1 ELSE 0 END AS BIGINT) AS copies
         |    FROM documents)
         |  WHERE copies >= 1)
         |ORDER BY doc_id, epoch""".stripMargin
    },
    "t35_weighted_sample" ->
      s"""SELECT doc_id, source, lang, w_tok,
         |  CAST(h + 1 AS DOUBLE) / CAST(w_tok AS DOUBLE) AS priority
         |FROM (SELECT doc_id, source, lang,
         |        greatest(COALESCE(
         |          CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0), 1)
         |          AS w_tok,
         |        ${Portable.h60Sql("'wsamp:' || CAST(doc_id AS VARCHAR)")} AS h
         |      FROM documents)
         |ORDER BY priority, doc_id LIMIT $WSAMP_K""".stripMargin,
    "t36_mix_plan" -> t36Sql,
    // t36's full fixed-point unroll as a CTE, composed with t37's
    // window convention — the plan and its execution share one truth
    "t39_mix_execute" ->
      s"""WITH plan AS MATERIALIZED (SELECT * FROM ($t36Sql) q),
         |d AS (SELECT doc_id, lang,
         |        CAST(COALESCE(len(string_split_regex(text, '\\s+')), 0)
         |          AS BIGINT) AS nt,
         |        ${graft.functions.Portable.h60Sql("'mx:' || CAST(doc_id AS VARCHAR)")} AS hk
         |      FROM documents WHERE lang IS NOT NULL),
         |sp AS (SELECT d.lang, d.nt,
         |         p.n_tok AS lang_tok, p.alloc_tok,
         |         COALESCE(SUM(d.nt) OVER (PARTITION BY d.lang
         |           ORDER BY d.hk, d.doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS spent_before
         |       FROM d JOIN plan p ON d.lang = p.lang),
         |x AS (SELECT lang, nt, lang_tok,
         |        CASE WHEN lang_tok > 0 THEN alloc_tok // lang_tok ELSE 0 END
         |          AS fe,
         |        spent_before <
         |          (CASE WHEN lang_tok > 0 THEN alloc_tok % lang_tok ELSE 0 END)
         |          AS inp
         |      FROM sp)
         |SELECT lang,
         |  CAST(MAX(fe) AS BIGINT) AS full_epochs,
         |  CAST(SUM(CASE WHEN inp THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_partial_docs,
         |  CAST(SUM(CASE WHEN inp THEN nt ELSE 0 END) AS BIGINT)
         |    AS partial_tok,
         |  CAST(MAX(fe) * MAX(lang_tok)
         |       + SUM(CASE WHEN inp THEN nt ELSE 0 END) AS BIGINT)
         |    AS emitted_tok
         |FROM x GROUP BY lang ORDER BY lang""".stripMargin,
    "t07_pii_scrub" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$emailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(aug, '$longNumRe')) AS BIGINT) AS n_long_nums,
         |  CAST(length(regexp_replace(regexp_replace(aug, '$emailRe', '<EMAIL>', 'g'),
         |    '$longNumRe', '<NUM>', 'g')) AS BIGINT) AS redacted_len,
         |  md5(regexp_replace(regexp_replace(aug, '$emailRe', '<EMAIL>', 'g'),
         |    '$longNumRe', '<NUM>', 'g')) AS redacted_md5
         |FROM (SELECT doc_id,
         |        text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
         |        '@example.com tel 555' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS aug
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin)
}
