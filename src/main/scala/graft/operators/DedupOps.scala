package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication for a training-data pipeline, four ways:
  *
  *  - c01 exact:    content-hash groupBy (normalized text).
  *  - c02 minhash:  MinHash signatures + LSH band-bucket join, exact
  *                  Jaccard verify on the (small) candidate set.
  *  - c03 simhash:  60-bit SimHash + chunk blocking, Hamming verify.
  *  - c04 ngram:    word-bigram Jaccard with PREFIX FILTERING (rarest
  *                  ngrams first) for candidate generation.
  *
  * Scale stance (the 100 TB design point): none of these contains an
  * all-pairs product. Candidates come from equi-joins on derived keys
  * (content hash / LSH band / SimHash chunk / prefix ngram), so the
  * shuffle is keyed and data-proportional; the quadratic step only
  * touches rows sharing a bucket. Shingle/signature generation is a
  * single narrow pass (per-doc array_distinct + per-row hashing — no
  * pre-join shuffles), and the exact-Jaccard verify only ever sees
  * shingles of docs that appear in a candidate pair (semi-join), so
  * nothing unbounded is cached. Guarantees:
  *  - c02: a pair sharing any of the 4 bands collides; with r=4 rows
  *    per band, P(collide) ≈ 1-(1-j^4)^4 (≈0.98 at j=0.8). Approximate,
  *    not exact: the K=16 family in MinHash60 derives every h_k as an
  *    affine transform of one shared base hash, so band minima are
  *    mildly correlated and the independent-hash bound is slightly
  *    optimistic. Oracle parity is unaffected (DuckDB embeds the
  *    identical family literals).
  *  - c03: Hamming ≤ 3 over 60 bits with 4 blocking chunks — by
  *    pigeonhole one chunk is clean, so recall is 1.0 (exact).
  *  - c04: prefix length |A| - ceil(t|A|) + 1 under the global
  *    (df, ngram) order is the standard prefix-filter bound: any pair
  *    with Jaccard ≥ t shares a prefix token, so recall is 1.0.
  *
  * Every stage is mirrored in the DuckDB oracle SQL via the portable
  * md5-based hash (graft.functions.Portable), so CORRECTNESS checks
  * the full pipeline, not just the final filter.
  */
object DedupOps extends QueryModule {

  /** Frees a localCheckpoint'd frame's blocks once a later round has
    * materialized past it. The iterative components loops checkpoint
    * every round; without this, superseded round frames linger in the
    * block manager until the ContextCleaner happens to GC them — a
    * long-lived session (streaming driver, bench reps) accumulates
    * them, which showed up as c37's warm runs being SLOWER than cold
    * (BENCH_FULL r06). Safe to call once a downstream checkpoint has
    * materialized: the blocks are never re-read. */
  private[graft] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
    }

  // ---------------------------------------------------------------
  // c01 — exact dedup on normalized content hash
  // ---------------------------------------------------------------

  /** Normalization: lowercase + collapse whitespace runs. */
  private[graft] def norm(c: Column): Column =
    regexp_replace(lower(c), "\\s+", " ")

  def c01Exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(norm(col("text"))).as("content_hash"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("dup_ct"))
      .orderBy(col("canonical_id"))

  // ---------------------------------------------------------------
  // c02 — MinHash + LSH (k=16 hashes, b=4 bands × r=4 rows, 3-word
  // shingles, verify Jaccard ≥ 0.8)
  // ---------------------------------------------------------------

  private val K = 16
  private[graft] val BANDS = 4
  private[graft] val R = 4
  private[graft] val JACCARD_T = 0.8

  /** Universal min-hash family over the prime P = 2^31-1:
    * h_i(x) = (A_i * (h60(x) mod P) + B_i) mod P — evaluated by the
    * native one-pass [[graft.functions.MinHash60]] expression (one
    * md5 per shingle; round 2 paid K=16 md5 calls per shingle). The
    * constants live there; the oracle SQL below embeds the identical
    * literals, and every product stays below 2^62 so the arithmetic
    * is exact in both Spark and DuckDB BIGINTs. */
  private val MH_P = graft.functions.MinHash60.P
  private val MH_A = graft.functions.MinHash60.A
  private val MH_B = graft.functions.MinHash60.B

  /** (doc_id, shs = per-doc DISTINCT n-word shingle array) in ONE
    * narrow pass: `array_distinct` replaces round 2's
    * (doc_id, shingle) DISTINCT — a full shuffle of the exploded
    * shingle table — because shingle sets are per-document.
    *
    * Deliberately does NOT also project size(shs): any second use of
    * `shs` in the consuming projection would make CollapseProject
    * inline the whole transform+array_distinct twice per row (there
    * is no common-subexpression elimination across a Generate
    * boundary — measured as a 2× scan cost on exactly this shape).
    *
    * `hashed` swaps each shingle string for its 60-bit portable hash
    * BEFORE the distinct: everything downstream (df counts, prefix
    * rank, intersection joins) then moves 8-byte longs instead of
    * multi-word strings — ~4× less shuffle volume at 100 TB. The
    * oracle applies the same hash, so the engines agree exactly
    * (including on the astronomically-unlikely collision). */
  private def shingleDocs(s: SparkSession, d: String, n: Int,
      hashed: Boolean = false): DataFrame =
    shingleDocsOf(Tables.documents(s, d), n, hashed)

  /** [[shingleDocs]] over an arbitrary `(doc_id, text, …)` frame. */
  private[graft] def shingleDocsOf(docs: DataFrame, n: Int,
      hashed: Boolean): DataFrame = {
    // Hashed grams go through the fused native kernel
    // ([[graft.functions.GramH60]]) — bit-identical to the HOF form
    // but without the per-gram interpreted lambda/slice/concat_ws
    // tax on the corpus-wide scan; string shingles (hashed = false)
    // keep the HOF (they exist only for small oracle-display faces).
    val grams =
      if (hashed) s"graft_gram_h60(toks, $n)"
      else s"transform(sequence(0, size(toks) - $n), " +
        s"i -> concat_ws(' ', slice(toks, i + 1, $n)))"
    docs
      .withColumn("toks", split(col("text"), "\\s+"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), array_distinct(expr(grams)).as("shs"))
  }

  /** Distinct hashed `n`-word shingles of a pre-split token column;
    * EMPTY array when the doc has < n tokens (the guarded twin of the
    * [[shingleDocsOf]] construction — same transform, one place). */
  private def hashedShingles(toksCol: String, n: Int): Column =
    when(size(col(toksCol)) >= n,
      array_distinct(expr(s"graft_gram_h60($toksCol, $n)")))
      .otherwise(array().cast(ArrayType(LongType)))

  /** Adds a `shs` column (distinct hashed `n`-word shingles; EMPTY
    * array when the doc has < n tokens, so short docs survive instead
    * of being filtered) without dropping any input column — the
    * streaming-safe twin of [[shingleDocsOf]], same shingle
    * construction in one place. Splits once: `__toks` is used twice,
    * which stops CollapseProject from inlining the split per use. */
  private[graft] def withShingleCol(df: DataFrame, n: Int): DataFrame =
    df.withColumn("__toks", split(col("text"), "\\s+"))
      .withColumn("shs", hashedShingles("__toks", n))
      .drop("__toks")

  /** ONE corpus scan feeding all three near-dup detectors: per-doc
    * hashed 3-shingles (c02), hashed 4-grams (c04), and the SimHash
    * fingerprint (c03), materialized with localCheckpoint. Every
    * detector then reads the (text-free — longs only, ~4× smaller
    * than the raw corpus) checkpoint instead of re-scanning and
    * re-tokenizing parquet; round 4's c14 planned the three detectors
    * as disjoint lineages and paid ~6 full corpus scans where this
    * pass + checkpoint reads suffice. The checkpoint is
    * MEMORY_AND_DISK, so at 100 TB this is "write the derived
    * features once to executor-local storage" — strictly cheaper
    * than even a second scan, because the md5 shingle hashing (the
    * dominant per-row cost) never re-runs. Blocks are freed by the
    * ContextCleaner when the plans are collected. */
  private[graft] def sharedDedupPass(docs: DataFrame): DataFrame =
    docs
      .withColumn("__toks", split(col("text"), "\\s+"))
      .select(
        col("doc_id"),
        hashedShingles("__toks", 3).as("shs3"),
        hashedShingles("__toks", NGRAM_N).as("shs4"),
        Portable.simhash60(col("text")).as("fp"))
      .localCheckpoint()

  /** MinHash signature → exploded (doc_id, band, key) LSH band keys
    * (the c02 blocking scheme, shared with c13's cross-corpus join
    * and the streaming ingest index). */
  private[graft] def bandKeys(docs: DataFrame): DataFrame =
    bandKeysCfg(docs, BANDS, R)

  /** [[bandKeys]] at an arbitrary (bands × rows) layout over the same
    * K-minima signature — c45's audit dial. The signature itself is
    * layout-independent (K minima, computed once); a layout is just a
    * different GROUPING of the minima into concatenated keys, so
    * comparing layouts costs band-table rebuilds, never a re-hash of
    * the corpus. */
  private[graft] def bandKeysCfg(docs: DataFrame, bands: Int, r: Int): DataFrame = {
    require(bands * r <= K, s"band layout $bands×$r exceeds the $K-minima signature")
    val sig = docs.select(col("doc_id"),
      call_function("graft_minhash60", col("shs")).as("ms"))
    // posexplode_outer (≡ posexplode here: fixed non-null band array)
    // dodges InferFiltersFromGenerate re-evaluating the minhash per
    // row in an inferred size()>0 filter — see c02Cand.
    sig.select(col("doc_id"), posexplode_outer(array(
      (0 until bands).map(b =>
        concat_ws(",", (0 until r).map(i => col("ms").getItem(b * r + i)): _*)): _*)))
      .toDF("doc_id", "band", "key")
  }

  /** da ∪ db of a candidate-pair set, as a (small) doc_id column. */
  private def candIds(cand: DataFrame): DataFrame =
    cand.select(col("da").as("doc_id"))
      .union(cand.select(col("db")))
      .distinct()

  /** Exact-Jaccard verification of a candidate-pair set against a
    * (doc_id, sh) shingle table; keeps pairs with jac ≥ t. Callers
    * pass a shingle table ALREADY semi-joined to the candidate docs:
    * at 100 TB candidates are a tiny fraction of the corpus, so the
    * three uses below (sizes, sa, sb) touch bounded data instead of
    * the full shingle explosion round 2 tried to cache().
    *
    * UNSORTED (round-14 opt): the presentation ORDER BY lives on the
    * standalone query faces (c02/c04) — every composed consumer
    * (c14's union→groupBy, c17/c17b/c08's dupIds.distinct(), c30's
    * source rollup, c41's bin window, c13/c13b's status join,
    * buildSigStore's table writes) immediately re-partitions, so the
    * core's rangepartitioning exchange + sort (plus the range
    * sampling pass) was pure discarded work in every composition. */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame, t: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("sa"), col("da") === col("sa.doc_id"))
      .join(sh.as("sb"), col("db") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("za"), col("da") === col("za.doc_id"))
      .join(sizes.as("zb"), col("db") === col("zb.doc_id"))
      .select(col("da"), col("db"), col("za.n").as("na"), col("zb.n").as("nb"),
        col("inter"),
        (col("inter").cast(DoubleType) /
          (col("za.n") + col("zb.n") - col("inter")).cast(DoubleType)).as("jac"))
      .filter(col("jac") >= t)
  }

  /** The c02 candidate-pair stage over a built (doc_id, shs) shingle
    * frame. Signatures per-row via the native one-pass expression —
    * ZERO shuffles before the band self-join (round 2 shuffled the
    * full shingle table into a groupBy(doc_id) agg of 16 md5-min
    * columns). The band-key table (4 short rows/doc) is
    * localCheckpointed BEFORE the self-join so both sides read the
    * materialized keys; round 4 let each side replay the whole
    * shingle+minhash scan, doubling the dominant cost. */
  private[graft] def c02CandOf(sh3: DataFrame): DataFrame = {
    val bands = bandKeys(sh3).localCheckpoint()
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
  }

  /** [[c02CandOf]] from parquet (exposed for the scale probe:
    * candidate counts are the quantity the LSH equi-join bound is
    * about). */
  private[graft] def c02Cand(s: SparkSession, d: String): DataFrame =
    c02CandOf(shingleDocs(s, d, 3, hashed = true))

  /** c02 over a built (doc_id, shs) frame — shared by the parquet
    * entry point below and c14's shared-pass composition. Cost in
    * corpus scans of `sh3`'s lineage: ONE for the checkpointed band
    * keys + ONE for the candidate-doc shingle semi-join (round 4
    * paid three). */
  private[graft] def c02MinhashLshOf(sh3: DataFrame): DataFrame = {
    // Materialize the (tiny) pair set once: it feeds both the
    // semi-join below and the verify join. localCheckpoint blocks
    // are freed by the ContextCleaner when the plan is collected —
    // unlike round 2's session-lifetime cache() of the shingles.
    val cand = c02CandOf(sh3).localCheckpoint()
    val shCand = sh3.join(candIds(cand), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .localCheckpoint()
    verifyJaccard(cand, shCand, JACCARD_T)
  }

  /** [[c02MinhashLshOf]] from parquet, UNSORTED — the shared core
    * for composed consumers (c08/c30/c41) whose next operator
    * re-partitions anyway; the c02 query face adds the presentation
    * sort. */
  private[graft] def c02MinhashPairs(s: SparkSession, d: String): DataFrame =
    // The hashed shingle frame is checkpointed so the corpus is
    // scanned + md5-shingled ONCE; the band build and the verify
    // semi-join both read the (text-free, longs-only) materialized
    // blocks. At 100 TB that is ~corpus/4 of executor-local spill in
    // exchange for dropping a full scan+re-hash — and unlike round
    // 2's session-lifetime cache(), the blocks are freed by the
    // ContextCleaner as soon as the plan is collected.
    c02MinhashLshOf(shingleDocs(s, d, 3, hashed = true).localCheckpoint())

  def c02MinhashLsh(s: SparkSession, d: String): DataFrame =
    c02MinhashPairs(s, d).orderBy(col("da"), col("db"))

  // ---------------------------------------------------------------
  // c03 — SimHash (60-bit, term-frequency weighted, 4 blocking
  // chunks of 15 bits, Hamming ≤ 3 ⇒ exact by pigeonhole)
  // ---------------------------------------------------------------

  private val BITS = 60
  private[graft] val CHUNKS = 4
  private[graft] val CHUNK_BITS = 15
  private[graft] val HAMMING_T = 3

  /** c03 over a built (doc_id, fp) fingerprint frame — shared by the
    * parquet entry point below and c14's shared-pass composition.
    * The chunk table (4 short rows/doc) is localCheckpointed before
    * the self-join so the fingerprint scan runs once, not per side. */
  /** Unordered Hamming-pair core (c03's chunk blocking + bit_count
    * verify) — consumers that aggregate on top (m05's frame votes)
    * skip the presentation sort. */
  /** c03's pigeonhole candidates with CHUNK-PAIR bands: every C(4,2)
    * pair of 15-bit chunks forms a 30-bit band key. Exact for
    * hammingT ≤ CHUNKS − 2 (≤ t flipped bits corrupt ≤ t chunks, so
    * ≥ 2 survive and their pair collides); the 2^30 key space makes
    * collisions ≈ true near-identity, where single-chunk 2^15 keys
    * on LOW-ENTROPY fingerprints (m05's short frame slices) go
    * quadratic — measured at sf0.1: 786k frame candidates / 19 s
    * single-chunk vs duplicate-proportional / ~2 s with pair bands.
    * Costs 6 band rows per fingerprint instead of 4 — the standard
    * recall/candidate-volume trade, taken here only where the tight
    * radius licenses it. */
  private[graft] def c03PairsPairBand(fp: DataFrame, hammingT: Int): DataFrame = {
    require(hammingT <= CHUNKS - 2,
      s"pair-banding is exact only for hamming <= ${CHUNKS - 2}")
    val chunkCols = (0 until CHUNKS).map(c =>
      shiftright(col("fp"), c * CHUNK_BITS).bitwiseAND((1 << CHUNK_BITS) - 1))
    // Complement banding, the WIDEST exact keep-set (round-14 opt): ≤ t
    // flipped bits corrupt ≤ t chunks, so some (CHUNKS − t)-subset of
    // chunks is fully clean and its band collides — recall 1.0 at any
    // hammingT, like the pair scheme, but each key carries
    // (CHUNKS − t)·15 bits instead of 30. At t = 2 this IS the old
    // 6×pair-band layout; at t = 1 it is 4 bands of 45-bit keys, which
    // on m05's low-entropy frame fingerprints collapsed the raw band
    // join from 24.2M matched rows to the near-dup-proportional set
    // (measured at sf0.1; the verify filter + distinct are unchanged,
    // so the output set is identical).
    val keepSets = (0 until CHUNKS).combinations(CHUNKS - hammingT).toSeq
    val bandArr = array(keepSets.zipWithIndex.map { case (keep, b) =>
      struct(lit(b).as("band"),
        keep.map(chunkCols).reduce((a, c) => a * (1L << CHUNK_BITS) + c).as("bv"))
    }: _*)
    val bands = fp
      .select(col("doc_id"), col("fp"), explode(bandArr).as("b"))
      .select(col("doc_id"), col("fp"),
        col("b.band").as("band"), col("b.bv").as("bv"))
      .localCheckpoint()
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        col("x.fp").as("fpa"), col("y.fp").as("fpb"))
      // hamming BEFORE the pair-dedup distinct: bit_count is free in
      // the join's output stage, so the radius filter shrinks what
      // the distinct must shuffle (hamming is a function of the
      // fingerprints, so the distinct set is unchanged)
      .withColumn("hamming", expr("CAST(bit_count(fpa ^ fpb) AS BIGINT)"))
      .filter(col("hamming") <= hammingT)
      .distinct()
      .select(col("da"), col("db"), col("fpa"), col("fpb"), col("hamming"))
  }

  private[graft] def c03PairsOf(fp: DataFrame,
      hammingT: Int = HAMMING_T): DataFrame = {
    val chunks = fp.select(col("doc_id"), col("fp"), posexplode_outer(array(
      (0 until CHUNKS).map(c =>
        shiftright(col("fp"), c * CHUNK_BITS).bitwiseAND((1 << CHUNK_BITS) - 1)): _*)))
      .toDF("doc_id", "fp", "chunk", "cv")
      .localCheckpoint()
    val cand = chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        col("x.fp").as("fpa"), col("y.fp").as("fpb"))
    cand
      // radius filter before the pair-dedup distinct — see
      // [[c03PairsPairBand]]; same set, less shuffled
      .withColumn("hamming", expr("CAST(bit_count(fpa ^ fpb) AS BIGINT)"))
      .filter(col("hamming") <= hammingT)
      .distinct()
      .select(col("da"), col("db"), col("fpa"), col("fpb"), col("hamming"))
  }

  private[graft] def c03SimhashOf(fp: DataFrame): DataFrame =
    c03PairsOf(fp).orderBy(col("da"), col("db"))

  def c03Simhash(s: SparkSession, d: String): DataFrame =
    // The fingerprint is a per-document function, so it is ONE
    // codegen'd expression (graft.functions.SimHash60): no (doc,tok)
    // explode, no 60-column hash aggregate, no shuffle until the
    // chunk self-join. Round 2's relational form was the slowest
    // bench query (23.3 s at sf0.1); the oracle SQL keeps that
    // relational shape, which pins the expression's equivalence.
    c03SimhashOf(Tables.documents(s, d)
      .select(col("doc_id"), Portable.simhash60(col("text")).as("fp"))
      .where(col("fp").isNotNull))

  // ---------------------------------------------------------------
  // c04 — word-4-gram Jaccard with prefix + size filtering (t = 0.85)
  // ---------------------------------------------------------------

  private val NGRAM_T = 0.85
  private val NGRAM_N = 4

  /** The c04 candidate-pair stage (exposed for the scale probe).
    * 4-word ngrams (via [[shingleDocs]]): distinctive enough that the
    * global-df prefix order has real discriminating power even on a
    * small vocabulary (bigrams of a 40-word vocabulary all have huge
    * df, which made every prefix bucket quadratic — measured 72s at
    * sf0.1 in round 1). */
  private[graft] def c04Cand(s: SparkSession, d: String): DataFrame =
    c04CandOf(shingleDocs(s, d, NGRAM_N, hashed = true))

  /** The c04 candidate-pair stage over a built (doc_id, shs) 4-gram
    * frame (c14 passes the shared-pass checkpoint). */
  private[graft] def c04CandOf(docs: DataFrame): DataFrame =
    prefixCandOf(docs, NGRAM_T)

  /** The prefix-filter candidate stage at an arbitrary Jaccard
    * threshold `t` — c04's engine, reused by c44's ground-truth pass
    * (which needs completeness at JACCARD_T, not NGRAM_T). The
    * prefix bound is EXACT: every pair with jac ≥ t shares one of
    * each side's first |A| − ⌈t·|A|⌉ + 1 shingles under the global
    * (df, sh) order, so the candidate set provably contains all
    * qualifying pairs — what makes c44's "truth" side truth. */
  private[graft] def prefixCandOf(docs: DataFrame, t: Double): DataFrame = {
    // n = |distinct ngrams| rides along from size(shs), so the only
    // work before the prefix self-join is the global-df count and the
    // per-doc (df, sh) rank — round 2 additionally paid a per-doc
    // COUNT window and a full (doc_id, sh) DISTINCT shuffle.
    // explode_outer ≡ explode (shs has ≥1 element after the token-count
    // filter) but skips the inferred filter that would re-evaluate the
    // whole shingle transform twice per row.
    val ng = docs.select(col("doc_id"), explode_outer(col("shs")).as("sh"))
    // global df via a count window (not a groupBy + self-join back):
    // the ngram table is computed ONCE and flows through the df
    // window (shuffle by sh) into the rank window (shuffle by doc) —
    // two keyed exchanges total for the whole candidate path. n (the
    // per-doc distinct-ngram count) is a third window that reuses the
    // rank window's doc_id partitioning, so it adds no exchange.
    val sized = ng
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    // prefix bound: a pair with jac >= t shares one of each side's
    // first |A| - ceil(t*|A|) + 1 ngrams under the global (df, sh)
    // order (rarest first, so candidate buckets stay small).
    val prefix = sized
      .filter(col("rn") <= col("n") - expr(s"CAST(ceil($t * n) AS BIGINT)") + lit(1))
      .select(col("doc_id"), col("sh"), col("n"))
      // ~0.15·n rows per doc; materialize once so the self-join does
      // not replay the two window shuffles on both sides.
      .localCheckpoint()
    // size filter: jac >= t forces t <= |A|/|B| <= 1/t.
    prefix.as("x")
      .join(prefix.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id") &&
          col("y.n").cast(DoubleType) >= lit(t) * col("x.n") &&
          col("x.n").cast(DoubleType) >= lit(t) * col("y.n"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
  }

  /** c04 over a built (doc_id, shs) frame — shared by the parquet
    * entry point below and c14's shared-pass composition. */
  private[graft] def c04NgramJaccardOf(sh4: DataFrame): DataFrame = {
    val cand = c04CandOf(sh4).localCheckpoint()
    val ngCand = sh4.join(candIds(cand), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .localCheckpoint()
    verifyJaccard(cand, ngCand, NGRAM_T)
  }

  def c04NgramJaccard(s: SparkSession, d: String): DataFrame =
    // Same one-scan contract as c02MinhashLsh: the 4-gram frame is
    // materialized once and feeds both the prefix-filter windows and
    // the verify semi-join. Presentation sort here, not in the core
    // (see verifyJaccard).
    c04NgramJaccardOf(shingleDocs(s, d, NGRAM_N, hashed = true).localCheckpoint())
      .orderBy(col("da"), col("db"))

  // ---------------------------------------------------------------
  // c08 — corpus curation: the composed training-data pipeline
  // ---------------------------------------------------------------

  private val QUALITY_T = 0.6

  /** c08 — quality-filter + near-dup removal, summarized per
    * language: the end-to-end shape of a corpus-curation pass. A
    * document survives iff quality ≥ 0.6 (TextOps feature scorer) and
    * it is not the higher-id member of a MinHash-LSH near-dup pair
    * (canonical-keeps-lowest-id policy). At scale both inputs are the
    * operators benchmarked separately — this stage adds one anti-join
    * and one aggregation. */
  def c08CorpusCurate(s: SparkSession, d: String): DataFrame = {
    val dupIds = c02MinhashPairs(s, d).select(col("db").as("doc_id")).distinct()
    TextOps.withQualityCols(Tables.documents(s, d))
      .filter(col("quality") >= QUALITY_T)
      .join(dupIds, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_char")).as("n_chars"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // c09 — benchmark decontamination
  // ---------------------------------------------------------------

  private[graft] val DECON_N = 8
  private val EVAL_MOD = 10L

  /** c09 — benchmark decontamination: flag corpus documents whose
    * 8-word-ngram sets overlap a held-out evaluation set (the
    * standard pre-training hygiene pass — a train doc sharing long
    * ngrams with an eval benchmark leaks the benchmark). The eval
    * set here is the deterministic fixture doc_id % 10 == 0 — wide
    * enough that the corpus's synthetic near-dup pairs straddle the
    * boundary, so the query demonstrably catches real leaks.
    *
    * Scale shape: ngrams are 60-bit hashes from one narrow pass
    * ([[shingleDocs]] hashed=true). In production the eval side is a
    * REAL benchmark suite (~10^3-10^5 docs — tiny relative to the
    * corpus), so its distinct ngram set broadcasts and the corpus
    * never shuffles; the join strategy is left to AQE rather than a
    * forced broadcast() because THIS fixture's eval set is a 10%
    * corpus slice (big enough to contain near-dup partners), which
    * would not be broadcast-safe at 100× — AQE broadcasts when the
    * side is actually small, degrades to shuffle when not. */
  def c09Decontaminate(s: SparkSession, d: String): DataFrame = {
    val ng = shingleDocs(s, d, DECON_N, hashed = true)
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
    val evalNg = ng.filter(col("doc_id") % EVAL_MOD === 0)
      .select(col("sh")).distinct()
      .withColumn("__hit", lit(1L))
    ng.filter(col("doc_id") % EVAL_MOD =!= 0)
      .join(evalNg, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(coalesce(col("__hit"), lit(0L))).as("overlap_ct"))
      .filter(col("overlap_ct") > 0)
      .withColumn("overlap_ratio",
        col("overlap_ct").cast(DoubleType) / col("n").cast(DoubleType))
      .select(col("doc_id"), col("n"), col("overlap_ct"), col("overlap_ratio"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // c10 — near-dup clustering (connected components over c02 pairs)
  // ---------------------------------------------------------------

  /** c10 — connected components over the MinHash near-dup pairs:
    * transitively-linked documents form one cluster whose canonical
    * id is the minimum member (A~B, B~C ⇒ {A,B,C} dedup to A even if
    * A~C was never emitted as a pair). This is the step between pair
    * detection and actually dropping duplicates.
    *
    * Spark-first shape: iterative min-label propagation — per round,
    * every node takes min(own label, neighbors' labels); the loop is
    * DRIVER-ORCHESTRATED (a handful of rounds ≤ graph diameter, each
    * a keyed aggregation over the EDGE set only), the data never
    * leaves executors, and each round's frontier is localCheckpointed
    * so lineage stays flat. Near-dup graphs are overwhelmingly tiny
    * stars/paths, so this converges in 2-3 rounds; for DEEP graphs
    * (chains, 10^9-edge crawl graphs) use the round-bounded
    * [[connectedComponentsStar]] twin (c10b) — same contract. The
    * oracle computes the same components via a recursive-CTE
    * transitive closure — feasible because true clusters are small,
    * and a different algorithm entirely, which makes the agreement a
    * strong check. */
  /** Min-label propagation over an undirected (da, db) pair list →
    * (doc_id, cluster_id, cluster_sz). See [[c10DedupCluster]]. */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    // symmetric edge list + self-loops double as the node set
    val edges = pairs
      .unionByName(pairs.select(col("db").as("da"), col("da").as("db")))
      .localCheckpoint()
    // lazy checkpoints: the per-round convergence count is the
    // materializing action (see starEdges — one fewer job per round)
    var lbl = edges.select(col("da").as("node"), col("da").as("lbl"))
      .unionByName(edges.select(col("da").as("node"), col("db").as("lbl")))
      .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
      .localCheckpoint(false)
    var changed = 1L
    while (changed > 0) {
      val next = edges
        .join(lbl, edges("db") === lbl("node"))
        .select(edges("da").as("node"), col("lbl"))
        .unionByName(lbl.select(col("node"), col("lbl")))
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(false)
      changed = next.as("n").join(lbl.as("o"), "node")
        .filter(col("n.lbl") =!= col("o.lbl")).count()
      freeCheckpoint(lbl) // superseded round — next is materialized
      lbl = next
    }
    freeCheckpoint(edges) // final labels depend only on lbl's blocks
    val sizes = lbl.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_sz"))
    lbl.join(sizes, "lbl")
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_sz"))
      .orderBy(col("doc_id"))
  }

  def c10DedupCluster(s: SparkSession, d: String): DataFrame =
    connectedComponents(persistedNearDupPairs(s, d))

  /** c37 — duplicate-CLUSTER SIZE HISTOGRAM with dup-mass
    * accounting: for each near-dup family size, how many families,
    * how many documents they hold, and how many are REMOVABLE
    * (size − 1 per family — what c32's keep-list would delete). The
    * executive "how duplicated is my corpus" panel every curation
    * run reports before committing a dedup pass; singletons (docs in
    * no family) appear as the size-1 row so the docs column sums to
    * the corpus.
    *
    * Scale shape: component labels from the ROUND-BOUNDED large/
    * small-star contraction (O(log²) rounds on any topology — a deep
    * dup chain can't blow the round count the way min-label
    * propagation's O(diameter) loop could) + two keyed counts that
    * collapse to family grain then SIZE grain — the histogram
    * saturates at the largest family size. The singleton count is
    * corpus total − labeled count, two scalar aggregates. */
  def c37ClusterHistogram(s: SparkSession, d: String): DataFrame =
    clusterHistogram(
      starLabels(persistedNearDupPairs(s, d)),
      Tables.documents(s, d).select(col("doc_id")))

  /** c37's core over arbitrary (doc_id, cluster_id, …) labels + a
    * corpus id frame — factored out so the deep-chain spec can drive
    * the exact production path with a synthetic graph. */
  private[graft] def clusterHistogram(lblIn: DataFrame, corpusIds: DataFrame): DataFrame = {
    val labels = lblIn.localCheckpoint()
    val hist0 = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
    val singles = corpusIds.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(labels.agg(count(lit(1)).as("nc"))))
      .select(lit(1L).as("sz"), (col("n") - col("nc")).as("n_clusters"))
    // materialize the (histogram-sized, i.e. tiny) result eagerly so
    // the member-sized labels blocks can be freed NOW instead of
    // lingering across bench reps / a long-lived session
    val out = hist0.unionByName(singles)
      .groupBy(col("sz")).agg(sum(col("n_clusters")).as("n_clusters"))
      .select(col("sz"), col("n_clusters"),
        (col("sz") * col("n_clusters")).as("docs"),
        ((col("sz") - 1) * col("n_clusters")).as("dup_mass"))
      .orderBy(col("sz"))
      .localCheckpoint()
    freeCheckpoint(labels)
    out
  }

  /** Large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — the same
    * (doc_id, cluster_id, cluster_sz) contract as
    * [[connectedComponents]], built for graphs where min-label
    * propagation's O(diameter) rounds are pathological (long chains;
    * 10^9-edge crawl graphs). Each round is two edges-only keyed
    * window aggregations:
    *
    *  - large-star: every node u links its LARGER neighbors to
    *    m = min(N(u) ∪ u) — long tails collapse toward small ids;
    *  - small-star: every node u links its smaller neighbors ∪ itself
    *    to m = min(N<(u)) — local stars canonicalize;
    *
    * alternated until the (canonical, distinct) edge set is stable,
    * which takes O(log²) rounds on ANY topology — ClusterSpec pins a
    * 1,000-node chain converging in a handful of rounds where
    * propagation would need 999. Edges are kept canonically as
    * (hi, lo); on convergence they form min-rooted stars, so labels
    * read off directly. Every per-round frame is localCheckpointed —
    * flat lineage, blocks freed by the ContextCleaner. */
  private[graft] def connectedComponentsStar(pairs: DataFrame): DataFrame =
    starComponents(pairs)._1

  /** [[connectedComponentsStar]] + the round count (spec instrument):
    * the sized, doc_id-ordered declared contract over [[starEdges]]. */
  private[graft] def starComponents(pairs: DataFrame): (DataFrame, Int) = {
    val (e, rounds) = starEdges(pairs)
    val lbl = e.select(col("hi").as("node"), col("lo").as("lbl"))
      .unionByName(e.select(col("lo").as("node"), col("lo").as("lbl")))
      .distinct()
    val sizes = lbl.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_sz"))
    val out = lbl.join(sizes, "lbl")
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_sz"))
      .orderBy(col("doc_id"))
    (out, rounds)
  }

  /** The star-contraction loop itself → (converged canonical edge
    * set, rounds). */
  private[graft] def starEdges(pairs: DataFrame): (DataFrame, Int) = {
    val whi = Window.partitionBy(col("hi"))
    val wsrc = Window.partitionBy(col("src"))

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("src"), col("lo").as("dst"))
        .unionByName(e.select(col("lo").as("src"), col("hi").as("dst")))
      sym.withColumn("m", least(min(col("dst")).over(wsrc), col("src")))
        .where(col("dst") > col("src"))
        .select(col("dst").as("hi"), col("m").as("lo")) // dst > src >= m
        .where(col("hi") =!= col("lo"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val withM = e.withColumn("m", min(col("lo")).over(whi))
      withM.where(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo")) // lo > m here
        .unionByName(withM.select(col("hi"), col("m").as("lo")))
        .distinct()
    }

    // LAZY local checkpoints throughout the loop (round-14 opt): the
    // sig() aggregation that immediately follows each round is the
    // materializing action, so the eager checkpoint's dedicated
    // materialize-only job (one per round, pure overhead at any scale)
    // is fused away; lineage still truncates at first computation.
    var e = pairs
      .select(greatest(col("da"), col("db")).as("hi"),
        least(col("da"), col("db")).as("lo"))
      .where(col("hi") =!= col("lo"))
      .distinct().localCheckpoint(false)
    // Per-round convergence screen: (count, order-independent XOR
    // checksum over
    // the canonical edge hashes) in ONE scalar aggregation. Set
    // equality is still ARBITRATED by except — but except (a full
    // extra shuffle per round in the earlier form) now runs only on
    // the round the cheap signature already calls stable, i.e. once
    // on the final round in practice.
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(Portable.h60(concat_ws(":", col("hi"), col("lo"))))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var eSig = sig(e)
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      require(rounds <= 64, "large/small-star failed to converge in 64 rounds")
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = sig(next) // materializes the lazy checkpoint
      converged = nextSig == eSig && next.except(e).isEmpty
      freeCheckpoint(e) // superseded round — next is materialized
      e = next
      eSig = nextSig
    }
    (e, rounds)
  }

  /** Labels-only star components — (doc_id, cluster_id) without the
    * size join or determinism sort, for cluster-CONSUMING operators
    * (c32/c37) that re-aggregate anyway; c10b's declared face keeps
    * the full sized/ordered contract. */
  private[graft] def starLabels(pairs: DataFrame): DataFrame = {
    val e = starEdges(pairs)._1
    e.select(col("hi").as("node"), col("lo").as("lbl"))
      .unionByName(e.select(col("lo").as("node"), col("lo").as("lbl")))
      .distinct()
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** c10b — c10's clusters through the large/small-star contraction
    * (identical results, identical oracle): the implementation that
    * stays round-bounded when the near-dup graph is deep. */
  def c10bClusterStar(s: SparkSession, d: String): DataFrame =
    connectedComponentsStar(persistedNearDupPairs(s, d))

  /** c32 — cluster-representative selection: the step that turns
    * c10's near-dup clusters into an actual training corpus decision.
    * Within every cluster exactly ONE document survives — the highest
    * t02 quality score, doc_id as the tie-break — and the rest are
    * marked removed with a pointer at the survivor; documents in no
    * cluster keep themselves. This is the "keep best, drop rest"
    * policy of the C4/RefinedWeb pipelines (vs c01's keep-min-id at
    * exact grain).
    *
    * Scale stance: only CLUSTER MEMBERS (a few % of the corpus) enter
    * the per-cluster ranking window — singletons are identified by an
    * anti-join against the label table (cluster-member-sized, so AQE
    * broadcasts it) and never shuffle on cluster_id. The ranking
    * itself is a first_value over (cluster_id) partitions whose
    * running frame makes every row see the winner without a second
    * pass. quality is t02's portable linear score (no libm). */
  def c32ClusterKeep(s: SparkSession, d: String): DataFrame =
    clusterKeep(
      TextOps.withQualityCols(Tables.documents(s, d))
        .select(col("doc_id"), col("quality")),
      // round-bounded star components (identical contract/labels to the
      // propagation twin; O(log²) rounds even on deep dup chains)
      persistedNearDupPairs(s, d))

  /** c32's core over arbitrary (doc_id, quality) + dup-pair frames —
    * factored out so the deep-chain spec can drive the exact
    * production path with a synthetic graph. */
  private[graft] def clusterKeep(q: DataFrame, pairs: DataFrame): DataFrame = {
    val lbl = starLabels(pairs).localCheckpoint()
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    val members = q.join(lbl, Seq("doc_id"))
      .withColumn("kept_doc_id", first(col("doc_id")).over(w))
      .select(col("doc_id"), col("cluster_id"),
        when(col("doc_id") === col("kept_doc_id"), "kept")
          .otherwise("removed").as("status"),
        col("kept_doc_id"), col("quality"))
    val singles = q.join(lbl.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"),
        lit("kept").as("status"), col("doc_id").as("kept_doc_id"), col("quality"))
    members.unionByName(singles).orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // c13 — incremental dedup: new batch vs existing corpus
  // ---------------------------------------------------------------

  /** c13 — incremental (cross-corpus) dedup: classify every document
    * of an INCOMING batch against an EXISTING corpus — `exact_dup`
    * (normalized content hash already present), `near_dup` (verified
    * MinHash-LSH Jaccard ≥ 0.8 against some existing doc), else
    * `kept`. This is the steady-state ingest shape at 100 TB: the
    * corpus is deduped once, and every new crawl slice is checked
    * against it, never against itself all-pairs.
    *
    * Scale stance: both probes are equi-joins keyed by derived values
    * — content hash for exact (a left-semi join; the existing side is
    * a hash set that never rescans text), LSH band keys for near (new
    * bands ⋈ old bands only — strictly cheaper than c02's self-join),
    * and the Jaccard verify touches only candidate docs' shingles
    * (semi-join, same as c02). The incoming batch is typically ≪
    * corpus, so AQE broadcasts the new side's bands.
    *
    * The fixture split reuses t05's deterministic hash bucketing:
    * existing = bucket < 80 (the "train" corpus), incoming = the
    * rest — so the split itself is reproducible in the oracle. */
  def incrementalDedup(docs: DataFrame): DataFrame = {
    // ONE corpus scan feeds the split flag, the exact-dup hash AND the
    // shingle sets (round-14 opt — the per-side form scanned and
    // re-tokenized the corpus three times: newDocs checkpoint, then
    // shingleDocsOf over each side). The checkpoint is eager: feats is
    // consumed by several plan branches, and AQE runs independent
    // stages concurrently (a lazy checkpoint would recompute the
    // scan+hash per branch — measured on c14's shared pass).
    // hashedShingles + the size(shs) > 0 guard reproduce
    // shingleDocsOf's input contract exactly (docs under n tokens or
    // with null text drop; c14 pins the same pattern).
    val feats = docs
      .withColumn("__toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), col("__new"), md5(norm(col("text"))).as("h"),
        hashedShingles("__toks", 3).as("shs"))
      .localCheckpoint()
    val newDocs = feats.filter(col("__new"))
    val exactIds = newDocs
      .select(col("doc_id"), col("h"))
      .join(feats.filter(!col("__new")).select(col("h")).distinct(),
        Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("__ex", lit(1))
    val shNew = newDocs.select(col("doc_id"), col("shs"))
      .where(size(col("shs")) > 0)
    val shOld = feats.filter(!col("__new")).select(col("doc_id"), col("shs"))
      .where(size(col("shs")) > 0)
    val cand = bandKeys(shNew).as("x")
      .join(bandKeys(shOld).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct().localCheckpoint()
    val sh = shNew.unionByName(shOld)
      .join(candIds(cand), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .localCheckpoint()
    val nearIds = verifyJaccard(cand, sh, JACCARD_T)
      .select(col("da").as("doc_id")).distinct().withColumn("__nd", lit(1))
    newDocs.select(col("doc_id"))
      .join(exactIds, Seq("doc_id"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__ex") === 1, "exact_dup")
          .when(col("__nd") === 1, "near_dup")
          .otherwise("kept").as("status"))
      .orderBy(col("doc_id"))
  }

  def c13IncrementalDedup(s: SparkSession, d: String): DataFrame =
    incrementalDedup(Tables.documents(s, d).withColumn("__new",
      Portable.h60(concat(lit("split:"), col("doc_id").cast(StringType))) % 100 >= 80))

  private def sigTables(d: String): (String, String, String, String) = {
    val tag = Integer.toHexString(d.hashCode)
    (s"graft_sig_exact_$tag", s"graft_sig_band_$tag",
      s"graft_sig_sh_$tag", s"graft_sig_meta_$tag")
  }

  /** Full-corpus 3-shingle table name (the audits' feed; the split
    * tables above serve the incremental-dedup faces). */
  private def sigShAllTable(d: String): String =
    s"graft_sig_shall_${Integer.toHexString(d.hashCode)}"

  /** Exact-truth near-dup pair table name (da, db, na, nb, inter at
    * 3-shingle Jaccard ≥ JACCARD_T — the audits' ground truth). */
  private def sigTruthTable(d: String): String =
    s"graft_sig_truth_${Integer.toHexString(d.hashCode)}"

  /** Detector near-dup pair table name (c02's verified MinHash-LSH
    * pairs — what the cluster consumers fold; a SUBSET of truth by
    * the banding recall c44 measures). */
  private def sigNdTable(d: String): String =
    s"graft_sig_nd_${Integer.toHexString(d.hashCode)}"

  /** Store layout version: bumping it drift-invalidates persisted
    * signature stores built by older code (round 9 added the
    * full-corpus shingle table, the exact-truth pair table, and the
    * detector pair table). */
  private val SIG_STORE_VER = "sig4§"

  private[operators] def newSplitFlag: Column =
    Portable.h60(concat(lit("split:"), col("doc_id").cast(StringType))) % 100 >= 80

  /** Persist the EXISTING corpus's dedup signatures — the build-once
    * artifact every later ingest batch probes (the dedup twin of the
    * IVF/PQ index lifecycle, VectorOps.buildIvfIndex): the distinct
    * normalized content hashes (bucketed by hash), the MinHash band
    * keys (bucketed by key, so a batch's probe join co-locates on
    * the stored side without reshuffling the store), and the hashed
    * 3-shingle arrays (bucketed by doc_id — the verify semi-join's
    * key), plus the corpus token for drift-triggered rebuild. At
    * 100 TB this is what makes daily dedup affordable: the old
    * corpus is never re-read, re-normalized, or re-shingled. */
  def buildSigStore(s: SparkSession, d: String): Unit = {
    val (exactT, bandT, shT, metaT) = sigTables(d)
    val shAllT = sigShAllTable(d)
    Seq(exactT, bandT, shT, metaT, shAllT, sigTruthTable(d), sigNdTable(d))
      .foreach(ScaleOps.dropStale(s, _))
    // ONE full-corpus shingle pass feeds everything: the audits read
    // the whole table; the incremental-dedup faces' old-split tables
    // are derived by a bucketed-table filter, not a re-shingle.
    val shAll = shingleDocsOf(
      Tables.documents(s, d).select(col("doc_id"), col("text")), 3,
      hashed = true)
    ScaleOps.writeBucketed(shAll, shAllT, "doc_id", buckets = 16)
    val oldDocs = Tables.documents(s, d).filter(!newSplitFlag)
    ScaleOps.writeBucketed(
      oldDocs.select(md5(norm(col("text"))).as("h")).distinct(),
      exactT, "h", buckets = 16)
    val shOld = s.table(shAllT).filter(!newSplitFlag)
    ScaleOps.writeBucketed(bandKeys(shOld), bandT, "key", buckets = 16)
    ScaleOps.writeBucketed(shOld, shT, "doc_id", buckets = 16)
    // Exact near-dup GROUND TRUTH (prefix-filtered candidates,
    // Jaccard-verified at JACCARD_T — complete at that threshold):
    // the expensive side of every recall audit (c44/c45), computed
    // once per corpus here so audit re-runs pay a pair-table read,
    // not a prefix self-join + verify. Pair-grain, tiny.
    val truthT = sigTruthTable(d)
    val shAll2 = s.table(shAllT)
    val tCand = prefixCandOf(shAll2, JACCARD_T).localCheckpoint()
    val shCand = shAll2.join(candIds(tCand), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
    verifyJaccard(tCand, shCand, JACCARD_T)
      .select(col("da"), col("db"), col("na"), col("nb"), col("inter"))
      .write.mode("overwrite").format("parquet").saveAsTable(truthT)
    // The DETECTOR's verified pair set (c02's output, a recall-bound
    // subset of truth): what the cluster consumers (c10/c10b/c32/
    // c37/c21b) actually fold — also once per corpus, so cluster
    // re-runs start from a pair table (output-proportional) instead
    // of re-running the banded self-join + verify.
    c02MinhashLshOf(shAll2)
      .select(col("da"), col("db"))
      .write.mode("overwrite").format("parquet").saveAsTable(sigNdTable(d))
    s.createDataFrame(Seq(Tuple1(
      SIG_STORE_VER + ScaleOps.corpusToken(s, d, "documents.parquet"))))
      .toDF("token").write.mode("overwrite").format("parquet").saveAsTable(metaT)
  }

  /** The persisted full-corpus 3-shingle table ([[buildSigStore]]'s
    * `shall` face), rebuilt if absent or corpus-drifted — the shared
    * feed of the audit family (c44/c45): an audit re-run costs a
    * bucketed-parquet signature read, never a corpus re-scan +
    * re-shingle. */
  private def persistedShingles3(s: SparkSession, d: String): DataFrame = {
    val (_, _, _, metaT) = sigTables(d)
    val want = SIG_STORE_VER + ScaleOps.corpusToken(s, d, "documents.parquet")
    def token(): Option[String] =
      if (!s.catalog.tableExists(metaT)) None
      else s.table(metaT).collect().headOption.map(_.getString(0))
    if (!token().contains(want)) buildSigStore(s, d)
    s.table(sigShAllTable(d))
  }

  /** The persisted exact-truth pair table ([[buildSigStore]]), same
    * rebuild guard — the recall audits' ground truth read back at
    * pair grain instead of recomputed per query. */
  private def persistedTruthPairs(s: SparkSession, d: String): DataFrame = {
    val (_, _, _, metaT) = sigTables(d)
    val want = SIG_STORE_VER + ScaleOps.corpusToken(s, d, "documents.parquet")
    def token(): Option[String] =
      if (!s.catalog.tableExists(metaT)) None
      else s.table(metaT).collect().headOption.map(_.getString(0))
    if (!token().contains(want)) buildSigStore(s, d)
    s.table(sigTruthTable(d))
  }

  /** The persisted detector near-dup pair set ([[buildSigStore]]),
    * same rebuild guard — identical rows to `c02MinhashLsh(s, d)
    * .select(da, db)`, read back at pair grain for the cluster
    * consumers. */
  private[graft] def persistedNearDupPairs(s: SparkSession, d: String): DataFrame = {
    val (_, _, _, metaT) = sigTables(d)
    val want = SIG_STORE_VER + ScaleOps.corpusToken(s, d, "documents.parquet")
    def token(): Option[String] =
      if (!s.catalog.tableExists(metaT)) None
      else s.table(metaT).collect().headOption.map(_.getString(0))
    if (!token().contains(want)) buildSigStore(s, d)
    s.table(sigNdTable(d))
  }

  /** c13b — c13's ANSWERS from the persisted signature store (oracle
    * shared verbatim): build once per corpus if absent or drifted,
    * then the read path touches only the NEW batch's text — its
    * hashes probe the stored hash table, its band keys equi-join the
    * stored (key-bucketed) band table, and the verify semi-join
    * pulls stored shingle rows for candidate old docs alone. The old
    * corpus is read as bucketed parquet signatures, never as text. */
  def c13bIncrementalPersisted(s: SparkSession, d: String): DataFrame = {
    val (exactT, bandT, shT, metaT) = sigTables(d)
    def token(): Option[String] =
      if (!s.catalog.tableExists(metaT)) None
      else s.table(metaT).collect().headOption.map(_.getString(0))
    if (!token().contains(
        SIG_STORE_VER + ScaleOps.corpusToken(s, d, "documents.parquet")))
      buildSigStore(s, d)
    val newDocs = Tables.documents(s, d).filter(newSplitFlag).localCheckpoint()
    val exactIds = newDocs
      .select(col("doc_id"), md5(norm(col("text"))).as("h"))
      .join(s.table(exactT), Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("__ex", lit(1))
    val shNew = shingleDocsOf(newDocs, 3, hashed = true).localCheckpoint()
    val cand = bandKeys(shNew).as("x")
      .join(s.table(bandT).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct().localCheckpoint()
    val sh = shNew.unionByName(s.table(shT))
      .join(candIds(cand), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .localCheckpoint()
    val nearIds = verifyJaccard(cand, sh, JACCARD_T)
      .select(col("da").as("doc_id")).distinct().withColumn("__nd", lit(1))
    newDocs.select(col("doc_id"))
      .join(exactIds, Seq("doc_id"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__ex") === 1, "exact_dup")
          .when(col("__nd") === 1, "near_dup")
          .otherwise("kept").as("status"))
      .orderBy(col("doc_id"))
  }

  /** c33 — fuzzy decontamination at WHOLE-DOCUMENT grain: every
    * training document classified against the eval set (doc_id %
    * 10 = 0, c09's stand-in suite) — `exact_dup` (normalized content
    * hash present in eval), `near_dup` (verified MinHash-LSH Jaccard
    * ≥ 0.8 against some eval doc), else `kept`. Complements the
    * n-gram decon family: c09/c09b count local 8-gram hits, c16
    * finds long verbatim substrings, c18 catches embedding-level
    * paraphrases; c33 is the document-level near-dup face (the
    * train/test-overlap audit of the dedup literature). It is
    * [[incrementalDedup]] with the eval set as the existing corpus,
    * so the scale shape is c13's: band keys join train×eval only —
    * never train×train — and the Jaccard verify touches candidate
    * documents' shingles only. */
  def c33DeconFuzzy(s: SparkSession, d: String): DataFrame =
    incrementalDedup(Tables.documents(s, d)
      .withColumn("__new", col("doc_id") % EVAL_MOD =!= 0))

  // ---------------------------------------------------------------
  // c14 — consensus dedup: pairs flagged by ≥ 2 of the 3 near-dup
  // detectors
  // ---------------------------------------------------------------

  /** c14 — consensus near-dup pairs: a pair counts as a duplicate
    * only when at least TWO of the three detectors (MinHash-LSH
    * Jaccard ≥ 0.8, SimHash Hamming ≤ 3, 4-gram Jaccard ≥ 0.85)
    * agree. The production rationale: each detector has a distinct
    * false-positive surface (LSH collisions, SimHash's bag-of-words
    * blindness to order, prefix-filter threshold effects), and
    * requiring agreement suppresses all three at the cost of recall
    * on borderline pairs — the standard precision-first setting for
    * irreversible corpus deletion. All three detectors consume ONE
    * shared corpus pass ([[sharedDedupPass]]: tokenize + hash
    * 3-shingles + 4-grams + SimHash in a single scan, checkpointed)
    * — round 4 planned them as disjoint lineages and re-scanned /
    * re-shingled the corpus ~6×. The consensus groupBy itself runs
    * over the tiny emitted pair lists, so it is free at scale.
    * n_methods counts DISTINCT detectors (not pair-list rows), so a
    * detector that ever emitted a duplicate pair could not
    * single-handedly pass the ≥2 gate; the oracle recomputes all
    * three pipelines in one WITH chain and must agree on every pair
    * AND the per-pair method list. */
  def c14DedupConsensus(s: SparkSession, d: String): DataFrame = {
    val shared = sharedDedupPass(Tables.documents(s, d))
    // The guards reproduce each detector's own input contract: the
    // shingle paths drop docs shorter than n tokens (empty shs), the
    // SimHash path drops null fingerprints — so each *Of pipeline
    // sees exactly the frame its parquet entry point would build.
    val mh = c02MinhashLshOf(
      shared.select(col("doc_id"), col("shs3").as("shs"))
        .where(size(col("shs")) > 0))
      .select(col("da"), col("db")).withColumn("method", lit("minhash"))
    val sh = c03PairsOf(
      shared.select(col("doc_id"), col("fp")).where(col("fp").isNotNull))
      .select(col("da"), col("db")).withColumn("method", lit("simhash"))
    val ng = c04NgramJaccardOf(
      shared.select(col("doc_id"), col("shs4").as("shs"))
        .where(size(col("shs")) > 0))
      .select(col("da"), col("db")).withColumn("method", lit("ngram"))
    mh.unionByName(sh).unionByName(ng)
      .groupBy(col("da"), col("db"))
      .agg(
        countDistinct(col("method")).as("n_methods"),
        array_join(array_sort(collect_set(col("method"))), ",").as("methods"))
      .filter(col("n_methods") >= 2)
      .orderBy(col("da"), col("db"))
  }

  // ---------------------------------------------------------------
  // c15 — paragraph-level boilerplate removal (C4/RefinedWeb-style)
  // ---------------------------------------------------------------

  private[graft] val PARA_TOKENS = 10
  private[graft] val PARA_DF_K = 2

  /** c15 — boilerplate paragraph removal: the one dedup granularity
    * c01-c14 miss. Those operate on whole documents; real corpora are
    * polluted WITHIN documents by boilerplate (nav bars, cookie
    * banners, footers) that repeats across thousands of pages — the
    * C4/RefinedWeb pass strips any paragraph occurring in more than
    * K distinct documents. The fixture text carries no newlines, so a
    * "paragraph" is a deterministic run of [[PARA_TOKENS]]
    * consecutive tokens (non-overlapping, trailing partial run
    * included) — the structure-free analogue of a line run, and
    * exactly replayable in the oracle.
    *
    * Output: (doc_id, n_paras, n_removed, kept_text) — kept_text is
    * the surviving runs rejoined in document order ('' when every
    * run was boilerplate, so stripped-empty docs stay visible).
    *
    * Scale shape: equi-join/groupBy only. One narrow pass explodes
    * runs (carrying the 60-bit run hash), the document-frequency
    * table collapses to one row per DISTINCT paragraph (vocabulary-
    * sized — it saturates, like t13's ngram counts), the corpus
    * re-joins it on the hash (AQE broadcasts while it fits, degrades
    * to shuffle when not), and the rebuild is one keyed aggregation
    * per doc_id. No all-pairs anywhere; every stage's shuffle is
    * linear in input or bounded by the paragraph vocabulary. */
  /** Array of [[PARA_TOKENS]]-token non-overlapping runs of a
    * pre-split token column (trailing partial run included); EMPTY
    * array for a null token column, so per-row streaming use is
    * null-safe. Shared by c15 and Jobs.boilerplateIngest. */
  private[graft] def paragraphRuns(toksCol: String): Column =
    // the native non-overlapping-run kernel (functions.ParaRuns):
    // same output as the HOF formulation transform(sequence(0,
    // ceil(size/P)-1), i -> concat_ws(' ', slice(toks, i*P+1, P)))
    // without its per-run lambda dispatch + slice allocation; it
    // also yields [] for an empty token array natively (the phantom
    //-run hazard the old `size > 0` guard existed for). Null tokens
    // → null, coalesced to [] for per-row streaming null-safety.
    coalesce(expr(s"graft_para_runs($toksCol, $PARA_TOKENS)"),
      array().cast(ArrayType(StringType)))

  /** 60-bit hashes of the paragraphs occurring in more than
    * [[PARA_DF_K]] DISTINCT documents of `docs` — c15's boilerplate
    * definition as a standalone (small: bounded by the repeated-
    * paragraph vocabulary) frame, for ingest-time filtering. */
  private[graft] def boilerplateHashes(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), explode_outer(paragraphRuns("toks")).as("para"))
      .select(col("doc_id"), Portable.h60(col("para")).as("ph"))
      .distinct()
      .groupBy(col("ph")).agg(count(lit(1)).as("pdf"))
      .filter(col("pdf") > PARA_DF_K)
      .select(col("ph"))

  private[graft] def c15ParagraphDedupOf(docs: DataFrame): DataFrame = {
    val paras = docs
      .where(col("text").isNotNull)
      .withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), posexplode_outer(paragraphRuns("toks")))
      .toDF("doc_id", "pidx", "para")
      .withColumn("ph", Portable.h60(col("para")))
    // Paragraph document-frequency: dedupe (doc, hash) first so a
    // run repeated inside ONE doc counts once, like C4's rule.
    val pdf = paras.select(col("doc_id"), col("ph")).distinct()
      .groupBy(col("ph")).agg(count(lit(1)).as("pdf"))
    paras.join(pdf, Seq("ph"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("pdf") > PARA_DF_K, 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            // collect_list skips the nulls `when` leaves for removed
            // runs; array_sort on (pidx, para) structs restores
            // document order (pidx is unique per doc).
            array_sort(collect_list(
              when(col("pdf") <= PARA_DF_K, struct(col("pidx"), col("para"))))),
            x => x.getField("para")),
          " ").as("kept_text"))
      .orderBy(col("doc_id"))
  }

  def c15ParagraphDedup(s: SparkSession, d: String): DataFrame =
    c15ParagraphDedupOf(Tables.documents(s, d))

  /** c15's stripping in its pipeline-input form: the document table
    * with boilerplate runs removed — (doc_id, lang, source, text),
    * fully-boilerplate docs dropped. Dimension columns ride through
    * the groupBy keys (same cardinality as doc_id — no extra
    * exchange) instead of a corpus×corpus join back to the source. */
  private[graft] def paragraphCleaned(docs: DataFrame): DataFrame = {
    val paras = docs
      .where(col("text").isNotNull)
      .withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), col("lang"), col("source"),
        posexplode_outer(paragraphRuns("toks")))
      .toDF("doc_id", "lang", "source", "pidx", "para")
      .withColumn("ph", Portable.h60(col("para")))
    val pdf = paras.select(col("doc_id"), col("ph")).distinct()
      .groupBy(col("ph")).agg(count(lit(1)).as("pdf"))
    paras.join(pdf, Seq("ph"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(array_join(
        transform(
          array_sort(collect_list(
            when(col("pdf") <= PARA_DF_K, struct(col("pidx"), col("para"))))),
          x => x.getField("para")),
        " ").as("text"))
      .where(col("text") =!= "")
  }

  // ---------------------------------------------------------------
  // c17 — the end-to-end corpus-curation pipeline as ONE query
  // ---------------------------------------------------------------

  /** c17 — the full curation pass a production corpus actually runs,
    * composed end-to-end and verified as one query: strip boilerplate
    * paragraphs (c15), remove MinHash near-duplicates computed over
    * the CLEANED text (c02 — stripping changes shingles, so dedup
    * after stripping catches pairs the raw text hides behind shared
    * boilerplate), gate on quality scored over the cleaned text
    * (t02's features), assign the deterministic train/valid/test
    * split (t05), and report (split, lang) corpus statistics.
    *
    * Scale shape: every stage is one of the already-benchmarked
    * pipelines; composition adds one localCheckpoint of the cleaned
    * corpus (consumed by both the dedup chain and the quality pass —
    * one c15 computation, not two) plus one anti-join and the final
    * small aggregation. The oracle replays the entire chain in a
    * single WITH over the same parameterized fragments the component
    * oracles use. */
  def c17CurationPipeline(s: SparkSession, d: String): DataFrame = {
    val cleaned = paragraphCleaned(Tables.documents(s, d)).localCheckpoint()
    val dupIds = c02MinhashLshOf(
      shingleDocsOf(cleaned, 3, hashed = true).localCheckpoint())
      .select(col("db").as("doc_id")).distinct()
    TextOps.withQualityCols(cleaned)
      .filter(col("quality") >= QUALITY_T)
      .join(dupIds, Seq("doc_id"), "left_anti")
      .withColumn("bucket",
        Portable.h60(concat(lit("split:"), col("doc_id").cast(StringType))) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_char")).as("n_chars"))
      .orderBy(col("split"), col("lang"))
  }

  /** c17b — [[c17CurationPipeline]] with the stage a production
    * curation pass always adds: DECONTAMINATION. The eval slice
    * (doc_id % EVAL_MOD = 0 — the stand-in benchmark suite) is
    * excluded from the corpus up front (boilerplate document
    * frequency is computed over the corpus ONLY — a benchmark is
    * external and must not vote on what counts as boilerplate), and
    * any corpus document whose CLEANED text shares a DECON_N-token
    * ngram with the RAW eval slice (benchmarks don't pass through
    * your cleaning) is dropped alongside near-dups before the
    * quality gate and split stats.
    *
    * Scale shape: c17's chain plus one more equi-join family — the
    * eval ngram set is c09's (broadcasts in production, AQE decides
    * here), the contaminated-id set is a semi-join + distinct over
    * candidate hits only. Nothing quadratic is added. */
  def c17bCurationDecon(s: SparkSession, d: String): DataFrame = {
    val cleaned = paragraphCleaned(
      Tables.documents(s, d).filter(col("doc_id") % EVAL_MOD =!= 0))
      .localCheckpoint()
    // ONE tokenize+hash pass over the cleaned corpus feeds BOTH the
    // dedup 3-shingles and the decontamination 8-grams (the c14
    // shared-pass pattern — without it the corpus is split and
    // md5-shingled once per consumer).
    val feats = cleaned
      .withColumn("__toks", split(col("text"), "\\s+"))
      .select(col("doc_id"),
        hashedShingles("__toks", 3).as("shs3"),
        hashedShingles("__toks", DECON_N).as("shs8"))
      .localCheckpoint()
    val dupIds = c02MinhashLshOf(
      feats.select(col("doc_id"), col("shs3").as("shs"))
        .where(size(col("shs")) > 0))
      .select(col("db").as("doc_id")).distinct()
    val evalNg = shingleDocs(s, d, DECON_N, hashed = true)
      .filter(col("doc_id") % EVAL_MOD === 0)
      .select(explode_outer(col("shs")).as("sh"))
      .where(col("sh").isNotNull).distinct()
    val contamIds = feats
      .select(col("doc_id"), explode_outer(col("shs8")).as("sh"))
      .where(col("sh").isNotNull)
      .join(evalNg, Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    TextOps.withQualityCols(cleaned)
      .filter(col("quality") >= QUALITY_T)
      .join(dupIds, Seq("doc_id"), "left_anti")
      .join(contamIds, Seq("doc_id"), "left_anti")
      .withColumn("bucket",
        Portable.h60(concat(lit("split:"), col("doc_id").cast(StringType))) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_char")).as("n_chars"))
      .orderBy(col("split"), col("lang"))
  }

  // ---------------------------------------------------------------
  // c16 — EXACT-substring decontamination (character level)
  // ---------------------------------------------------------------

  private[graft] val SUB_W = 40
  private[graft] val SUB_STRIDE = 8

  /** c16 — exact-substring decontamination, the character-level
    * complement of c09's token ngrams (Lee et al.'s "Deduplicating
    * Training Data" runs exactly this pass with suffix arrays): flag
    * corpus documents sharing a ≥ (W+s−1)-character EXACT substring
    * with the eval set. Token-ngram overlap misses contamination
    * that straddles tokenization — whitespace/punctuation
    * normalization, mid-word truncation — while a character window
    * catches any verbatim copy.
    *
    * Spark-first shape instead of a suffix array (which needs global
    * sorted adjacency — hostile to partitioning): the EVAL side
    * hashes every W-char window (stride 1, native one-pass
    * graft_winhash60), the CORPUS side only every s-th window. Any
    * shared substring of length ≥ W+s−1 fully contains some
    * corpus-strided window, and that exact window is in the eval
    * set — no false negatives at the guarantee length, corpus-side
    * hashing and join volume cut by s×. Both sides are narrow
    * per-row passes into one equi-join keyed on the 60-bit window
    * hash. Join strategy stays with AQE, same reasoning as c09:
    * THIS fixture's eval slice is 10% of the corpus (stride-1
    * windows ≈ the strided corpus set in volume), which is not
    * broadcast-safe and planly shuffles; in production the eval
    * side is a real benchmark suite — tiny — whose distinct window
    * set broadcasts and the corpus never shuffles. The oracle
    * replays the identical windows/hashes via substr, so agreement
    * is bit-exact. */
  def c16SubstringDecon(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val evalW = docs.filter(col("doc_id") % EVAL_MOD === 0)
      .select(explode_outer(call_function("graft_winhash60",
        col("text"), lit(SUB_W), lit(1))).as("h"))
      .where(col("h").isNotNull).distinct()
    val corpusW = docs.filter(col("doc_id") % EVAL_MOD =!= 0)
      .select(col("doc_id"), explode_outer(call_function("graft_winhash60",
        col("text"), lit(SUB_W), lit(SUB_STRIDE))).as("h"))
      .where(col("h").isNotNull)
    corpusW.join(evalW, Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hit_windows"))
      .orderBy(col("doc_id"))
  }

  /** c20 — consensus DECONTAMINATION report (c14's consensus pattern
    * applied to the hygiene family): every corpus document flagged by
    * the token-ngram detector (c09) or the character-substring
    * detector (c16), with how many and which methods agree. The two
    * detectors have complementary blind spots — token ngrams miss
    * copies that straddle tokenization, char windows miss nothing
    * verbatim but say nothing about paraphrase-with-shared-phrases —
    * so n_methods = 2 is near-certain leakage and the single-method
    * rows are the review queue. (c18's semantic face keys on vec_id —
    * the fixture has no doc↔vec linkage, so it reports separately.)
    *
    * Scale shape: ONE corpus scan (shared-pass checkpoint carrying
    * both feature sets — longs only), two linear semi-join flag
    * stages, and one keyed agg over flagged docs only (the union
    * input is output-proportional — flagged rows, not the corpus). */
  def c20DeconConsensus(s: SparkSession, d: String): DataFrame = {
    // ONE corpus scan feeds both detectors (the c14 shared-pass
    // pattern): per row, the token 8-grams AND the char windows —
    // stride 1 on the eval side, stride s on the corpus side,
    // exactly as the standalone c16 computes them.
    val feats = Tables.documents(s, d)
      .withColumn("__toks", split(col("text"), "\\s+"))
      .select(col("doc_id"),
        hashedShingles("__toks", DECON_N).as("shs"),
        when(col("doc_id") % EVAL_MOD === 0,
          call_function("graft_winhash60", col("text"), lit(SUB_W), lit(1)))
          .otherwise(
            call_function("graft_winhash60", col("text"), lit(SUB_W), lit(SUB_STRIDE)))
          .as("wins"))
      .localCheckpoint()
    val ng = feats.select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .where(col("sh").isNotNull)
    val evalNg = ng.filter(col("doc_id") % EVAL_MOD === 0)
      .select(col("sh")).distinct()
    val tokFlag = ng.filter(col("doc_id") % EVAL_MOD =!= 0)
      .join(evalNg, Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    val wn = feats.select(col("doc_id"), explode_outer(col("wins")).as("h"))
      .where(col("h").isNotNull)
    val evalW = wn.filter(col("doc_id") % EVAL_MOD === 0)
      .select(col("h")).distinct()
    val subFlag = wn.filter(col("doc_id") % EVAL_MOD =!= 0)
      .join(evalW, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    tokFlag.withColumn("method", lit("ngram"))
      .unionByName(subFlag.withColumn("method", lit("substring")))
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("method")).as("n_methods"),
        array_join(array_sort(collect_set(col("method"))), ",").as("methods"))
      .orderBy(col("doc_id"))
  }

  /** c46's span width (8 tokens, the decon grain) and the df
    * threshold above which a span counts as cross-document
    * repetition (any second document suffices). */
  private val SCRUB_DF = 2

  /** c46 — DUPLICATED-SPAN SCRUB: remove from every document each
    * token covered by an 8-gram that occurs in ≥ SCRUB_DF distinct
    * documents — the substring-grain removal of "Deduplicating
    * Training Data Makes Language Models Better" (Lee et al. 2021)
    * at n-gram resolution: c01/c02 drop whole near-dup documents and
    * c31/c42 dedup storage chunks, but a mostly-novel document
    * carrying a recycled boilerplate paragraph keeps the paragraph
    * under all of those; this rewrites the document with the
    * repeated spans excised (overlapping hot grams merge naturally —
    * a position is kept unless SOME hot gram covers it).
    *
    * Scale shape: positional 8-gram hashes (one narrow codegen'd
    * pass — longs, not strings, shuffle ~8 bytes/token), ONE
    * ngram-grain exchange for the df table, a semi-join of the
    * positional grams against the hot slice (both sides already
    * partitioned by gram from the agg — exchange reuse), then one
    * doc-grain aggregation of hot-gram start positions. The
    * cover/rebuild step is the native `graft_scrub_spans` kernel
    * ([[graft.functions.ScrubSpans]]): sorted starts + a two-pointer
    * cover walk, O(n_toks + n_starts) per doc in one fused codegen'd
    * loop (the interpreted `filter(sequence…, p -> NOT exists(…))`
    * HOF it replaces re-scanned the starts per token — the same
    * interpreter tax t38 escaped via CollapseRuns). The md5 of the
    * rebuilt text verifies the full output byte-for-byte without
    * hauling long strings through the compare. */
  def c46SpanScrub(s: SparkSession, d: String): DataFrame =
    spanScrubOf(Tables.documents(s, d))

  /** c46's core over any `(doc_id, text, …)` frame. */
  private[graft] def spanScrubOf(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .withColumn("__toks", split(col("text"), "\\s+"))
    val grams = docs
      .where(size(col("__toks")) >= DECON_N)
      .select(col("doc_id"), posexplode(expr(
        s"graft_gram_h60(__toks, $DECON_N)")))
      .select(col("doc_id"), col("pos").as("i"), col("col").as("g"))
      .localCheckpoint() // feeds the df table AND the join-back
    val hot = grams.groupBy(col("g"))
      .agg(count_distinct(col("doc_id")).as("df"))
      .where(col("df") >= SCRUB_DF)
      .select(col("g"))
    val starts = grams.join(hot, Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("i")).as("starts"))
    docs.join(starts, Seq("doc_id"), "left")
      .withColumn("__starts",
        coalesce(col("starts"), array().cast(ArrayType(IntegerType))))
      .withColumn("__kept", expr(
        s"graft_scrub_spans(__toks, __starts, $DECON_N)"))
      .select(col("doc_id"),
        size(col("__toks")).cast(LongType).as("n_toks"),
        (size(col("__toks")) - size(col("__kept"))).cast(LongType)
          .as("n_removed"),
        md5(concat_ws(" ", col("__kept"))).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  /** c47 — SCRUB ACCOUNTING: the corpus-level ledger of what c46's
    * span scrub would remove, per language — documents touched,
    * tokens removed, and the integer per-mille share of the token
    * budget lost — the before/after report a destructive rewrite
    * owes (c43's dedup-adjusted accounting, at span grain): if one
    * language loses 30% of its tokens to boilerplate, the t36 mix
    * plan must re-weigh BEFORE training, not after. Cost: c46's
    * pipeline plus one doc-grain join and a ≤|langs|-row rollup. */
  def c47ScrubAccounting(s: SparkSession, d: String): DataFrame = {
    val removed = spanScrubOf(Tables.documents(s, d))
      .select(col("doc_id"), col("n_removed"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_tok"))
      .join(removed, Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(coalesce(col("n_removed"), lit(0L)) > 0L, 1L).otherwise(0L))
          .as("n_docs_touched"),
        sum(col("n_tok")).as("tok_total"),
        sum(coalesce(col("n_removed"), lit(0L))).as("tok_removed"))
      .select(col("lang"), col("n_docs"), col("n_docs_touched"),
        col("tok_total"), col("tok_removed"),
        expr("(1000 * tok_removed) div tok_total").as("removed_x1000"))
      .orderBy(col("lang"))
  }

  /** c39 — per-document n-gram NOVELTY (duplication density): for
    * every document, what fraction of its distinct 8-gram hashes
    * occurs in at least one OTHER document — the memorization-risk /
    * boilerplate-density score the dedup literature reports per doc
    * (a doc can dodge c01/c02 as a whole yet be 90% recycled
    * phrases; this measures that directly, complementing c15's
    * paragraph grain and c09's vs-eval grain).
    *
    * Scale shape: ONE checkpointed (doc, distinct-ngram-hashes) pass
    * feeds both faces (the c14 shared-scan pattern), and the df
    * table is never joined back at ngram grain: a df = 1 ngram has
    * exactly one owner, so `min(doc_id)` on the SAME keyed count
    * names it, per-doc unique counts fall out of a doc-grain count
    * over the df = 1 slice, and n_shared = size(shs) − n_unique.
    * ONE ngram-grain exchange total (the naive join-back shape
    * shuffles ngram grain three times — measured 6.3 s → 2.4 s at
    * sf0.1); the doc-grain join is output-sized. df ≥ 2 over
    * DISTINCT per-doc ngrams means "some other doc has it". */
  def c39NgramNovelty(s: SparkSession, d: String): DataFrame = {
    val docNg = shingleDocs(s, d, DECON_N, hashed = true).localCheckpoint()
    val uniq = docNg.select(col("doc_id"), explode(col("shs")).as("sh"))
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
      .where(col("df") === 1)
      .groupBy(col("owner")).agg(count(lit(1)).as("n_unique"))
    val shared = col("n_ngrams") - coalesce(col("n_unique"), lit(0L))
    docNg.select(col("doc_id"), size(col("shs")).cast(LongType).as("n_ngrams"))
      .join(uniq, col("doc_id") === col("owner"), "left")
      .select(col("doc_id"), col("n_ngrams"), shared.as("n_shared"),
        (shared.cast(DoubleType) / col("n_ngrams").cast(DoubleType))
          .as("shared_frac"))
      .orderBy(col("doc_id"))
  }

  /** c41 audit: pairs drawn per similarity bin. */
  private val AUDIT_N = 10

  /** c41 — DEDUP AUDIT SAMPLE: a reproducible, similarity-stratified
    * sample of c02's verified near-dup pairs for human review —
    * before a destructive dedup pass deletes millions of documents,
    * someone signs off on a sample, and a sample drawn only from the
    * jac ≈ 1 mass (where dups concentrate) never shows the reviewer
    * the risky borderline band. Pairs are binned by Jaccard in 0.05
    * steps and AUDIT_N drawn per bin by seeded hash order, so the
    * borderline bins are covered no matter how skewed the mass is,
    * and re-running draws the identical sample.
    *
    * Scale shape: c02's output-proportional pair set + ONE bin-keyed
    * window whose rank filter compiles to WindowGroupLimit (each
    * partition keeps its local top-AUDIT_N before the ≤21-bin
    * exchange). The bin is integer arithmetic — (20·inter) div
    * (na+nb−inter) — so no float boundary can disagree with the
    * oracle. */
  def c41AuditSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("bin"))
      .orderBy(col("hk"), col("da"), col("db"))
    c02MinhashPairs(s, d)
      .withColumn("bin", expr("(20 * inter) div (na + nb - inter)"))
      .withColumn("hk", Portable.h60(concat_ws(":", lit("audit"),
        col("da").cast(StringType), col("db").cast(StringType))))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= AUDIT_N)
      .select(col("bin"), col("rk"), col("da"), col("db"),
        col("inter"), col("jac"))
      .orderBy(col("bin"), col("rk"))
  }

  /** c44 — LSH QUALITY AUDIT: the measured recall of c02's
    * MinHash-LSH blocking against EXACT ground truth, by similarity
    * band. Ground truth is the complete pair set with 3-shingle
    * Jaccard ≥ JACCARD_T from the prefix filter (exact-complete at
    * that threshold — see [[prefixCandOf]]); the audited detector is
    * c02's band stage, whose recall is the probabilistic quantity
    * (1 − (1 − s^R)^BANDS) the banding scheme trades against
    * candidate volume. The report answers the question every dedup
    * deployment owes its users — "what fraction of true near-dups
    * does the cheap detector miss, and at which similarity levels?"
    * — with integer-exact bins and ratios (c41's (20·inter) div
    * union binning; recall as (1000·caught) div truth), so both
    * engines agree bit-for-bit.
    *
    * Scale shape: BOTH expensive sides are store artifacts now —
    * ground truth reads the persisted exact-pair table
    * ([[persistedTruthPairs]]: prefix self-join + Jaccard verify,
    * computed once per corpus in [[buildSigStore]]'s untimed
    * lifecycle), and the audited detector's signature feed reads the
    * persisted shingle table ([[persistedShingles3]]). The audit
    * itself is the detector's banded equi-join plus ONE pair-grain
    * left join and a bin aggregation — output-proportional; a re-run
    * never re-scans or re-shingles the corpus. */
  def c44LshRecall(s: SparkSession, d: String): DataFrame = {
    val sh3 = persistedShingles3(s, d).localCheckpoint()
    val lsh = c02CandOf(sh3).withColumn("__c", lit(1L))
    persistedTruthPairs(s, d)
      .join(lsh, Seq("da", "db"), "left")
      .withColumn("bin", expr("(20 * inter) div (na + nb - inter)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("__c").isNotNull, 1L).otherwise(0L)).as("n_caught"))
      .select(col("bin"), col("n_true"), col("n_caught"),
        expr("(1000 * n_caught) div n_true").as("recall_x1000"))
      .orderBy(col("bin"))
  }

  /** The band layouts c45 compares — every grouping of the 16-minima
    * signature into bands × rows with full coverage. */
  private[graft] val LSH_CONFIGS = Seq((2, 8), (4, 4), (8, 2))

  /** c45 — LSH BAND-LAYOUT TRADEOFF: c44's recall audit swept over
    * the (bands × rows) groupings of the SAME 16-minima signature —
    * the tuning table for the detector's one real dial. More bands
    * of fewer rows raise the per-band match probability s^rows and
    * with it recall (1 − (1 − s^rows)^bands) AND candidate volume;
    * this measures the trade on the actual corpus instead of
    * trusting the formula. Identical pairs (bin 20) share every
    * minimum, so every layout must catch them — recall_x1000 = 1000
    * on that row is a built-in sanity contract (spec-pinned, along
    * with the (4,4) slice equalling c44's report exactly).
    *
    * Scale shape: the signature feed and the exact ground truth are
    * BOTH persisted store artifacts ([[persistedShingles3]],
    * [[persistedTruthPairs]]) — one layout only regroups the minima
    * into keys, so per layout the cost is the banded self-join (the
    * object under study) plus a pair-grain join against the shared
    * checkpointed truth table. Nothing re-scans the corpus. */
  def c45LshTradeoff(s: SparkSession, d: String): DataFrame = {
    val sh3 = persistedShingles3(s, d).localCheckpoint()
    val truth = persistedTruthPairs(s, d)
      .withColumn("bin", expr("(20 * inter) div (na + nb - inter)"))
      .select(col("da"), col("db"), col("bin"))
      .localCheckpoint()
    LSH_CONFIGS.map { case (b, r) =>
      val bk = bandKeysCfg(sh3, b, r).localCheckpoint()
      val lsh = bk.as("x")
        .join(bk.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
        .distinct()
        .withColumn("__c", lit(1L))
      truth.join(lsh, Seq("da", "db"), "left")
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("__c").isNotNull, 1L).otherwise(0L)).as("n_caught"))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("r_rows"),
          col("bin"), col("n_true"), col("n_caught"),
          expr("(1000 * n_caught) div n_true").as("recall_x1000"))
    }.reduce(_.unionByName(_)).orderBy(col("bands"), col("bin"))
  }

  /** Number of fixture eval SUITES for c38 (eval docs partitioned by
    * (doc_id div 10) % N_SUITES — deterministic, oracle-replayable). */
  private val N_SUITES = 3L

  /** c38 — MULTI-SUITE decontamination matrix: c20's consensus report
    * with the eval side parameterized BY SUITE. Real releases
    * decontaminate against many benchmark suites at once and must
    * account per suite — "drop for suite A, keep for suite B" is a
    * per-suite decision, and the release note wants the full
    * (doc, suite, methods) matrix, not one merged flag. The fixture
    * partitions the eval slice (doc_id % 10 = 0) into suite0..suite2
    * by (doc_id div 10) % 3.
    *
    * Scale shape: identical to c20 — ONE corpus scan builds both
    * feature sets; each detector's flag stage is ONE equi-join on the
    * feature hash, now carrying the suite id on the eval side
    * (adding a suite column to the build side of a hash join costs
    * bytes, not an extra shuffle), and the matrix agg runs over
    * flagged (doc, suite) rows only — output-proportional. Suites
    * are data, not code: adding a suite changes the eval-side rows,
    * never the plan. */
  def c38MultiSuiteDecon(s: SparkSession, d: String): DataFrame =
    multiSuiteFlags(Tables.documents(s, d))
      .groupBy(col("doc_id"), col("suite"))
      .agg(
        countDistinct(col("method")).as("n_methods"),
        array_join(array_sort(collect_set(col("method"))), ",").as("methods"))
      .orderBy(col("doc_id"), col("suite"))

  /** c38's distinct (doc_id, suite, method) contamination flags over
    * any documents-shaped frame — the shared core of the doc-grain
    * matrix above and s07's suite×method release summary. */
  private[graft] def multiSuiteFlags(docs: DataFrame): DataFrame = {
    val feats = docs
      .withColumn("__toks", split(col("text"), "\\s+"))
      .select(col("doc_id"),
        hashedShingles("__toks", DECON_N).as("shs"),
        when(col("doc_id") % EVAL_MOD === 0,
          call_function("graft_winhash60", col("text"), lit(SUB_W), lit(1)))
          .otherwise(
            call_function("graft_winhash60", col("text"), lit(SUB_W), lit(SUB_STRIDE)))
          .as("wins"))
      .localCheckpoint()
    val suite = concat(lit("suite"),
      (expr(s"doc_id div $EVAL_MOD") % N_SUITES).cast(StringType))
    val ng = feats.select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .where(col("sh").isNotNull)
    val evalNg = ng.filter(col("doc_id") % EVAL_MOD === 0)
      .select(suite.as("suite"), col("sh")).distinct()
    val tokFlag = ng.filter(col("doc_id") % EVAL_MOD =!= 0)
      .join(evalNg, Seq("sh"))
      .select(col("doc_id"), col("suite")).distinct()
    val wn = feats.select(col("doc_id"), explode_outer(col("wins")).as("h"))
      .where(col("h").isNotNull)
    val evalW = wn.filter(col("doc_id") % EVAL_MOD === 0)
      .select(suite.as("suite"), col("h")).distinct()
    val subFlag = wn.filter(col("doc_id") % EVAL_MOD =!= 0)
      .join(evalW, Seq("h"))
      .select(col("doc_id"), col("suite")).distinct()
    tokFlag.withColumn("method", lit("ngram"))
      .unionByName(subFlag.withColumn("method", lit("substring")))
  }

  // ---------------------------------------------------------------
  // c19 — within-corpus exact-substring pairs via winnowing
  // ---------------------------------------------------------------

  private[graft] val SELF_W = 32 // window chars
  private[graft] val SELF_K = 9 // winnow span in windows → 40-char guarantee

  /** c19 — WITHIN-corpus exact-substring duplication (the self-join
    * face of c16's eval-vs-corpus decontamination): pairs of documents
    * sharing a verbatim character run of ≥ SELF_W + SELF_K − 1 = 40
    * chars, with the count of shared winnowing fingerprints as the
    * duplication signal. This is MOSS-style winnowing (Schleimer et
    * al.) standing in for Lee et al.'s suffix-array ExactSubstr pass,
    * which needs globally sorted adjacency — hostile to partitioning.
    *
    * c16's dense-vs-strided asymmetry does NOT survive a self-join
    * (every doc would need the dense side — full corpus chars as join
    * rows). Winnowing restores the guarantee SYMMETRICALLY: per doc,
    * hash every W-char window (native graft_winhash60, stride 1),
    * then keep the minimum of each K consecutive hashes (native
    * graft_slidemin — one O(n) deque pass). Any shared run of
    * W+K−1 chars contains K consecutive equal window hashes in BOTH
    * docs, and the min over that exact K-window is selected on both
    * sides — same fingerprint value, no false negatives at the
    * guarantee length, while join rows collapse to the distinct
    * minima: ≈ 2/(K+1) of the windows (~4.5× fewer at K=9).
    *
    * Scale shape: fingerprint extraction is one narrow per-row pass
    * (ZERO shuffle — array_distinct runs inside the row, so even the
    * per-doc dedup never exchanges); the checkpointed fingerprint
    * table (longs only) feeds both sides of one equi-join. A
    * fingerprint shared by k docs yields k·(k−1)/2 pair rows —
    * output-proportional, the same bound as c02's band join; the
    * boilerplate that would make a fingerprint hot is exactly what
    * c15 strips upstream in a composed pipeline. */
  /** Distinct winnowing fingerprints of a text column as a per-row
    * array — EMPTY (never null) for null or shorter-than-W text, so
    * streaming per-row use is null-safe. Shared by c19 and the
    * ingest-time twin (Jobs.substringDupIngest). */
  private[graft] def winnowFps(textCol: Column): Column =
    when(textCol.isNotNull, array_distinct(
      call_function("graft_slidemin",
        call_function("graft_winhash60", textCol, lit(SELF_W), lit(1)),
        lit(SELF_K))))
      .otherwise(array().cast(ArrayType(LongType)))

  /** [[c19SubstringSelfdup]] over an arbitrary `(doc_id, text, …)`
    * frame (spec surface). */
  private[graft] def c19SubstringSelfdupOf(docs: DataFrame): DataFrame = {
    // explode_outer + isNotNull (not explode): dodges the
    // InferFiltersFromGenerate size()>0 filter re-evaluating the
    // window-hash + winnow chain per row — see c02Cand/c16.
    val fp = docs
      .select(col("doc_id"), explode_outer(winnowFps(col("text"))).as("fp"))
      .where(col("fp").isNotNull)
      .localCheckpoint()
    fp.as("a")
      .join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("da"), col("db"))
  }

  def c19SubstringSelfdup(s: SparkSession, d: String): DataFrame =
    c19SubstringSelfdupOf(Tables.documents(s, d))

  /** c29 containment threshold: flag when ≥ half of EITHER doc's
    * fingerprints appear in the other. Deliberately asymmetric-aware:
    * a short doc quoted inside a long one has cont_short ≈ 1 while
    * Jaccard ≈ |short|/|long| ≈ 0 — c02/c03/c04 never fire. */
  private val CONT_T = 0.5

  /** c29 — asymmetric CONTAINMENT pairs (quote/subset detection):
    * for candidate pairs sharing winnowed substring fingerprints
    * (c19's machinery), emit the DIRECTIONAL overlap ratios
    * cont_a = |fp(A)∩fp(B)|/|fp(A)| and cont_b = …/|fp(B)|, keeping
    * pairs where either side is ≥ [[CONT_T]]-contained. This is the
    * relation near-dup Jaccard misses by construction — containment
    * is what catches a benchmark item quoted inside a long crawl
    * page, or a doc assembled from another's paragraphs.
    *
    * Scale shape: identical to c19 (one narrow fingerprint pass, one
    * output-proportional fp equi-join, two broadcast-size joins
    * against the per-doc fingerprint counts) — the ratios add no
    * shuffle beyond c19's. */
  private[graft] def c29ContainmentOf(docs: DataFrame): DataFrame = {
    val fp = docs
      .select(col("doc_id"), explode_outer(winnowFps(col("text"))).as("fp"))
      .where(col("fp").isNotNull)
      .localCheckpoint()
    val sizes = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    fp.as("a")
      .join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("za"), col("da") === col("za.doc_id"))
      .join(sizes.as("zb"), col("db") === col("zb.doc_id"))
      .select(col("da"), col("db"),
        col("za.n").as("na"), col("zb.n").as("nb"), col("inter"),
        (col("inter").cast(DoubleType) / col("za.n").cast(DoubleType)).as("cont_a"),
        (col("inter").cast(DoubleType) / col("zb.n").cast(DoubleType)).as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= CONT_T)
      .orderBy(col("da"), col("db"))
  }

  def c29Containment(s: SparkSession, d: String): DataFrame =
    c29ContainmentOf(Tables.documents(s, d))

  /** c30 — the cross-SOURCE duplication matrix: near-dup pairs (c02)
    * rolled up by the unordered source pair they straddle. This is
    * the provenance question every multi-source corpus audit asks —
    * which feeds copy from which (mirrors, scrapers, syndication) —
    * and it prices the marginal value of adding a source BEFORE
    * paying to ingest it. Diagonal rows (src = src) measure
    * within-feed redundancy. Scale shape: c02's candidate machinery
    * end-to-end plus two broadcast-size joins against the (doc_id,
    * source) projection and one grain-bounded aggregation —
    * |sources|² rows out, whatever the corpus. */
  def c30CrossSourceDup(s: SparkSession, d: String): DataFrame = {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    c02MinhashPairs(s, d)
      .select(col("da"), col("db"))
      .join(src.select(col("doc_id").as("da"), col("source").as("sa")), Seq("da"))
      .join(src.select(col("doc_id").as("db"), col("source").as("sb")), Seq("db"))
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** c19b — the per-DOCUMENT face of c19: what fraction of a doc's
    * winnowing fingerprints is shared with ANY other document. This
    * is the decision signal the ExactSubstr pass actually filters
    * on (Lee et al. drop or trim documents by their duplicated-span
    * fraction) — pair lists (c19) are the audit trail, the fraction
    * is the gate.
    *
    * Scale shape: fingerprints one narrow pass; document frequency
    * one keyed agg over (fp) — saturating with the distinct
    * fingerprint vocabulary; one re-join on fp (AQE broadcasts the
    * df table while it fits); one keyed agg per doc. No self-join at
    * all — this face never materializes pairs, so it survives even
    * corpora where boilerplate makes pair output quadratic. */
  private[graft] def c19bSubstringDupfracOf(docs: DataFrame): DataFrame = {
    val fp = docs
      .select(col("doc_id"), explode_outer(winnowFps(col("text"))).as("fp"))
      .where(col("fp").isNotNull)
      .localCheckpoint()
    val df = fp.groupBy(col("fp")).agg(count(lit(1)).as("fdf"))
    fp.join(df, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_fp"),
        sum(when(col("fdf") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("dup_frac",
        col("n_shared").cast(DoubleType) / col("n_fp").cast(DoubleType))
      .orderBy(col("doc_id"))
  }

  def c19bSubstringDupfrac(s: SparkSession, d: String): DataFrame =
    c19bSubstringDupfracOf(Tables.documents(s, d))

  /** c21 — SPLIT-LEAKAGE audit: non-train documents (t05's valid/test
    * buckets) that share a verbatim ≥ 40-char run with some TRAIN
    * document. A random document-level split does NOT make the eval
    * side clean — near-duplicate pairs straddle the boundary, and a
    * model memorizing the train copy aces the test copy. This is the
    * hygiene check every pipeline should run on its OWN split, not
    * just against external benchmarks (c09/c16/c18 cover those).
    *
    * Shape: one winnow-fingerprint pass (c19's machinery — narrow,
    * checkpointed longs), split flags derived per-row from the t05
    * bucket hash (no join against a split table), then one bipartite
    * train×eval fingerprint equi-join aggregated per leaking eval
    * doc. Train-side fingerprints collapse to DISTINCT values, so
    * the join is value-keyed like c19's and output-proportional. */
  def c21SplitLeakage(s: SparkSession, d: String): DataFrame = {
    val fp = Tables.documents(s, d)
      .withColumn("bucket",
        Portable.h60(concat(lit("split:"), col("doc_id").cast(StringType))) % 100)
      .select(col("doc_id"), col("bucket"),
        explode_outer(winnowFps(col("text"))).as("fp"))
      .where(col("fp").isNotNull)
      .localCheckpoint()
    val trainFp = fp.filter(col("bucket") < 80).select(col("fp")).distinct()
    fp.filter(col("bucket") >= 80)
      .join(trainFp, Seq("fp"), "left_semi")
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n_leaked_fp"))
      .withColumn("split", when(col("bucket") < 90, "valid").otherwise("test"))
      .select(col("doc_id"), col("split"), col("n_leaked_fp"))
      .orderBy(col("doc_id"))
  }

  /** The t05 hash-split of an id column — shared by c21b's old/new
    * split derivation so repair needs NO split table or join. */
  private def hashSplitOf(id: Column): Column = {
    val b = Portable.h60(concat(lit("split:"), id.cast(StringType))) % 100
    when(b < 80, "train").when(b < 90, "valid").otherwise("test")
  }

  /** c21b — split-leakage REPAIR: c21 finds near-duplicate pairs that
    * straddle the train/eval boundary; the canonical fix is to move
    * every near-dup CLUSTER wholly into one split so no pair can
    * straddle it. Rule: a cluster adopts the hash-split of its
    * representative (the min-doc_id member = the cluster_id c10
    * already assigns) — deterministic, and because t05's split is
    * itself derived per-row from `h60("split:" + id)`, the repaired
    * assignment needs no stored split table and NO join: new_split is
    * one hash of the cluster_id. Singleton documents (in no near-dup
    * pair) are their own representative and never move.
    *
    * Shape: c02 candidates + c10 label propagation (the only
    * shuffles), then one left join of corpus ids against the cluster
    * labels (cluster membership is output-proportional — tiny next
    * to the corpus) and per-row hashing. Post-repair leakage is ZERO
    * by construction: a straddling pair shares a cluster, and a
    * cluster lands in exactly one split (ClusterSpec pins this on a
    * seeded cross-split near-dup pair). */
  def c21bSplitRepair(s: SparkSession, d: String): DataFrame =
    splitRepair(Tables.documents(s, d).select(col("doc_id")),
      persistedNearDupPairs(s, d))

  /** c21b's core over arbitrary id + dup-pair frames — factored out so
    * the deep-chain spec can drive the exact production path with a
    * synthetic graph (ClusterKeepSpec's precedent). */
  private[graft] def splitRepair(ids: DataFrame, pairs: DataFrame): DataFrame = {
    // round-bounded star components (same min-id label contract as the
    // propagation twin, O(log²) rounds on deep dup chains) — the last
    // cluster consumer moved off the O(diameter) path
    val cc = starLabels(pairs)
    ids
      .join(cc, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .select(col("doc_id"), col("cluster_id"),
        hashSplitOf(col("doc_id")).as("old_split"),
        hashSplitOf(col("cluster_id")).as("new_split"))
      .withColumn("moved",
        (col("new_split") =!= col("old_split")).cast(LongType))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // c09b — decontamination behind a Bloom-filter prefilter
  // ---------------------------------------------------------------

  /** Bloom sizing for the fixture's eval side (~50k distinct ngrams
    * at sf0.1): 2^17 expected items, 2^20 bits — 8 bits per item at
    * capacity, ~2% per-PROBE false positives (k=6). Fine for c09b,
    * where probe FPs only cost a little extra verify-join traffic
    * and can never change the result. At 100 TB with a real
    * benchmark suite, scale bits linearly with the eval ngram count:
    * ~10 bits/item ≈ 1% FPR, so 10^8 eval ngrams ≈ 125 MB of sketch
    * where a broadcast hashmap of longs costs gigabytes. When probe
    * FPs are TERMINAL (no exact verify after — the streaming ingest
    * filter), size by the union bound over a document's probes
    * instead: see Jobs.decontaminateIngest. */
  private val BLOOM_ITEMS = 1L << 17
  private val BLOOM_BITS = 1L << 20

  /** Serialized Bloom filter over a BIGINT column (null when `df` is
    * empty — probe nothing). Shared by c09b and the streaming ingest
    * decontamination (Jobs.decontaminateIngest), which passes its
    * own union-bound sizing. */
  private[graft] def bloomOfLongs(df: DataFrame, c: String,
      items: Long = BLOOM_ITEMS, bits: Long = BLOOM_BITS): Array[Byte] =
    df.agg(call_function("graft_bloom_agg",
        col(c), lit(items), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** c09b — c09's decontamination RESULT through a different physical
    * plan: the eval ngram set is collapsed into a Bloom filter
    * (Spark's own runtime-filter sketch, built by the
    * `graft_bloom_agg` aggregate registered in GraftExtensions), the
    * corpus side probes it with the codegen'd `graft_might_contain`
    * BEFORE any join, and only probe survivors (true hits + ~1%
    * false positives) reach the exact semi-join verify. No false
    * negatives ⇒ the verify join sees every true hit ⇒ the output is
    * bit-identical to c09 (the oracle is literally c09's).
    *
    * The sketch arrives as an UNCORRELATED SCALAR SUBQUERY — the
    * exact wiring Spark's InjectRuntimeFilter uses for its own
    * bloom-pruned joins — so the filter bytes never round-trip
    * through the driver as a plan literal: the subquery runs once and
    * its result ships with the task closure. Expressed as SQL TEXT
    * over the registered functions (the a23b/t04b surface): a
    * SQL-only user gets the identical plan.
    *
    * Why this is the 100 TB shape: c09 relies on AQE broadcasting
    * the eval set as a join hashmap, which dies when the benchmark
    * suite's ngram set outgrows broadcast (hashmaps cost ~30+ bytes
    * per long). A ~10-bits-per-item sketch (≈1% per-probe FPR)
    * broadcasts at ~25× less memory, and the post-probe shuffle
    * carries only candidate rows (~overlap + FPR of corpus ngrams)
    * instead of every corpus ngram — probe FPs here cost only that
    * verify traffic, never correctness, so per-probe sizing is the
    * right target (contrast Jobs.decontaminateIngest).
    * The per-doc totals aggregation is map-side-combined (one row
    * per doc crosses the wire), so the dominant corpus-sized term is
    * a narrow scan + codegen'd probe with zero shuffle. */
  def c09bDecontaminateBloom(s: SparkSession, d: String): DataFrame = {
    // Session-unique view name, dropped right after spark.sql's EAGER
    // analysis resolves it into the plan — a fixed name would leak
    // into (and could collide with) the session-global temp-view
    // namespace of concurrent or user-defined views.
    val view = s"c09_ng_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    shingleDocs(s, d, DECON_N, hashed = true)
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      .createOrReplaceTempView(view)
    try s.sql(
      s"""WITH evalng AS (
         |  SELECT DISTINCT sh FROM $view WHERE doc_id % $EVAL_MOD = 0),
         |corpus AS (
         |  SELECT doc_id, sh FROM $view WHERE doc_id % $EVAL_MOD <> 0),
         |hits AS (
         |  SELECT doc_id, COUNT(*) AS overlap_ct
         |  FROM corpus
         |  WHERE graft_might_contain(
         |          (SELECT graft_bloom_agg(sh, ${BLOOM_ITEMS}L, ${BLOOM_BITS}L)
         |           FROM evalng),
         |          sh)
         |    AND sh IN (SELECT sh FROM evalng)
         |  GROUP BY doc_id),
         |totals AS (SELECT doc_id, COUNT(*) AS n FROM corpus GROUP BY doc_id)
         |SELECT t.doc_id, t.n, h.overlap_ct,
         |       CAST(h.overlap_ct AS DOUBLE) / CAST(t.n AS DOUBLE) AS overlap_ratio
         |FROM totals t JOIN hits h ON t.doc_id = h.doc_id
         |ORDER BY t.doc_id""".stripMargin)
    finally s.catalog.dropTempView(view)
  }

  /** c43 — DEDUP-ADJUSTED token accounting (the "effective dataset
    * size" report): per source, raw vs effective docs/tokens where
    * effective counts only c32's cluster representatives (best-
    * quality doc per near-dup cluster, singletons keep themselves).
    * This is the number that matters when pricing a corpus: raw
    * token counts overstate what a model actually sees after dedup,
    * and the per-source dup_tokens column is how you find which
    * supplier's crawl is redundant. Composes c32's keep decision
    * with t03's token grain — no new algorithm, which is the point:
    * the report is trustworthy because both inputs already have
    * oracles.
    *
    * Scale shape: c32's own shape (banded candidate join + members-
    * only window) plus ONE doc_id equi-join against the narrow token
    * projection and a source-grain aggregation — strictly cheaper
    * than the c32 it contains. */
  def c43EffectiveTokens(s: SparkSession, d: String): DataFrame =
    // the corpus face folds the persisted detector pairs (same rows
    // c02 computes live); the generic form below stays self-contained
    // for arbitrary frames (s07's snapshot read)
    effectiveTokensOf(Tables.documents(s, d),
      Some(persistedNearDupPairs(s, d)))

  /** [[c43EffectiveTokens]] over any documents-shaped frame (s07's
    * release report runs the accounting on a snapshot read);
    * `pairsOpt` supplies a precomputed near-dup pair set, else the
    * detector runs on `docs` directly. */
  private[graft] def effectiveTokensOf(docs: DataFrame,
      pairsOpt: Option[DataFrame] = None): DataFrame = {
    val pairs = pairsOpt.getOrElse(
      c02MinhashLshOf(shingleDocsOf(docs, 3, hashed = true).localCheckpoint())
        .select(col("da"), col("db")))
    val keep = clusterKeep(
      TextOps.withQualityCols(docs).select(col("doc_id"), col("quality")),
      pairs)
      .select(col("doc_id"), col("status"))
    docs
      .select(col("doc_id"), col("source"),
        coalesce(size(split(col("text"), "\\s+")), lit(0))
          .cast(LongType).as("nt"))
      .join(keep, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("raw_docs"),
        sum(col("nt")).as("raw_tokens"),
        sum(when(col("status") === "kept", 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("status") === "kept", col("nt")).otherwise(0L))
          .as("kept_tokens"))
      .withColumn("dup_tokens", col("raw_tokens") - col("kept_tokens"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------
  // c42 — content-defined chunking (CDC) dedup
  // ---------------------------------------------------------------

  /** c42 rolling-window width (the hash context deciding a cut). */
  private[graft] val CDC_W = 16
  /** c42 cut modulus — a window whose hash ≡ 0 (mod 64) ends a
    * chunk, so chunks average ~64 chars on random text. */
  private[graft] val CDC_DIV = 64L
  /** c42 minimum chunk size: a content-defined cut closer than this
    * to its predecessor CANDIDATE (or the doc start) is dropped —
    * FastCDC's min bound, avg/4. The predecessor-candidate rule (vs
    * previous-ACCEPTED) keeps the pass stateless/replayable while
    * still guaranteeing >= CDC_MIN between surviving content cuts:
    * a survivor's predecessor candidate is >= the previous survivor. */
  private[graft] val CDC_MIN = 16
  /** c42 maximum chunk size: any gap between accepted cuts (or doc
    * ends) longer than this gets forced cuts every CDC_MAX chars —
    * FastCDC's max bound, avg*4. Forced positions are pure
    * arithmetic on the two adjacent accepted cuts, so the pass is
    * per-gap parallel, not sequential. A forced cut may leave ONE
    * sub-min trailing chunk per over-long gap (the price of the
    * stateless rule); min violations cannot chain. */
  private[graft] val CDC_MAX = 256

  /** c42 — CONTENT-DEFINED chunking dedup (the Rabin/FastCDC family,
    * Xia et al. FAST'16): chunk boundaries are chosen by the CONTENT
    * (a rolling-window hash hitting 0 mod [[CDC_DIV]]), not by fixed
    * offsets, so an insertion early in a document shifts only the
    * chunk it lands in — every later boundary re-synchronizes and
    * the remaining chunks still deduplicate. That is the property
    * c31's fixed-stride chunks fundamentally lack (one leading char
    * shifts every stride boundary) and the reason CAS/backup systems
    * and long-document near-dedup use CDC. Reported: every chunk
    * content recurring across the corpus, with occurrence and
    * document counts.
    *
    * Engine portability: windows are [[graft.functions.WinHash60]]
    * code-point windows, cuts land at window start + [[CDC_W]], and
    * chunk identity is the portable hash of the chunk substring —
    * the oracle replays boundary selection, the [[CDC_MIN]]/[[CDC_MAX]]
    * bound passes, and chunk hashing verbatim (list_transform +
    * substr).
    *
    * Chunk-size bounds (FastCDC's min/max, without its sequential
    * scan): the min pass drops content cuts closer than [[CDC_MIN]]
    * to their predecessor candidate, the max pass forces cuts every
    * [[CDC_MAX]] chars inside any remaining over-long gap — so
    * boilerplate/whitespace-heavy text (where every window hashes
    * identically) degrades to uniform ~CDC_MAX chunks instead of a
    * ~1-char chunk-per-char storm with one massively hot chunk_h
    * group, and a document with NO content cuts still chunks. Both
    * passes are stateless per-row array transforms (replayable in
    * the oracle), at the documented price that one sub-min trailing
    * chunk can follow each forced cut.
    *
    * Scale shape: chunking is ONE narrow codegen'd pass (native
    * rolling hash + per-row array geometry — no shuffle); the only
    * exchange is the chunk-hash aggregation, map-side combined and
    * linear in total chunks (~chars/64). Output is duplicate-
    * proportional. At 100 TB this is c01's shape at sub-document
    * grain. */
  def c42CdcDedup(s: SparkSession, d: String): DataFrame =
    c42CdcDedupOf(Tables.documents(s, d))

  /** [[c42CdcDedup]] over any `(doc_id, text, …)` frame (spec
    * surface for the boundary-resynchronization property). */
  private[graft] def c42CdcDedupOf(docs: DataFrame): DataFrame =
    chunkRowsOf(docs)
      .groupBy(col("chunk_h"))
      .agg(min(col("ln")).as("chunk_len"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occ") > 1)
      .orderBy(col("chunk_h"))

  /** The CDC pass at (doc, chunk) grain — one narrow codegen'd pass,
    * no shuffle. Shared by batch [[c42CdcDedupOf]] (corpus-grain agg)
    * and the streaming chunk-store ingest
    * (graft.streaming.Jobs.chunkDedupIngest), whose per-batch
    * partials aggregate to the identical corpus table because every
    * agg here is decomposable (min/sum/sum with one-batch-per-doc
    * arrival). */
  private[graft] def chunkRowsOf(docs: DataFrame): DataFrame = {
    val n = length(col("text"))
    docs
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      // cut selection (candidates where the CDC_W-code-point rolling
      // hash ≡ 0 mod CDC_DIV, a cut past the last char is no cut),
      // the CDC_MIN predecessor-candidate thin, and the CDC_MAX
      // per-gap forced-cut fill — all ONE fused native byte-walk
      // ([[graft.functions.CdcCuts]]), bit-identical to the four-HOF
      // chain it replaced (transform→filter→filter→gap-fill over
      // graft_winhash60 output; CdcCutsSpec pins the parity). The
      // HOF chain paid an interpreted lambda dispatch per WINDOW
      // (~len elements) plus three intermediate ArrayData
      // materializations per document, on a corpus-rewrite path.
      .withColumn("cl", call_function("graft_cdc_cuts",
        col("text"), lit(CDC_W), lit(CDC_DIV), lit(CDC_MIN), lit(CDC_MAX)))
      .withColumn("starts", concat(array(lit(1)), col("cl")))
      // nexts[j] pairs with starts[j] (both length |cl|+1), so every
      // element_at below is in-bounds regardless of ANSI mode
      .withColumn("nexts", concat(col("cl"), array(n + 1)))
      .select(col("doc_id"), col("text"),
        posexplode(transform(col("starts"), (st, j) => struct(
          st.as("st"),
          (element_at(col("nexts"), j + 1) - st).as("ln")))))
      .select(col("doc_id"),
        Portable.h60(col("text").substr(col("col.st"), col("col.ln")))
          .as("chunk_h"),
        col("col.ln").cast(LongType).as("ln"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_dedup_exact" -> c01Exact,
    "c42_cdc_dedup" -> c42CdcDedup,
    "c43_effective_tokens" -> c43EffectiveTokens,
    "c44_lsh_recall" -> c44LshRecall,
    "c45_lsh_tradeoff" -> c45LshTradeoff,
    "c02_dedup_minhash" -> c02MinhashLsh,
    "c03_dedup_simhash" -> c03Simhash,
    "c04_dedup_ngram" -> c04NgramJaccard,
    "c08_corpus_curate" -> c08CorpusCurate,
    "c09_decontaminate" -> c09Decontaminate,
    "c09b_decontaminate_bloom" -> c09bDecontaminateBloom,
    "c10_dedup_cluster" -> c10DedupCluster,
    "c10b_cluster_star" -> c10bClusterStar,
    "c37_cluster_histogram" -> c37ClusterHistogram,
    "c32_cluster_keep" -> c32ClusterKeep,
    "c13_incremental_dedup" -> c13IncrementalDedup,
    "c13b_incremental_persisted" -> c13bIncrementalPersisted,
    "c33_decon_fuzzy" -> c33DeconFuzzy,
    "c14_dedup_consensus" -> c14DedupConsensus,
    "c15_paragraph_dedup" -> c15ParagraphDedup,
    "c16_substring_decon" -> c16SubstringDecon,
    "c17_curation_pipeline" -> c17CurationPipeline,
    "c17b_curation_decon" -> c17bCurationDecon,
    "c19_substring_selfdup" -> c19SubstringSelfdup,
    "c19b_substring_dupfrac" -> c19bSubstringDupfrac,
    "c20_decon_consensus" -> c20DeconConsensus,
    "c38_multisuite_decon" -> c38MultiSuiteDecon,
    "c39_ngram_novelty" -> c39NgramNovelty,
    "c46_span_scrub" -> c46SpanScrub,
    "c47_scrub_accounting" -> c47ScrubAccounting,
    "c41_audit_sample" -> c41AuditSample,
    "c21_split_leakage" -> c21SplitLeakage,
    "c21b_split_repair" -> c21bSplitRepair,
    "c29_containment" -> c29Containment,
    "c30_cross_source_dup" -> c30CrossSourceDup)

  // ---------------------------------------------------------------
  // DuckDB oracle twins — same algorithm, same hashes, stage by stage
  // ---------------------------------------------------------------

  /** Winnowed-fingerprint CTE list (wh/fp), DuckDB twin of
    * [[winnowFps]] over `documents` — shared by c19 and c29. */
  private lazy val winnowFpCtes: String = {
    val h = Portable.h60Sql(s"substr(text, CAST(i AS INT), $SELF_W)")
    s"""wh AS (
       |  SELECT doc_id, list_transform(range(1, length(text) - $SELF_W + 2),
       |    i -> $h) AS h
       |  FROM documents WHERE length(text) >= $SELF_W),
       |fp AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    range(1, greatest(len(h) - $SELF_K + 1, 1) + 1),
       |    i -> list_min(h[i:i + ${SELF_K - 1}]))) AS fp
       |  FROM wh)""".stripMargin
  }

  /** Hashed distinct word-n-grams per doc, DuckDB form (twin of
    * [[shingleDocs]] with hashed=true), over any
    * `(doc_id, text, …)` source relation. */
  private def hashedNgramsSql(n: Int, src: String = "documents"): String =
    s"""SELECT DISTINCT doc_id, ${Portable.h60Sql("s")} AS sh FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, len(t) - ${n - 1}),
       |    i -> array_to_string(t[i + 1:i + $n], ' '))) AS s
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') t FROM $src)
       |  WHERE len(t) >= $n)""".stripMargin

  private val ngramsSql = hashedNgramsSql(NGRAM_N)

  /** The c02 MinHash-LSH candidate pipeline as a WITH-clause body
    * (sh, sig, bands, cand, sizes) — shared by the c02 and c08
    * oracles. */
  /** sh + sig + bands CTEs (MinHash band keys over the full corpus),
    * shared by the c02-family and c13 oracles. Same universal family
    * as the Spark side — the sh CTE already carries the 60-bit h60
    * hashes (one md5 per shingle), so the 16 LCG-derived minima are
    * pure integer arithmetic on identical literals with exact BIGINT
    * math. */
  private def shSigBandsCtesFrom(src: String): String = {
    val mins = (0 until K).map(i =>
      s"MIN((${MH_A(i)} * (sh % $MH_P) + ${MH_B(i)}) % $MH_P) AS m$i")
      .mkString(",\n         ")
    val bandRows = (0 until BANDS).map(b =>
      s"SELECT doc_id, $b AS band, concat_ws(',', " +
        (0 until R).map(r => s"m${b * R + r}").mkString(", ") + ") AS key FROM sig")
      .mkString("\n       UNION ALL ")
    s"""sh AS (${hashedNgramsSql(3, src)}),
       |sig AS (SELECT doc_id,
       |         $mins
       |        FROM sh GROUP BY doc_id),
       |bands AS ($bandRows)""".stripMargin
  }

  private lazy val shSigBandsCtes: String = shSigBandsCtesFrom("documents")

  private def c02CtesFrom(src: String): String =
    s"""${shSigBandsCtesFrom(src)},
       |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  private lazy val c02Ctes: String = c02CtesFrom("documents")

  /** SimHash fingerprint + chunk-blocking CTEs (tf, sums, fp, chunks,
    * `$cand`) — the c03 relational twin, with the candidate CTE name
    * parameterized for composition into c14's WITH namespace. */
  private def simhashCtes(cand: String): String = {
    val sums = (0 until BITS).map(j =>
      s"SUM(freq * (((h >> $j) & 1) * 2 - 1)) AS s$j").mkString(",\n         ")
    val fpBits = (0 until BITS).map(j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    val chunkRows = (0 until CHUNKS).map(c =>
      s"SELECT doc_id, fp, $c AS chunk, (fp >> ${c * CHUNK_BITS}) & ${(1 << CHUNK_BITS) - 1} AS cv FROM fp")
      .mkString("\n       UNION ALL ")
    s"""tf AS (SELECT doc_id, tok, count(*) AS freq,
       |             ${Portable.h60Sql("tok")} AS h
       |            FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
       |                  FROM documents)
       |            GROUP BY doc_id, tok),
       |sums AS (SELECT doc_id,
       |         $sums
       |         FROM tf GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fpBits AS fp FROM sums),
       |chunks AS ($chunkRows),
       |$cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db,
       |                x.fp AS fpa, y.fp AS fpb
       |         FROM chunks x JOIN chunks y
       |           ON x.chunk = y.chunk AND x.cv = y.cv AND x.doc_id < y.doc_id)""".stripMargin
  }

  /** The c04 prefix-filter candidate CTEs (`$sh` = hashed 4-grams,
    * dft, sized, prefix, `$cand`, `$sizes`) — names parameterized so
    * c14 can compose them next to the 3-gram chain without CTE-name
    * collisions. */
  private def c04Ctes(sh: String, cand: String, sizes: String): String =
    s"""$sh AS ($ngramsSql),
       |dft AS (SELECT sh, count(*) AS df FROM $sh GROUP BY sh),
       |sized AS (SELECT s.doc_id, s.sh, dft.df,
       |            count(*) OVER (PARTITION BY s.doc_id) AS n,
       |            row_number() OVER (PARTITION BY s.doc_id ORDER BY dft.df, s.sh) AS rn
       |          FROM $sh s JOIN dft ON s.sh = dft.sh),
       |prefix AS (SELECT doc_id, sh, n FROM sized
       |           WHERE rn <= n - CAST(ceil($NGRAM_T * n) AS BIGINT) + 1),
       |$cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
       |         FROM prefix x JOIN prefix y
       |           ON x.sh = y.sh AND x.doc_id < y.doc_id
       |          AND CAST(y.n AS DOUBLE) >= $NGRAM_T * x.n
       |          AND CAST(x.n AS DOUBLE) >= $NGRAM_T * y.n),
       |$sizes AS (SELECT doc_id, count(*) AS n FROM $sh GROUP BY doc_id)""".stripMargin

  /** Jaccard-verify tail over named cand/sh/sizes CTEs (names are
    * parameters so composed oracles — c14 — can run two verify
    * chains in one WITH namespace). */
  private def verifySql(t: Double, cand: String = "cand", sh: String = "sh",
      sizes: String = "sizes"): String =
    s"""SELECT da, db, za.n AS na, zb.n AS nb, i.inter,
       |       CAST(i.inter AS DOUBLE) / CAST(za.n + zb.n - i.inter AS DOUBLE) AS jac
       |FROM (SELECT da, db, count(*) AS inter
       |      FROM $cand JOIN $sh sa ON da = sa.doc_id
       |                JOIN $sh sb ON db = sb.doc_id AND sa.sh = sb.sh
       |      GROUP BY da, db) i
       |JOIN $sizes za ON da = za.doc_id
       |JOIN $sizes zb ON db = zb.doc_id
       |WHERE CAST(i.inter AS DOUBLE) / CAST(za.n + zb.n - i.inter AS DOUBLE) >= $t
       |ORDER BY da, db""".stripMargin

  /** Shared by c09 and c09b (identical result contract). */
  private lazy val c09OracleSql: String =
    s"""WITH ng AS (${hashedNgramsSql(DECON_N)}),
       |evalng AS (SELECT DISTINCT sh FROM ng WHERE doc_id % $EVAL_MOD = 0)
       |SELECT doc_id, n, overlap_ct,
       |       CAST(overlap_ct AS DOUBLE) / CAST(n AS DOUBLE) AS overlap_ratio
       |FROM (
       |  SELECT ng.doc_id, CAST(count(*) AS BIGINT) AS n,
       |         CAST(SUM(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS overlap_ct
       |  FROM ng LEFT JOIN evalng e ON ng.sh = e.sh
       |  WHERE ng.doc_id % $EVAL_MOD <> 0
       |  GROUP BY ng.doc_id)
       |WHERE overlap_ct > 0
       |ORDER BY doc_id""".stripMargin

  /** Recursive-CTE transitive closure — shared by c10 and c10b
    * (identical component contract through two different algorithms,
    * which makes the agreement a strong check for BOTH). */
  /** c45's oracle: the shared sh/sig CTEs, the c44 truth chain, and
    * per-layout band/cand CTEs unioned into one report. */
  private lazy val c45Sql: String = {
    val bandCtes = LSH_CONFIGS.map { case (b, r) =>
      val rows = (0 until b).map(bi =>
        s"SELECT doc_id, $bi AS band, concat_ws(',', " +
          (0 until r).map(i => s"m${bi * r + i}").mkString(", ") +
          ") AS key FROM sig")
        .mkString("\n       UNION ALL ")
      s"""bands_${b}_$r AS ($rows),
         |cand_${b}_$r AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
         |        FROM bands_${b}_$r x JOIN bands_${b}_$r y
         |          ON x.band = y.band AND x.key = y.key
         |         AND x.doc_id < y.doc_id)""".stripMargin
    }.mkString(",\n")
    val selects = LSH_CONFIGS.map { case (b, r) =>
      s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS r_rows,
         |       bin, CAST(count(*) AS BIGINT) AS n_true,
         |       CAST(SUM(caught) AS BIGINT) AS n_caught,
         |       CAST((1000 * SUM(caught)) // count(*) AS BIGINT) AS recall_x1000
         |FROM (SELECT t.bin,
         |             CASE WHEN c.da IS NOT NULL THEN 1 ELSE 0 END AS caught
         |      FROM truth t LEFT JOIN cand_${b}_$r c
         |        ON t.da = c.da AND t.db = c.db)
         |GROUP BY bin""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $c02Ctes,
       |dft AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
       |sized AS (SELECT s.doc_id, s.sh, dft.df,
       |            count(*) OVER (PARTITION BY s.doc_id) AS n,
       |            row_number() OVER (PARTITION BY s.doc_id
       |                               ORDER BY dft.df, s.sh) AS rn
       |          FROM sh s JOIN dft ON s.sh = dft.sh),
       |prefix AS (SELECT doc_id, sh, n FROM sized
       |           WHERE rn <= n - CAST(ceil($JACCARD_T * n) AS BIGINT) + 1),
       |tcand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
       |          FROM prefix x JOIN prefix y
       |            ON x.sh = y.sh AND x.doc_id < y.doc_id
       |           AND CAST(y.n AS DOUBLE) >= $JACCARD_T * x.n
       |           AND CAST(x.n AS DOUBLE) >= $JACCARD_T * y.n),
       |truth0 AS (${verifySql(JACCARD_T, "tcand").replace("ORDER BY da, db", "")}),
       |truth AS (SELECT da, db, (20 * inter) // (na + nb - inter) AS bin
       |          FROM truth0),
       |$bandCtes
       |SELECT * FROM ($selects)
       |ORDER BY bands, bin""".stripMargin
  }

  private lazy val c10OracleSql: String =
    s"""WITH RECURSIVE $c02Ctes,
       |pairs AS (SELECT da, db FROM (${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
       |edges AS (SELECT da, db FROM pairs UNION SELECT db AS da, da AS db FROM pairs),
       |reach(a, b) AS (
       |  SELECT da, da FROM edges
       |  UNION
       |  SELECT r.a, e.db FROM reach r JOIN edges e ON r.b = e.da),
       |lbl AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
       |csz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_sz
       |        FROM lbl GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, s.cluster_sz
       |FROM lbl l JOIN csz s ON l.cluster_id = s.cluster_id
       |ORDER BY l.doc_id""".stripMargin

  /** The c32 keep-decision CTE chain (pairs → transitive closure →
    * quality-ranked kept_doc_id per cluster, singletons labeled by
    * themselves) — shared by the c32 and c43 oracles. Expects the
    * c02 candidate CTEs in scope. */
  private lazy val c32KeepCtes: String =
    s"""pairs AS (SELECT da, db FROM (${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
       |edges AS (SELECT da, db FROM pairs UNION SELECT db AS da, da AS db FROM pairs),
       |reach(a, b) AS (
       |  SELECT da, da FROM edges
       |  UNION
       |  SELECT r.a, e.db FROM reach r JOIN edges e ON r.b = e.da),
       |lbl AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
       |q AS (SELECT doc_id, quality FROM (${TextOps.qualityColsSqlFrom("documents")})),
       |lab AS (SELECT q.doc_id, COALESCE(l.cluster_id, q.doc_id) AS cluster_id, q.quality
       |        FROM q LEFT JOIN lbl l ON q.doc_id = l.doc_id),
       |rk AS (SELECT *, FIRST_VALUE(doc_id) OVER
       |         (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS kept_doc_id
       |       FROM lab)""".stripMargin

  override val oracle: Map[String, String] = Map(
    "c01_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS content_hash,
        |       MIN(doc_id) AS canonical_id, COUNT(*) AS dup_ct
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    // replays c42's boundary selection and chunk hashing verbatim:
    // cut after window p iff h60(window) ≡ 0 (mod CDC_DIV), then the
    // CDC_MIN predecessor-gap filter and the CDC_MAX per-gap forced
    // cuts, chunk spans between consecutive cuts, identity =
    // h60(chunk text)
    "c42_cdc_dedup" ->
      s"""WITH cu AS (
         |  SELECT doc_id, text, length(text) AS n,
         |    list_filter(
         |      list_transform(range(1, greatest(length(text) - ${CDC_W - 1}, 0) + 1),
         |        i -> CASE WHEN ${Portable.h60Sql(s"substr(text, CAST(i AS INT), $CDC_W)")}
         |                       % $CDC_DIV = 0
         |                  THEN i + $CDC_W END),
         |      c -> c IS NOT NULL AND c <= length(text)) AS cl0
         |  FROM documents WHERE text IS NOT NULL AND length(text) >= 1),
         |cb AS (
         |  SELECT doc_id, text, n,
         |    list_filter(cl0, (c, i) -> c - coalesce(cl0[i - 1], 1) >= $CDC_MIN) AS cmin
         |  FROM cu),
         |cp AS (
         |  SELECT doc_id, text, n, cmin, ([1] || cmin || [n + 1]) AS posts
         |  FROM cb),
         |cm AS (
         |  SELECT doc_id, text, n,
         |    list_sort(cmin || flatten(list_transform(range(1, len(posts)),
         |      j -> CASE WHEN posts[CAST(j + 1 AS INT)] - posts[CAST(j AS INT)] > $CDC_MAX
         |                THEN range(posts[CAST(j AS INT)] + $CDC_MAX,
         |                           posts[CAST(j + 1 AS INT)], $CDC_MAX)
         |                ELSE CAST([] AS BIGINT[]) END))) AS cl
         |  FROM cp),
         |ch AS (
         |  SELECT doc_id,
         |    ${Portable.h60Sql("substr(text, CAST(c.st AS INT), CAST(c.ln AS INT))")} AS chunk_h,
         |    CAST(c.ln AS BIGINT) AS ln
         |  FROM (
         |    SELECT doc_id, text,
         |      unnest(list_transform(range(1, len(cl) + 2),
         |        j -> struct_pack(st := ([1] || cl)[j],
         |                         ln := (cl || [n + 1])[j] - ([1] || cl)[j]))) AS c
         |    FROM cm))
         |SELECT chunk_h, MIN(ln) AS chunk_len,
         |  CAST(COUNT(*) AS BIGINT) AS n_occ,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM ch
         |GROUP BY chunk_h HAVING COUNT(*) > 1 ORDER BY chunk_h""".stripMargin,
    "c02_dedup_minhash" ->
      s"""WITH $c02Ctes
         |${verifySql(JACCARD_T)}""".stripMargin,
    // one shared sig CTE; each layout regroups the minima into its
    // own band/cand CTEs, all judged against one truth CTE
    "c45_lsh_tradeoff" -> c45Sql,
    // truth = the prefix filter at JACCARD_T (complete at that
    // threshold); detector = the band CTE from the c02 chain
    "c44_lsh_recall" ->
      s"""WITH $c02Ctes,
         |dft AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
         |sized AS (SELECT s.doc_id, s.sh, dft.df,
         |            count(*) OVER (PARTITION BY s.doc_id) AS n,
         |            row_number() OVER (PARTITION BY s.doc_id
         |                               ORDER BY dft.df, s.sh) AS rn
         |          FROM sh s JOIN dft ON s.sh = dft.sh),
         |prefix AS (SELECT doc_id, sh, n FROM sized
         |           WHERE rn <= n - CAST(ceil($JACCARD_T * n) AS BIGINT) + 1),
         |tcand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
         |          FROM prefix x JOIN prefix y
         |            ON x.sh = y.sh AND x.doc_id < y.doc_id
         |           AND CAST(y.n AS DOUBLE) >= $JACCARD_T * x.n
         |           AND CAST(x.n AS DOUBLE) >= $JACCARD_T * y.n),
         |truth AS (${verifySql(JACCARD_T, "tcand").replace("ORDER BY da, db", "")})
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_true,
         |       CAST(SUM(caught) AS BIGINT) AS n_caught,
         |       CAST((1000 * SUM(caught)) // count(*) AS BIGINT) AS recall_x1000
         |FROM (SELECT (20 * t.inter) // (t.na + t.nb - t.inter) AS bin,
         |             CASE WHEN c.da IS NOT NULL THEN 1 ELSE 0 END AS caught
         |      FROM truth t LEFT JOIN cand c ON t.da = c.da AND t.db = c.db)
         |GROUP BY bin ORDER BY bin""".stripMargin,
    "c41_audit_sample" ->
      s"""WITH $c02Ctes,
         |v AS (${verifySql(JACCARD_T).replace("ORDER BY da, db", "")}),
         |b AS (SELECT da, db, inter, jac,
         |        (20 * inter) // (na + nb - inter) AS bin,
         |        ${Portable.h60Sql(
              "'audit:' || CAST(da AS VARCHAR) || ':' || CAST(db AS VARCHAR)")} AS hk
         |      FROM v)
         |SELECT bin, rk, da, db, inter, jac FROM (
         |  SELECT bin, da, db, inter, jac,
         |    row_number() OVER (PARTITION BY bin ORDER BY hk, da, db) AS rk
         |  FROM b)
         |WHERE rk <= $AUDIT_N ORDER BY bin, rk""".stripMargin,
    "c08_corpus_curate" ->
      s"""WITH $c02Ctes,
         |neardup AS (SELECT DISTINCT db AS doc_id FROM (
         |  ${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
         |qual AS (${TextOps.qualityColsSql})
         |SELECT lang, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |       CAST(SUM(n_char) AS BIGINT) AS n_chars
         |FROM qual
         |WHERE quality >= $QUALITY_T
         |  AND doc_id NOT IN (SELECT doc_id FROM neardup)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "c03_dedup_simhash" ->
      s"""WITH ${simhashCtes("cand")}
         |SELECT da, db, fpa, fpb, CAST(bit_count(xor(fpa, fpb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(fpa, fpb)) <= $HAMMING_T
         |ORDER BY da, db""".stripMargin,
    "c10_dedup_cluster" -> c10OracleSql,
    // c10b is the same component contract through large/small-star —
    // same clusters, same oracle.
    "c10b_cluster_star" -> c10OracleSql,
    "c37_cluster_histogram" ->
      s"""WITH RECURSIVE $c02Ctes,
         |pairs AS (SELECT da, db FROM (${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
         |edges AS (SELECT da, db FROM pairs UNION SELECT db AS da, da AS db FROM pairs),
         |reach(a, b) AS (
         |  SELECT da, da FROM edges
         |  UNION
         |  SELECT r.a, e.db FROM reach r JOIN edges e ON r.b = e.da),
         |lbl AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
         |cl AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz FROM lbl GROUP BY cluster_id),
         |hist0 AS (SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters FROM cl GROUP BY sz),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |ncl AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM lbl),
         |hist AS (SELECT sz, n_clusters FROM hist0
         |         UNION ALL SELECT CAST(1 AS BIGINT), n - nc FROM tot, ncl)
         |SELECT sz, CAST(SUM(n_clusters) AS BIGINT) AS n_clusters,
         |       CAST(SUM(sz * n_clusters) AS BIGINT) AS docs,
         |       CAST(SUM((sz - 1) * n_clusters) AS BIGINT) AS dup_mass
         |FROM hist GROUP BY sz ORDER BY sz""".stripMargin,
    "c32_cluster_keep" ->
      s"""WITH RECURSIVE $c02Ctes,
         |$c32KeepCtes
         |SELECT doc_id, cluster_id,
         |       CASE WHEN doc_id = kept_doc_id THEN 'kept' ELSE 'removed' END AS status,
         |       kept_doc_id, quality
         |FROM rk ORDER BY doc_id""".stripMargin,
    // c43 = c32's keep decision joined onto token counts at source
    // grain — the chain is shared verbatim with the c32 oracle
    "c43_effective_tokens" ->
      s"""WITH RECURSIVE $c02Ctes,
         |$c32KeepCtes,
         |keep AS (SELECT doc_id,
         |           CASE WHEN doc_id = kept_doc_id THEN 1 ELSE 0 END AS kept
         |         FROM rk),
         |tok AS (SELECT doc_id, source,
         |          CAST(COALESCE(len(string_split_regex(text, '\\s+')), 0)
         |            AS BIGINT) AS nt
         |        FROM documents)
         |SELECT source,
         |  CAST(COUNT(*) AS BIGINT) AS raw_docs,
         |  CAST(SUM(nt) AS BIGINT) AS raw_tokens,
         |  CAST(SUM(kept) AS BIGINT) AS kept_docs,
         |  CAST(SUM(CASE WHEN kept = 1 THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens,
         |  CAST(SUM(nt) - SUM(CASE WHEN kept = 1 THEN nt ELSE 0 END) AS BIGINT)
         |    AS dup_tokens
         |FROM tok JOIN keep USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin,
    // c21b: c10's transitive closure + the t05 hash-split of doc and
    // cluster representative — the repair is pure derivation on top
    // of the component labels.
    "c21b_split_repair" -> {
      def splitSql(id: String): String =
        s"""CASE WHEN ${Portable.h60Sql(s"'split:' || CAST($id AS VARCHAR)")} % 100 < 80 THEN 'train'
           |     WHEN ${Portable.h60Sql(s"'split:' || CAST($id AS VARCHAR)")} % 100 < 90 THEN 'valid'
           |     ELSE 'test' END""".stripMargin
      s"""WITH RECURSIVE $c02Ctes,
         |pairs AS (SELECT da, db FROM (${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
         |edges AS (SELECT da, db FROM pairs UNION SELECT db AS da, da AS db FROM pairs),
         |reach(a, b) AS (
         |  SELECT da, da FROM edges
         |  UNION
         |  SELECT r.a, e.db FROM reach r JOIN edges e ON r.b = e.da),
         |lbl AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
         |lab AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
         |        FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id)
         |SELECT doc_id, cluster_id, old_split, new_split,
         |  CAST(new_split <> old_split AS BIGINT) AS moved
         |FROM (SELECT doc_id, cluster_id,
         |        ${splitSql("doc_id")} AS old_split,
         |        ${splitSql("cluster_id")} AS new_split
         |      FROM lab)
         |ORDER BY doc_id""".stripMargin
    },
    "c09_decontaminate" -> c09OracleSql,
    // c09b is c09 behind a Bloom prefilter whose false positives die
    // in the exact verify join — same rows, same oracle.
    "c09b_decontaminate_bloom" -> c09OracleSql,
    "c17_curation_pipeline" -> {
      val P = PARA_TOKENS
      s"""WITH cparas AS (
         |  SELECT doc_id, lang, source,
         |    unnest(range(0, CAST(ceil(len(t) / ${P}.0) AS BIGINT))) AS pidx,
         |    unnest(list_transform(range(0, CAST(ceil(len(t) / ${P}.0) AS BIGINT)),
         |      i -> array_to_string(t[i * $P + 1 : (i + 1) * $P], ' '))) AS para
         |  FROM (SELECT doc_id, lang, source, string_split_regex(text, '\\s+') AS t
         |        FROM documents WHERE text IS NOT NULL)),
         |chashed AS (SELECT *, ${Portable.h60Sql("para")} AS ph FROM cparas),
         |cpdf AS (SELECT ph, count(DISTINCT doc_id) AS pdf FROM chashed GROUP BY ph),
         |cleaned AS (
         |  SELECT * FROM (
         |    SELECT h.doc_id, h.lang, h.source,
         |           string_agg(CASE WHEN p.pdf <= $PARA_DF_K THEN h.para END,
         |                      ' ' ORDER BY h.pidx) AS text
         |    FROM chashed h JOIN cpdf p ON h.ph = p.ph
         |    GROUP BY h.doc_id, h.lang, h.source)
         |  WHERE text IS NOT NULL AND text <> ''),
         |${c02CtesFrom("cleaned")},
         |neardup AS (SELECT DISTINCT db AS doc_id FROM (
         |  ${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
         |qual AS (${TextOps.qualityColsSqlFrom("cleaned")}),
         |flags AS (SELECT doc_id,
         |  ${Portable.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |  FROM cleaned)
         |SELECT CASE WHEN f.bucket < 80 THEN 'train'
         |            WHEN f.bucket < 90 THEN 'valid'
         |            ELSE 'test' END AS split,
         |       q.lang, COUNT(*) AS n_docs,
         |       CAST(SUM(q.n_tok) AS BIGINT) AS n_tokens,
         |       CAST(SUM(q.n_char) AS BIGINT) AS n_chars
         |FROM qual q JOIN flags f ON q.doc_id = f.doc_id
         |WHERE q.quality >= $QUALITY_T
         |  AND q.doc_id NOT IN (SELECT doc_id FROM neardup)
         |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
    },
    "c17b_curation_decon" -> {
      val P = PARA_TOKENS
      s"""WITH cparas AS (
         |  SELECT doc_id, lang, source,
         |    unnest(range(0, CAST(ceil(len(t) / ${P}.0) AS BIGINT))) AS pidx,
         |    unnest(list_transform(range(0, CAST(ceil(len(t) / ${P}.0) AS BIGINT)),
         |      i -> array_to_string(t[i * $P + 1 : (i + 1) * $P], ' '))) AS para
         |  FROM (SELECT doc_id, lang, source, string_split_regex(text, '\\s+') AS t
         |        FROM documents
         |        WHERE text IS NOT NULL AND doc_id % $EVAL_MOD <> 0)),
         |chashed AS (SELECT *, ${Portable.h60Sql("para")} AS ph FROM cparas),
         |cpdf AS (SELECT ph, count(DISTINCT doc_id) AS pdf FROM chashed GROUP BY ph),
         |cleaned AS (
         |  SELECT * FROM (
         |    SELECT h.doc_id, h.lang, h.source,
         |           string_agg(CASE WHEN p.pdf <= $PARA_DF_K THEN h.para END,
         |                      ' ' ORDER BY h.pidx) AS text
         |    FROM chashed h JOIN cpdf p ON h.ph = p.ph
         |    GROUP BY h.doc_id, h.lang, h.source)
         |  WHERE text IS NOT NULL AND text <> ''),
         |${c02CtesFrom("cleaned")},
         |neardup AS (SELECT DISTINCT db AS doc_id FROM (
         |  ${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
         |evaldocs AS (SELECT * FROM documents WHERE doc_id % $EVAL_MOD = 0),
         |evalng AS (SELECT DISTINCT sh FROM (${hashedNgramsSql(DECON_N, "evaldocs")})),
         |contng AS (${hashedNgramsSql(DECON_N, "cleaned")}),
         |contaminated AS (
         |  SELECT DISTINCT doc_id FROM contng WHERE sh IN (SELECT sh FROM evalng)),
         |qual AS (${TextOps.qualityColsSqlFrom("cleaned")}),
         |flags AS (SELECT doc_id,
         |  ${Portable.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |  FROM cleaned)
         |SELECT CASE WHEN f.bucket < 80 THEN 'train'
         |            WHEN f.bucket < 90 THEN 'valid'
         |            ELSE 'test' END AS split,
         |       q.lang, COUNT(*) AS n_docs,
         |       CAST(SUM(q.n_tok) AS BIGINT) AS n_tokens,
         |       CAST(SUM(q.n_char) AS BIGINT) AS n_chars
         |FROM qual q JOIN flags f ON q.doc_id = f.doc_id
         |WHERE q.quality >= $QUALITY_T
         |  AND q.doc_id NOT IN (SELECT doc_id FROM neardup)
         |  AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
         |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
    },
    "c16_substring_decon" -> {
      val h = Portable.h60Sql(s"substr(text, CAST(i AS INT), $SUB_W)")
      s"""WITH evalw AS (
         |  SELECT DISTINCT h FROM (
         |    SELECT unnest(list_transform(range(1, length(text) - $SUB_W + 2),
         |      i -> $h)) AS h
         |    FROM documents WHERE doc_id % $EVAL_MOD = 0 AND length(text) >= $SUB_W)),
         |corpusw AS (
         |  SELECT doc_id, unnest(list_transform(range(1, length(text) - $SUB_W + 2, $SUB_STRIDE),
         |    i -> $h)) AS h
         |  FROM documents WHERE doc_id % $EVAL_MOD <> 0 AND length(text) >= $SUB_W)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS hit_windows
         |FROM corpusw WHERE h IN (SELECT h FROM evalw)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "c19_substring_selfdup" ->
      s"""WITH $winnowFpCtes
         |SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS n_shared
         |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY da, db
         |ORDER BY da, db""".stripMargin,
    "c30_cross_source_dup" ->
      s"""WITH $c02Ctes,
         |pairs AS (SELECT da, db FROM (${verifySql(JACCARD_T).replace("ORDER BY da, db", "")}))
         |SELECT least(sa.source, sb.source) AS src_a,
         |       greatest(sa.source, sb.source) AS src_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs
         |JOIN documents sa ON pairs.da = sa.doc_id
         |JOIN documents sb ON pairs.db = sb.doc_id
         |GROUP BY src_a, src_b
         |ORDER BY src_a, src_b""".stripMargin,
    "c29_containment" ->
      s"""WITH $winnowFpCtes,
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |       FROM fp GROUP BY doc_id),
         |iv AS (SELECT a.doc_id AS da, b.doc_id AS db,
         |         CAST(count(*) AS BIGINT) AS inter
         |       FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |       GROUP BY da, db)
         |SELECT * FROM (
         |  SELECT da, db, za.n AS na, zb.n AS nb, iv.inter,
         |         CAST(iv.inter AS DOUBLE) / CAST(za.n AS DOUBLE) AS cont_a,
         |         CAST(iv.inter AS DOUBLE) / CAST(zb.n AS DOUBLE) AS cont_b
         |  FROM iv JOIN sz za ON da = za.doc_id
         |          JOIN sz zb ON db = zb.doc_id)
         |WHERE greatest(cont_a, cont_b) >= $CONT_T
         |ORDER BY da, db""".stripMargin,
    "c20_decon_consensus" -> {
      val h = Portable.h60Sql(s"substr(text, CAST(i AS INT), $SUB_W)")
      s"""WITH ng AS (${hashedNgramsSql(DECON_N)}),
         |evalng AS (SELECT DISTINCT sh FROM ng WHERE doc_id % $EVAL_MOD = 0),
         |tokflag AS (
         |  SELECT DISTINCT ng.doc_id FROM ng JOIN evalng e ON ng.sh = e.sh
         |  WHERE ng.doc_id % $EVAL_MOD <> 0),
         |evalw AS (
         |  SELECT DISTINCT h FROM (
         |    SELECT unnest(list_transform(range(1, length(text) - $SUB_W + 2),
         |      i -> $h)) AS h
         |    FROM documents WHERE doc_id % $EVAL_MOD = 0 AND length(text) >= $SUB_W)),
         |corpusw AS (
         |  SELECT doc_id, unnest(list_transform(range(1, length(text) - $SUB_W + 2, $SUB_STRIDE),
         |    i -> $h)) AS h
         |  FROM documents WHERE doc_id % $EVAL_MOD <> 0 AND length(text) >= $SUB_W),
         |subflag AS (SELECT DISTINCT doc_id FROM corpusw WHERE h IN (SELECT h FROM evalw)),
         |m AS (SELECT doc_id, 'ngram' AS method FROM tokflag
         |      UNION ALL SELECT doc_id, 'substring' AS method FROM subflag)
         |SELECT doc_id, CAST(count(DISTINCT method) AS BIGINT) AS n_methods,
         |       string_agg(DISTINCT method, ',' ORDER BY method) AS methods
         |FROM m GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    },
    // positional grams (NOT distinct — coverage needs every start),
    // df over distinct docs, covered positions expanded, tokens
    // rebuilt in position order; md5(coalesce(…, '')) matches
    // concat_ws over an empty keep-list on the Spark side
    "c46_span_scrub" -> {
      val h = Portable.h60Sql(s"array_to_string(toks[i + 1:i + $DECON_N], ' ')")
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks
         |  FROM documents),
         |gr AS (
         |  SELECT doc_id, i, $h AS g
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(0, len(toks) - ${DECON_N - 1})) AS i
         |        FROM t WHERE len(toks) >= $DECON_N)),
         |hot AS (SELECT g FROM (
         |  SELECT g, count(DISTINCT doc_id) AS df FROM gr GROUP BY g)
         |  WHERE df >= $SCRUB_DF),
         |cov AS (
         |  SELECT DISTINCT doc_id, unnest(range(i, i + $DECON_N)) AS p
         |  FROM gr WHERE g IN (SELECT g FROM hot)),
         |pos AS (
         |  SELECT doc_id, unnest(range(0, len(toks))) AS p, toks FROM t),
         |kept AS (
         |  SELECT pos.doc_id, pos.p, pos.toks[CAST(pos.p + 1 AS INT)] AS tok
         |  FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
         |  WHERE cov.p IS NULL)
         |SELECT t.doc_id,
         |  CAST(len(t.toks) AS BIGINT) AS n_toks,
         |  CAST(len(t.toks) - count(k.p) AS BIGINT) AS n_removed,
         |  md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '')) AS kept_md5
         |FROM t LEFT JOIN kept k USING (doc_id)
         |GROUP BY t.doc_id, len(t.toks)
         |ORDER BY t.doc_id""".stripMargin
    },
    // c46's coverage replay without the rebuild: n_removed = covered
    // positions per doc, rolled up per language with integer shares
    "c47_scrub_accounting" -> {
      val h = Portable.h60Sql(s"array_to_string(toks[i + 1:i + $DECON_N], ' ')")
      s"""WITH t AS (
         |  SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks
         |  FROM documents),
         |gr AS (
         |  SELECT doc_id, i, $h AS g
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(0, len(toks) - ${DECON_N - 1})) AS i
         |        FROM t WHERE len(toks) >= $DECON_N)),
         |hot AS (SELECT g FROM (
         |  SELECT g, count(DISTINCT doc_id) AS df FROM gr GROUP BY g)
         |  WHERE df >= $SCRUB_DF),
         |cov AS (
         |  SELECT DISTINCT doc_id, unnest(range(i, i + $DECON_N)) AS p
         |  FROM gr WHERE g IN (SELECT g FROM hot)),
         |rem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
         |        FROM cov GROUP BY doc_id)
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN COALESCE(r.n_removed, 0) > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_docs_touched,
         |  CAST(SUM(len(t.toks)) AS BIGINT) AS tok_total,
         |  CAST(SUM(COALESCE(r.n_removed, 0)) AS BIGINT) AS tok_removed,
         |  CAST((1000 * SUM(COALESCE(r.n_removed, 0))) // SUM(len(t.toks))
         |    AS BIGINT) AS removed_x1000
         |FROM t LEFT JOIN rem r USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },
    "c39_ngram_novelty" ->
      s"""WITH ng AS (${hashedNgramsSql(DECON_N)}),
         |dfreq AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM ng GROUP BY sh)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_ngrams,
         |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
         |    CAST(count(*) AS DOUBLE) AS shared_frac
         |FROM ng JOIN dfreq USING (sh)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "c38_multisuite_decon" -> {
      val h = Portable.h60Sql(s"substr(text, CAST(i AS INT), $SUB_W)")
      val suite = s"'suite' || CAST((doc_id // $EVAL_MOD) % 3 AS VARCHAR)"
      s"""WITH ng AS (${hashedNgramsSql(DECON_N)}),
         |evalng AS (SELECT DISTINCT $suite AS suite, sh FROM ng
         |           WHERE doc_id % $EVAL_MOD = 0),
         |tokflag AS (
         |  SELECT DISTINCT ng.doc_id, e.suite
         |  FROM ng JOIN evalng e ON ng.sh = e.sh
         |  WHERE ng.doc_id % $EVAL_MOD <> 0),
         |evalw AS (
         |  SELECT DISTINCT suite, h FROM (
         |    SELECT $suite AS suite,
         |      unnest(list_transform(range(1, length(text) - $SUB_W + 2),
         |        i -> $h)) AS h
         |    FROM documents WHERE doc_id % $EVAL_MOD = 0 AND length(text) >= $SUB_W)),
         |corpusw AS (
         |  SELECT doc_id, unnest(list_transform(range(1, length(text) - $SUB_W + 2, $SUB_STRIDE),
         |    i -> $h)) AS h
         |  FROM documents WHERE doc_id % $EVAL_MOD <> 0 AND length(text) >= $SUB_W),
         |subflag AS (
         |  SELECT DISTINCT c.doc_id, e.suite
         |  FROM corpusw c JOIN evalw e ON c.h = e.h),
         |m AS (SELECT doc_id, suite, 'ngram' AS method FROM tokflag
         |      UNION ALL SELECT doc_id, suite, 'substring' AS method FROM subflag)
         |SELECT doc_id, suite,
         |       CAST(count(DISTINCT method) AS BIGINT) AS n_methods,
         |       string_agg(DISTINCT method, ',' ORDER BY method) AS methods
         |FROM m GROUP BY doc_id, suite
         |ORDER BY doc_id, suite""".stripMargin
    },
    "c21_split_leakage" -> {
      val h = Portable.h60Sql(s"substr(text, CAST(i AS INT), $SELF_W)")
      val bucket = Portable.h60Sql("'split:' || CAST(doc_id AS VARCHAR)") + " % 100"
      s"""WITH wh AS (
         |  SELECT doc_id, $bucket AS bucket,
         |    list_transform(range(1, length(text) - $SELF_W + 2), i -> $h) AS h
         |  FROM documents WHERE length(text) >= $SELF_W),
         |fp AS (
         |  SELECT DISTINCT doc_id, bucket, unnest(list_transform(
         |    range(1, greatest(len(h) - $SELF_K + 1, 1) + 1),
         |    i -> list_min(h[i:i + ${SELF_K - 1}]))) AS fp
         |  FROM wh),
         |trainfp AS (SELECT DISTINCT fp FROM fp WHERE bucket < 80)
         |SELECT doc_id,
         |       CASE WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
         |       CAST(count(*) AS BIGINT) AS n_leaked_fp
         |FROM fp
         |WHERE bucket >= 80 AND fp IN (SELECT fp FROM trainfp)
         |GROUP BY doc_id, bucket
         |ORDER BY doc_id""".stripMargin
    },
    "c19b_substring_dupfrac" -> {
      val h = Portable.h60Sql(s"substr(text, CAST(i AS INT), $SELF_W)")
      s"""WITH wh AS (
         |  SELECT doc_id, list_transform(range(1, length(text) - $SELF_W + 2),
         |    i -> $h) AS h
         |  FROM documents WHERE length(text) >= $SELF_W),
         |fp AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(
         |    range(1, greatest(len(h) - $SELF_K + 1, 1) + 1),
         |    i -> list_min(h[i:i + ${SELF_K - 1}]))) AS fp
         |  FROM wh),
         |fdf AS (SELECT fp, count(*) AS fdf FROM fp GROUP BY fp)
         |SELECT f.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_fp,
         |       CAST(SUM(CASE WHEN d.fdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |       CAST(SUM(CASE WHEN d.fdf >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS dup_frac
         |FROM fp f JOIN fdf d ON f.fp = d.fp
         |GROUP BY f.doc_id
         |ORDER BY f.doc_id""".stripMargin
    },
    "c15_paragraph_dedup" ->
      s"""WITH paras AS (
         |  SELECT doc_id,
         |    unnest(range(0, CAST(ceil(len(t) / ${PARA_TOKENS}.0) AS BIGINT))) AS pidx,
         |    unnest(list_transform(range(0, CAST(ceil(len(t) / ${PARA_TOKENS}.0) AS BIGINT)),
         |      i -> array_to_string(t[i * $PARA_TOKENS + 1 : (i + 1) * $PARA_TOKENS], ' '))) AS para
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t
         |        FROM documents WHERE text IS NOT NULL)),
         |hashed AS (SELECT doc_id, pidx, para, ${Portable.h60Sql("para")} AS ph FROM paras),
         |pdf AS (SELECT ph, count(DISTINCT doc_id) AS pdf FROM hashed GROUP BY ph)
         |SELECT h.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_paras,
         |       CAST(SUM(CASE WHEN p.pdf > $PARA_DF_K THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       COALESCE(string_agg(CASE WHEN p.pdf <= $PARA_DF_K THEN h.para END,
         |                           ' ' ORDER BY h.pidx), '') AS kept_text
         |FROM hashed h JOIN pdf p ON h.ph = p.ph
         |GROUP BY h.doc_id
         |ORDER BY h.doc_id""".stripMargin,
    "c04_dedup_ngram" ->
      s"""WITH ${c04Ctes("sh", "cand", "sizes")}
         |${verifySql(NGRAM_T)}""".stripMargin,
    "c14_dedup_consensus" ->
      s"""WITH $c02Ctes,
         |${simhashCtes("cand3")},
         |${c04Ctes("sh4", "cand4", "sizes4")},
         |pairs AS (
         |  SELECT da, db, 'minhash' AS method FROM (
         |    ${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})
         |  UNION ALL
         |  SELECT da, db, 'simhash' AS method FROM cand3
         |  WHERE bit_count(xor(fpa, fpb)) <= $HAMMING_T
         |  UNION ALL
         |  SELECT da, db, 'ngram' AS method FROM (
         |    ${verifySql(NGRAM_T, "cand4", "sh4", "sizes4").replace("ORDER BY da, db", "")}))
         |SELECT da, db, CAST(count(DISTINCT method) AS BIGINT) AS n_methods,
         |       string_agg(DISTINCT method, ',' ORDER BY method) AS methods
         |FROM pairs GROUP BY da, db
         |HAVING count(DISTINCT method) >= 2
         |ORDER BY da, db""".stripMargin,
    "c13_incremental_dedup" -> c13OracleSql,
    // c13b answers from the persisted store — value-identical by
    // construction, so the oracle is shared verbatim
    "c13b_incremental_persisted" -> c13OracleSql,
    // identical machinery to c13 with the eval set as the old corpus
    "c33_decon_fuzzy" -> c33OracleSql)

  private lazy val c13OracleSql: String = {
    val bucket = Portable.h60Sql("'split:' || CAST(doc_id AS VARCHAR)") + " % 100"
    s"""WITH $shSigBandsCtes,
       |flags AS (SELECT doc_id, $bucket >= 80 AS isnew FROM documents),
       |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
       |         FROM bands x JOIN flags fx ON x.doc_id = fx.doc_id AND fx.isnew
       |              JOIN bands y ON x.band = y.band AND x.key = y.key
       |              JOIN flags fy ON y.doc_id = fy.doc_id AND NOT fy.isnew),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |near AS (SELECT DISTINCT da AS doc_id FROM (
       |  ${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
       |oldh AS (SELECT DISTINCT md5(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) AS h
       |         FROM documents d JOIN flags f ON d.doc_id = f.doc_id AND NOT f.isnew),
       |exact AS (SELECT d.doc_id FROM documents d
       |          JOIN flags f ON d.doc_id = f.doc_id AND f.isnew
       |          WHERE md5(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) IN (SELECT h FROM oldh))
       |SELECT f.doc_id,
       |       CASE WHEN f.doc_id IN (SELECT doc_id FROM exact) THEN 'exact_dup'
       |            WHEN f.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
       |            ELSE 'kept' END AS status
       |FROM flags f WHERE f.isnew
       |ORDER BY f.doc_id""".stripMargin
  }

  private lazy val c33OracleSql: String =
      s"""WITH $shSigBandsCtes,
         |flags AS (SELECT doc_id, doc_id % $EVAL_MOD <> 0 AS isnew FROM documents),
         |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
         |         FROM bands x JOIN flags fx ON x.doc_id = fx.doc_id AND fx.isnew
         |              JOIN bands y ON x.band = y.band AND x.key = y.key
         |              JOIN flags fy ON y.doc_id = fy.doc_id AND NOT fy.isnew),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |near AS (SELECT DISTINCT da AS doc_id FROM (
         |  ${verifySql(JACCARD_T).replace("ORDER BY da, db", "")})),
         |oldh AS (SELECT DISTINCT md5(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) AS h
         |         FROM documents d JOIN flags f ON d.doc_id = f.doc_id AND NOT f.isnew),
         |exact AS (SELECT d.doc_id FROM documents d
         |          JOIN flags f ON d.doc_id = f.doc_id AND f.isnew
         |          WHERE md5(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) IN (SELECT h FROM oldh))
         |SELECT f.doc_id,
         |       CASE WHEN f.doc_id IN (SELECT doc_id FROM exact) THEN 'exact_dup'
         |            WHEN f.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
         |            ELSE 'kept' END AS status
         |FROM flags f WHERE f.isnew
         |ORDER BY f.doc_id""".stripMargin
}
