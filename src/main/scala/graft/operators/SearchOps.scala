package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full-text retrieval over the corpus: BM25 top-k keyword search
  * (c24). A corpus engine that curates training data also has to FIND
  * things in it — contamination spot checks, eval-set sourcing,
  * "show me documents about X" debugging — and BM25 over an
  * aggregated postings table is the standard first-stage retriever
  * (the same role Lucene/Elasticsearch play beside a warehouse).
  *
  * Scale stance: there is no inverted-index file here — the postings
  * LIST is an aggregation, and Spark's hash aggregate IS the index
  * build. The query-term filter lands before the tf aggregation, so
  * the shuffled postings volume is proportional to the matched terms
  * only, never the vocabulary; corpus-wide constants (N, total token
  * count) ride a 1-row broadcast; ranking compiles to
  * WindowGroupLimit (partial top-k per query before the final
  * exchange). Scoring is exact integer arithmetic end-to-end so the
  * DuckDB oracle reproduces scores AND ranks bit-for-bit.
  */
object SearchOps extends QueryModule {

  /** The fixture query workload: short keyword queries over the
    * synthetic vocabulary (multi-term, overlapping terms across
    * queries, plus one out-of-vocabulary term exercising the
    * zero-postings path). Production replaces this literal with any
    * small (qid, term) table; the plan is unchanged. */
  val QUERIES: Seq[(String, Seq[String])] = Seq(
    "q1" -> Seq("spark", "window"),
    "q2" -> Seq("hash", "join", "merge"),
    "q3" -> Seq("vector", "query"),
    "q4" -> Seq("stream", "batch", "zzzunseen"))

  private[operators] val TOPK = 10
  // BM25 constants as exact rationals: k1 = 1.2, b = 0.75.
  // Substituted into the closed form below so every factor is an
  // integer: tf·(k1+1) / (tf + k1·(1−b+b·dl·N/L)), multiplied
  // through by 10·L, is 22·L·tf / (10·L·tf + 3·L + 9·dl·N).
  private[operators] val Q1 = 1L << 20 // idf fixed-point scale
  private[operators] val Q2 = 1L << 20 // tf-norm fixed-point scale

  /** c24 — BM25 top-k search: for each query, the TOPK documents by
    * BM25 score, rank-ordered with doc_id tie-break.
    *
    * The libm problem (t15's lesson) is solved by swapping the idf
    * LOG for the raw probabilistic-idf RATIO it wraps:
    * (N − df + ½)/(df + ½) — same ordering per term, exact in
    * integers as (2N−2df+1)/(2df+1). Both fixed-point divisions are
    * truncating integer `div` (DuckDB `//`), so scores are
    * bit-portable. Overflow headroom: idf ≤ (2N+1)·Q1 and the tf
    * factor ≤ 2.2·Q2, so a term score stays < 2^63 while
    * 22·L·tf·Q2 < 2^63 — corpora to ~10^9 tokens at this Q2; a
    * 100 TB deployment shrinks Q2 (rank-stability costs nothing:
    * only score RESOLUTION changes, and ties still break on doc_id).
    */
  def c24Bm25TopK(s: SparkSession, d: String): DataFrame =
    bm25(s, Tables.documents(s, d), QUERIES, TOPK)

  /** BM25 core over any (doc_id, text) frame and query workload. */
  private[operators] def bm25(s: SparkSession, docsIn: DataFrame,
      queries: Seq[(String, Seq[String])], topk: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    bm25Scored(s, docsIn, queries)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= topk)
      .orderBy(col("qid"), col("rk"))
  }

  /** The scored (qid, doc_id, score) frame BEFORE the top-k window —
    * one row per (query, document with ≥ 1 matched term). Shared by
    * the batch ranker above and the streaming parity spec. */
  private[graft] def bm25Scored(s: SparkSession, docsIn: DataFrame,
      queries: Seq[(String, Seq[String])]): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        coalesce(size(col("toks")), lit(0)).cast(LongType).as("dl"))
    // Corpus constants: one full (narrow) pass — doc count and total
    // token count. 1 row, broadcast into the scoring join.
    val stats = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("l"))
    // Postings restricted to the union of query terms BEFORE the tf
    // aggregation, via the native graft_filter_in kernel (round-14
    // opt — the HOF filter paid an interpreted per-token lambda on
    // the one corpus pass; the kernel is a fused byte-compare loop in
    // the scan's codegen, bit-identical incl. null corners,
    // FilterInSpec): only matched occurrences are exploded/shuffled.
    val terms = queries.flatMap(_._2).distinct
    val tf = docs
      .select(col("doc_id"), col("dl"),
        explode(call_function("graft_filter_in",
          col("toks"), typedlit(terms))).as("w"))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    // Document frequency per matched term: ≤ |terms| rows, broadcast.
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val qterms = s.createDataFrame(queries
      .flatMap { case (qid, ws) => ws.map(w => (qid, w)) })
      .toDF("qid", "w")
    tf
      .join(broadcast(qterms), Seq("w"))
      .join(broadcast(dfreq), Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"), expr(
        s"(((2L * n - 2L * df + 1L) * ${Q1}L) div (2L * df + 1L)) * " +
          s"((22L * l * tf * ${Q2}L) div " +
          "(10L * l * tf + 3L * l + 9L * dl * n))").as("ts"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("ts")).as("score"))
  }

  /** Frozen BM25 model — the bounded state a STREAMING scorer needs:
    * corpus doc count, total token count, and per-query-term document
    * frequencies (≤ |terms| + 1 small rows, collected once). */
  final case class Bm25Model(n: Long, l: Long, df: Map[String, Long])

  /** Build the frozen model from a (batch) corpus snapshot. */
  def bm25Model(s: SparkSession, corpus: DataFrame,
      queries: Seq[(String, Seq[String])] = QUERIES): Bm25Model = {
    val terms = queries.flatMap(_._2).distinct
    val docs = corpus
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        coalesce(size(col("toks")), lit(0)).cast(LongType).as("dl"))
    val Array(n, l) = docs
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
    val df = docs
      .select(col("doc_id"),
        explode(call_function("graft_filter_in",
          col("toks"), typedlit(terms))).as("w"))
      .distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Bm25Model(n, l, df)
  }

  /** Score any (doc_id, text, …) frame — batch OR streaming — against
    * the frozen model: every constant (idf per term, N, L) is baked
    * into the projection as a literal, tf is a per-row array filter,
    * so scoring is one narrow codegen'd pass with no joins, no
    * shuffle, no state (the dsirScoreAgainst pattern). Emits one row
    * per (doc, query) with score ≥ 1 — identical to [[bm25Scored]]
    * on the same snapshot (integer arithmetic, same truncations). */
  def bm25ScoreAgainst(raw: DataFrame, model: Bm25Model,
      queries: Seq[(String, Seq[String])] = QUERIES): DataFrame = {
    def termScoreSql(t: String): String = {
      val df = model.df.getOrElse(t, 0L)
      val idfq = ((2 * model.n - 2 * df + 1) * Q1) / (2 * df + 1)
      val tq = t.replace("'", "''")
      val tf = s"CAST(size(filter(toks, x -> x = '$tq')) AS BIGINT)"
      // tf = 0 ⇒ the div's numerator is 0 ⇒ the term contributes 0
      s"(${idfq}L * ((${22 * model.l}L * $tf * ${Q2}L) div " +
        s"(${10 * model.l}L * $tf + ${3 * model.l}L + 9L * dl * ${model.n}L)))"
    }
    val perQuery = queries.map { case (qid, ts) =>
      struct(lit(qid).as("qid"),
        ts.map(t => expr(termScoreSql(t))).reduce(_ + _).as("score"))
    }
    raw
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"),
        coalesce(size(col("toks")), lit(0)).cast(LongType).as("dl"),
        col("toks"))
      .select(col("doc_id"), explode(array(perQuery: _*)).as("q"))
      .select(col("doc_id"), col("q.qid").as("qid"), col("q.score").as("score"))
      .filter(col("score") > 0)
  }

  // ---------------------------------------------------------------
  // c28 — hybrid retrieval: BM25 ⊕ dense, reciprocal-rank fusion
  // ---------------------------------------------------------------

  /** Shortlist depth each retriever contributes to the fusion. */
  private[operators] val RRF_SHORT = 20
  /** The RRF dampening constant (k = 60, the value from Cormack &
    * Clarke's original RRF paper that every deployment copies). */
  private[operators] val RRF_K = 60L
  /** Fixed-point scale: rrf = Σ Q div (k + rank) stays integer-exact
    * and engine-portable (a double 1/(k+r) sum would be order-
    * sensitive). Resolution 2^20 ≫ the ~3·10^4 spread between
    * adjacent ranks at k=60, so no information is lost. */
  private[operators] val RRF_Q = 1L << 20

  /** c28 — HYBRID search: the sparse retriever (BM25, c24) and the
    * dense retriever (exact cosine over embeddings, c06's shape) each
    * produce a top-[[RRF_SHORT]] shortlist per query; reciprocal-rank
    * fusion merges them and the top-[[TOPK]] fused results win. This
    * is the standard RAG retrieval stack (Elasticsearch/Vespa/Weaviate
    * all ship exactly this composition) — keyword precision plus
    * semantic recall, no score calibration needed because RRF only
    * consumes RANKS.
    *
    * Query workload: the i-th text query [[QUERIES]] is paired with
    * query vector `embeddings[vec_id = i]` (fixture convention,
    * enforced below). Scale shape: the BM25 side shuffles matched
    * postings only (c24's argument); the dense side is one narrow
    * corpus pass against |Q| literal query vectors whose rank-filter
    * compiles to WindowGroupLimit (partial top-k map-side, the c06
    * argument — the corpus never shuffles); fusion then joins two
    * |Q|·[[RRF_SHORT]]-row frames — driver-scale, whatever the corpus
    * size. */
  def c28HybridRrf(s: SparkSession, d: String): DataFrame = {
    QUERIES.zipWithIndex.foreach { case ((qid, _), i) =>
      require(qid == s"q${i + 1}", s"QUERIES($i) must be q${i + 1} (vector pairing)") }
    val byScore = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    val text = bm25Scored(s, Tables.documents(s, d), QUERIES)
      .withColumn("trk", row_number().over(byScore).cast(LongType))
      .filter(col("trk") <= RRF_SHORT)
      .select(col("qid"), col("doc_id"), col("trk"))
    // Query vectors as literals (bounded collect, the anchorVectors
    // pattern) — the dense scan is then a single codegen'd pass.
    val emb = Tables.embeddings(s, d)
    val qv = emb.filter(col("vec_id") < QUERIES.length)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Float](1))).sortBy(_._1)
    val perQ = qv.map { case (i, v) =>
      struct(lit(QUERIES(i)._1).as("qid"),
        Portable.dot(col("embedding"), typedLit(v)).as("score")) }
    val denseRanked = emb
      .select(col("vec_id").as("doc_id"), explode(array(perQ.toIndexedSeq: _*)).as("q"))
      .select(col("q.qid").as("qid"), col("doc_id"), col("q.score").as("score"))
      .withColumn("vrk", row_number().over(byScore).cast(LongType))
      .filter(col("vrk") <= RRF_SHORT)
      .select(col("qid"), col("doc_id"), col("vrk"))
    val byFused = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    text.join(denseRanked, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"${RRF_Q}L div (${RRF_K}L + trk)"), lit(0L)) +
          coalesce(expr(s"${RRF_Q}L div (${RRF_K}L + vrk)"), lit(0L)))
      .withColumn("rank", row_number().over(byFused).cast(LongType))
      .filter(col("rank") <= TOPK)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf_score"),
        col("trk").as("text_rank"), col("vrk").as("vec_rank"))
      .orderBy(col("qid"), col("rank"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("c24_bm25_topk" -> c24Bm25TopK,
      "c28_hybrid_rrf" -> c28HybridRrf)

  private def queryValues: String = QUERIES
    .flatMap { case (qid, ws) => ws.map(w => s"('$qid', '$w')") }
    .mkString(", ")

  /** The c24 oracle's CTE list through the scored (qid, doc_id,
    * score) table `sc` — shared with the c28 hybrid fusion. */
  private def bm25Ctes: String =
    s"""q(qid, w) AS (VALUES $queryValues),
       |base AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t
       |         FROM documents),
       |d AS (SELECT doc_id, CAST(COALESCE(len(t), 0) AS BIGINT) AS dl
       |      FROM base),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |              CAST(SUM(dl) AS BIGINT) AS l FROM d),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, unnest(t) AS w FROM base)
       |       WHERE w IN (SELECT w FROM q) GROUP BY doc_id, w),
       |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df
       |          FROM tf GROUP BY w),
       |sc AS (SELECT q.qid, tf.doc_id, CAST(SUM(
       |    ((2 * st.n - 2 * f.df + 1) * $Q1 // (2 * f.df + 1)) *
       |    ((22 * st.l * tf.tf * $Q2) //
       |     (10 * st.l * tf.tf + 3 * st.l + 9 * d.dl * st.n))
       |  ) AS BIGINT) AS score
       |  FROM tf JOIN q USING (w) JOIN dfreq f USING (w)
       |       JOIN d USING (doc_id) CROSS JOIN st
       |  GROUP BY q.qid, tf.doc_id)""".stripMargin

  override val oracle: Map[String, String] = Map(
    "c24_bm25_topk" ->
      s"""WITH $bm25Ctes
         |SELECT qid, rk, doc_id, score FROM (
         |  SELECT qid, doc_id, score,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY score DESC, doc_id) AS BIGINT) AS rk
         |  FROM sc)
         |WHERE rk <= $TOPK ORDER BY qid, rk""".stripMargin,
    "c28_hybrid_rrf" -> {
      val dot = Portable.dotSql("e.embedding", "vq.qemb", 64)
      s"""WITH $bm25Ctes,
         |txt AS (SELECT qid, doc_id, trk FROM (
         |  SELECT qid, doc_id,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY score DESC, doc_id) AS BIGINT) AS trk
         |  FROM sc) WHERE trk <= $RRF_SHORT),
         |vq AS (SELECT 'q' || CAST(vec_id + 1 AS VARCHAR) AS qid,
         |              embedding AS qemb
         |       FROM embeddings WHERE vec_id < ${QUERIES.length}),
         |vsc AS (SELECT vq.qid, e.vec_id AS doc_id, $dot AS score
         |        FROM embeddings e CROSS JOIN vq),
         |vr AS (SELECT qid, doc_id, vrk FROM (
         |  SELECT qid, doc_id,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY score DESC, doc_id) AS BIGINT) AS vrk
         |  FROM vsc) WHERE vrk <= $RRF_SHORT),
         |fused AS (SELECT
         |    COALESCE(t.qid, v.qid) AS qid,
         |    COALESCE(t.doc_id, v.doc_id) AS doc_id,
         |    t.trk AS text_rank, v.vrk AS vec_rank,
         |    COALESCE($RRF_Q // ($RRF_K + t.trk), 0) +
         |      COALESCE($RRF_Q // ($RRF_K + v.vrk), 0) AS rrf_score
         |  FROM txt t FULL OUTER JOIN vr v
         |    ON t.qid = v.qid AND t.doc_id = v.doc_id)
         |SELECT qid, rank, doc_id, CAST(rrf_score AS BIGINT) AS rrf_score,
         |       text_rank, vec_rank
         |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid
         |        ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
         |      FROM fused)
         |WHERE rank <= $TOPK ORDER BY qid, rank""".stripMargin
    })
}
