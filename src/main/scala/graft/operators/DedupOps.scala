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
  * touches rows sharing a bucket. Guarantees:
  *  - c02: a pair sharing any of the 4 bands collides; with r=4 rows
  *    per band, P(collide) = 1-(1-j^4)^4 (≈0.98 at j=0.8).
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

  // ---------------------------------------------------------------
  // c01 — exact dedup on normalized content hash
  // ---------------------------------------------------------------

  /** Normalization: lowercase + collapse whitespace runs. */
  private def norm(c: Column): Column =
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
  private val BANDS = 4
  private val R = 4
  private val JACCARD_T = 0.8

  /** Distinct 3-word shingles per document. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), "\\s+"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))"))
        .as("sh"))
      .distinct()

  /** Exact-Jaccard verification of a candidate-pair set against the
    * distinct-shingle table; keeps pairs with jac ≥ t. */
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
      .orderBy(col("da"), col("db"))
  }

  def c02MinhashLsh(s: SparkSession, d: String): DataFrame = {
    val sh = shingles(s, d).cache()
    val minCols = (0 until K).map(i =>
      min(Portable.h60(concat(lit(s"$i:"), col("sh")))).as(s"m$i"))
    val sig = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val bands = sig.select(col("doc_id"), posexplode(array(
      (0 until BANDS).map(b =>
        concat_ws(",", (0 until R).map(r => col(s"m${b * R + r}")): _*)): _*)))
      .toDF("doc_id", "band", "key")
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    verifyJaccard(cand, sh, JACCARD_T)
  }

  // ---------------------------------------------------------------
  // c03 — SimHash (60-bit, term-frequency weighted, 4 blocking
  // chunks of 15 bits, Hamming ≤ 3 ⇒ exact by pigeonhole)
  // ---------------------------------------------------------------

  private val BITS = 60
  private val CHUNKS = 4
  private val CHUNK_BITS = 15
  private val HAMMING_T = 3

  def c03Simhash(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("freq"))
      .withColumn("h", Portable.h60(col("tok")))
    val sumCols = (0 until BITS).map(j =>
      sum(col("freq") * (shiftright(col("h"), j).bitwiseAND(1) * 2 - 1)).as(s"s$j"))
    val sums = tf.groupBy(col("doc_id")).agg(sumCols.head, sumCols.tail: _*)
    val fp = sums.select(col("doc_id"),
      (0 until BITS).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _).as("fp"))
    val chunks = fp.select(col("doc_id"), col("fp"), posexplode(array(
      (0 until CHUNKS).map(c =>
        shiftright(col("fp"), c * CHUNK_BITS).bitwiseAND((1 << CHUNK_BITS) - 1)): _*)))
      .toDF("doc_id", "fp", "chunk", "cv")
    val cand = chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        col("x.fp").as("fpa"), col("y.fp").as("fpb"))
      .distinct()
    cand
      .withColumn("hamming", expr("CAST(bit_count(fpa ^ fpb) AS BIGINT)"))
      .filter(col("hamming") <= HAMMING_T)
      .select(col("da"), col("db"), col("fpa"), col("fpb"), col("hamming"))
      .orderBy(col("da"), col("db"))
  }

  // ---------------------------------------------------------------
  // c04 — word-4-gram Jaccard with prefix + size filtering (t = 0.85)
  // ---------------------------------------------------------------

  private val NGRAM_T = 0.85
  private val NGRAM_N = 4

  /** 4-word ngrams: distinctive enough that the global-df prefix
    * order has real discriminating power even on a small vocabulary
    * (bigrams of a 40-word vocabulary all have huge df, which
    * made every prefix bucket quadratic — measured 72s at sf0.1). */
  private def ngrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), "\\s+"))
      .where(size(col("toks")) >= NGRAM_N)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $NGRAM_N), i -> concat_ws(' ', slice(toks, i + 1, $NGRAM_N)))"))
        .as("sh"))
      .distinct()

  def c04NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val ng = ngrams(s, d).cache()
    val df = ng.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val sized = ng.join(df, "sh")
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
    // prefix bound: a pair with jac >= t shares one of each side's
    // first |A| - ceil(t*|A|) + 1 ngrams under the global (df, sh)
    // order (rarest first, so candidate buckets stay small).
    val prefix = sized
      .filter(col("rn") <= col("n") - expr(s"CAST(ceil($NGRAM_T * n) AS BIGINT)") + lit(1))
      .select(col("doc_id"), col("sh"), col("n"))
    // size filter: jac >= t forces t <= |A|/|B| <= 1/t.
    val cand = prefix.as("x")
      .join(prefix.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id") &&
          col("y.n").cast(DoubleType) >= lit(NGRAM_T) * col("x.n") &&
          col("x.n").cast(DoubleType) >= lit(NGRAM_T) * col("y.n"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    verifyJaccard(cand, ng, NGRAM_T)
  }

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
    val dupIds = c02MinhashLsh(s, d).select(col("db").as("doc_id")).distinct()
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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_dedup_exact" -> c01Exact,
    "c02_dedup_minhash" -> c02MinhashLsh,
    "c03_dedup_simhash" -> c03Simhash,
    "c04_dedup_ngram" -> c04NgramJaccard,
    "c08_corpus_curate" -> c08CorpusCurate)

  // ---------------------------------------------------------------
  // DuckDB oracle twins — same algorithm, same hashes, stage by stage
  // ---------------------------------------------------------------

  private val shinglesSql =
    """SELECT DISTINCT doc_id, s AS sh FROM (
      |  SELECT doc_id, unnest(list_transform(range(0, len(t) - 2),
      |    i -> array_to_string(t[i + 1:i + 3], ' '))) AS s
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') t FROM documents)
      |  WHERE len(t) >= 3)""".stripMargin

  private val ngramsSql =
    s"""SELECT DISTINCT doc_id, s AS sh FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, len(t) - ${NGRAM_N - 1}),
       |    i -> array_to_string(t[i + 1:i + $NGRAM_N], ' '))) AS s
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') t FROM documents)
       |  WHERE len(t) >= $NGRAM_N)""".stripMargin

  /** The c02 MinHash-LSH candidate pipeline as a WITH-clause body
    * (sh, sig, bands, cand, sizes) — shared by the c02 and c08
    * oracles. */
  private lazy val c02Ctes: String = {
    val mins = (0 until K).map(i =>
      s"MIN(${Portable.h60Sql(s"'$i:' || sh")}) AS m$i").mkString(",\n         ")
    val bandRows = (0 until BANDS).map(b =>
      s"SELECT doc_id, $b AS band, concat_ws(',', " +
        (0 until R).map(r => s"m${b * R + r}").mkString(", ") + ") AS key FROM sig")
      .mkString("\n       UNION ALL ")
    s"""sh AS ($shinglesSql),
       |sig AS (SELECT doc_id,
       |         $mins
       |        FROM sh GROUP BY doc_id),
       |bands AS ($bandRows),
       |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin
  }

  private def verifySql(t: Double): String =
    s"""SELECT da, db, za.n AS na, zb.n AS nb, i.inter,
       |       CAST(i.inter AS DOUBLE) / CAST(za.n + zb.n - i.inter AS DOUBLE) AS jac
       |FROM (SELECT da, db, count(*) AS inter
       |      FROM cand JOIN sh sa ON da = sa.doc_id
       |                JOIN sh sb ON db = sb.doc_id AND sa.sh = sb.sh
       |      GROUP BY da, db) i
       |JOIN sizes za ON da = za.doc_id
       |JOIN sizes zb ON db = zb.doc_id
       |WHERE CAST(i.inter AS DOUBLE) / CAST(za.n + zb.n - i.inter AS DOUBLE) >= $t
       |ORDER BY da, db""".stripMargin

  override val oracle: Map[String, String] = Map(
    "c01_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS content_hash,
        |       MIN(doc_id) AS canonical_id, COUNT(*) AS dup_ct
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    "c02_dedup_minhash" ->
      s"""WITH $c02Ctes
         |${verifySql(JACCARD_T)}""".stripMargin,
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
    "c03_dedup_simhash" -> {
      val sums = (0 until BITS).map(j =>
        s"SUM(freq * (((h >> $j) & 1) * 2 - 1)) AS s$j").mkString(",\n         ")
      val fpBits = (0 until BITS).map(j =>
        s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      val chunkRows = (0 until CHUNKS).map(c =>
        s"SELECT doc_id, fp, $c AS chunk, (fp >> ${c * CHUNK_BITS}) & ${(1 << CHUNK_BITS) - 1} AS cv FROM fp")
        .mkString("\n       UNION ALL ")
      s"""WITH tf AS (SELECT doc_id, tok, count(*) AS freq,
         |             ${Portable.h60Sql("tok")} AS h
         |            FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
         |                  FROM documents)
         |            GROUP BY doc_id, tok),
         |sums AS (SELECT doc_id,
         |         $sums
         |         FROM tf GROUP BY doc_id),
         |fp AS (SELECT doc_id, $fpBits AS fp FROM sums),
         |chunks AS ($chunkRows),
         |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db,
         |                x.fp AS fpa, y.fp AS fpb
         |         FROM chunks x JOIN chunks y
         |           ON x.chunk = y.chunk AND x.cv = y.cv AND x.doc_id < y.doc_id)
         |SELECT da, db, fpa, fpb, CAST(bit_count(xor(fpa, fpb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(fpa, fpb)) <= $HAMMING_T
         |ORDER BY da, db""".stripMargin
    },
    "c04_dedup_ngram" ->
      s"""WITH sh AS ($ngramsSql),
         |dft AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
         |sized AS (SELECT s.doc_id, s.sh, dft.df,
         |            count(*) OVER (PARTITION BY s.doc_id) AS n,
         |            row_number() OVER (PARTITION BY s.doc_id ORDER BY dft.df, s.sh) AS rn
         |          FROM sh s JOIN dft ON s.sh = dft.sh),
         |prefix AS (SELECT doc_id, sh, n FROM sized
         |           WHERE rn <= n - CAST(ceil($NGRAM_T * n) AS BIGINT) + 1),
         |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
         |         FROM prefix x JOIN prefix y
         |           ON x.sh = y.sh AND x.doc_id < y.doc_id
         |          AND CAST(y.n AS DOUBLE) >= $NGRAM_T * x.n
         |          AND CAST(x.n AS DOUBLE) >= $NGRAM_T * y.n),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
         |${verifySql(NGRAM_T)}""".stripMargin)
}
