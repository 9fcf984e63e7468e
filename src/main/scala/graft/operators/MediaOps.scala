package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A media row: opaque binary payload + typed metadata — the
  * multimodal column convention (image/audio/video as `binary`,
  * metadata alongside, never parsed by the engine itself). */
final case class MediaRow(
    doc_id: Long,
    media: Array[Byte],
    mime: String,
    width: Int,
    height: Int)

/** Deterministic features a decoder would emit per media payload. */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    histogram: Array[Long],   // 16-bin byte histogram ("pixel stats")
    sample_checksum: Long,    // checksum over every 8th byte ("frame sample")
    batch_size: Int)          // decode-batch the row was processed in

/** Deterministic stand-in for a resampled ("resized") payload. */
final case class ResizedMedia(
    doc_id: Long,
    out_w: Int,               // dimensions after scaling to target width
    out_h: Int,
    stride: Int,              // byte stride standing in for the scale factor
    resized_bytes: Long,      // bytes surviving the stride ("output size")
    resized_checksum: Long)

/** Multimodal-column operators: treat image/audio/video as opaque
  * binary columns with typed metadata, processed in batches by a
  * per-partition decoder.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * DETERMINISTIC FAKE decoder (byte histogram + strided checksum) —
  * clearly marked; swap `decodeStub` for a real JNI/codec call and
  * everything around it (schema, batching, partitioning, the m01
  * metadata query) stays as-is. The Spark-side plumbing is real:
  *  - binary payloads travel as BinaryType columns;
  *  - decoding runs via mapPartitions in fixed-size batches (the
  *    shape a vectorized decoder wants — one codec init per batch,
  *    not per row);
  *  - partition count controls decoder parallelism, not row order.
  *
  * Scale stance: decode is embarrassingly parallel, no shuffle; at
  * 100 TB the only knob is input split size (media blobs dominate,
  * so spark.sql.files.maxPartitionBytes sizes decoder memory).
  */
object MediaOps extends QueryModule {

  val DECODE_BATCH = 64

  /** Attach a synthetic media payload + metadata to each document
    * (the corpus has no real blobs; payload = UTF-8 bytes of text,
    * dimensions derived portably from the content hash). */
  def attachMedia(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("text").cast(BinaryType).as("media"),
        lit("application/octet-stream").as("mime"),
        (lit(320) + Portable.h60(concat(col("text"), lit(":w"))) % 1600)
          .cast(IntegerType).as("width"),
        (lit(240) + Portable.h60(concat(col("text"), lit(":h"))) % 840)
          .cast(IntegerType).as("height"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake of decode/feature-extract.
    * Processes rows in DECODE_BATCH groups per partition, mirroring a
    * vectorized decoder's batch shape. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.grouped(DECODE_BATCH).flatMap { batch =>
      // (real decoder: init codec once per batch here)
      batch.map { r =>
        // null payload (e.g. a null-text document cast to binary) is
        // a legitimate row — decode to empty features, don't NPE.
        val media = if (r.media == null) Array.emptyByteArray else r.media
        val hist = new Array[Long](16)
        var i = 0
        while (i < media.length) {
          hist((media(i) & 0xFF) % 16) += 1L
          i += 1
        }
        var checksum = 0L
        var j = 0
        while (j < media.length) {
          checksum = checksum * 31 + (media(j) & 0xFF)
          j += 8 // strided sampling — the "frame sample" stand-in
        }
        MediaFeatures(r.doc_id, media.length.toLong, hist, checksum, batch.size)
      }
    }

  /** The full batch pipeline: attach → repartition (decoder
    * parallelism) → batched decode. */
  def decodeAll(s: SparkSession, d: String, partitions: Int = 0): Dataset[MediaFeatures] = {
    import s.implicits._
    val media = attachMedia(s, d)
    val parted = if (partitions > 0) media.repartition(partitions) else media
    parted.mapPartitions(decodeStub)
  }

  /** STUB resize — deterministic fake of a scaler to `targetW`
    * pixels wide: the integer downscale factor becomes a byte
    * stride, and the "resized payload" is the strided byte stream's
    * size + checksum. Same batch shape as [[decodeStub]] (one scaler
    * init per batch in the real thing); a payload narrower than the
    * target passes through at stride 1 (no upscaling). Swap the loop
    * body for a real scaler and the schema/batching/partitioning
    * stay as-is. */
  def resizeStub(targetW: Int)(rows: Iterator[MediaRow]): Iterator[ResizedMedia] =
    rows.grouped(DECODE_BATCH).flatMap { batch =>
      // (real scaler: init once per batch here)
      batch.map { r =>
        val media = if (r.media == null) Array.emptyByteArray else r.media
        val stride = math.max(1, r.width / targetW)
        var checksum = 0L
        var n = 0L
        var j = 0
        while (j < media.length) {
          checksum = checksum * 31 + (media(j) & 0xFF)
          n += 1
          j += stride
        }
        ResizedMedia(r.doc_id, r.width / stride, r.height / stride,
          stride, n, checksum)
      }
    }

  /** attach → repartition → batched resize (the scaler pipeline). */
  def resizeAll(s: SparkSession, d: String, targetW: Int = 256,
      partitions: Int = 0): Dataset[ResizedMedia] = {
    import s.implicits._
    val media = attachMedia(s, d)
    val parted = if (partitions > 0) media.repartition(partitions) else media
    parted.mapPartitions(resizeStub(targetW))
  }

  /** m01 — the oracle-checkable slice: binary payload length and
    * hash-derived metadata, computed engine-portably (byte length via
    * the binary column on the Spark side, BLOB cast in DuckDB). */
  def m01MediaMeta(s: SparkSession, d: String): DataFrame =
    attachMedia(s, d)
      .select(
        col("doc_id"),
        length(col("media")).cast(LongType).as("n_bytes"),
        col("mime"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"))
      .orderBy(col("doc_id"))

  /** m02 — frame-sample slice: strided prefix bytes of the payload
    * (hex, so both engines render identically) + sample cardinality —
    * the oracle-checkable face of the strided sampling decodeStub
    * does per batch. */
  def m02FrameSample(s: SparkSession, d: String): DataFrame =
    attachMedia(s, d)
      .select(
        col("doc_id"),
        substring(hex(col("media")), 1, 16).as("head_hex"),
        expr("CAST(ceil(octet_length(media) / 8.0) AS BIGINT)").as("n_samples"))
      .orderBy(col("doc_id"))

  /** Core of m03 over any `(doc_id, media, mime, …)` frame. */
  def mediaDedup(media: DataFrame): DataFrame =
    media
      .groupBy(md5(col("media")).as("content_key"), col("mime"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("dup_ct"),
        sum(length(col("media")).cast(LongType)).as("bytes_total"))
      .orderBy(col("canonical_id"))

  /** m03 — media exact dedup / content-addressed storage key: group
    * payloads by md5 over the BINARY column per mime — the CAS key a
    * media lake dedupes and shards blobs by — keeping the canonical
    * (minimum) doc and byte totals. The c01 groupBy-on-derived-hash
    * shape exercised on BinaryType: hashing and aggregation never
    * decode the payload, so the operator scans blob bytes once and
    * shuffles one small row per distinct content key. The oracle
    * hashes the same bytes through VARCHAR (the fixture payload IS
    * the text's UTF-8 bytes; this harness's DuckDB has md5(VARCHAR)
    * only — octet_length still goes through the BLOB cast as in
    * m01/m02). */
  def m03MediaDedup(s: SparkSession, d: String): DataFrame =
    mediaDedup(attachMedia(s, d).toDF())

  private val PH_BITS = 60
  private val PH_CELLS = PH_BITS + 1

  /** Perceptual 60-bit fingerprint of a media payload — the dHash
    * STRUCTURE (adjacent-cell intensity comparisons → bits, so the
    * signature is invariant to global brightness/scale shifts) over
    * stub cell intensities. A real decoder yields a 61-cell grid of
    * mean pixel intensities; this container has no codecs, so the
    * honest stand-in derives each "cell intensity" as `graft_h60` of
    * an equal slice of the hex payload — deterministic, engine-
    * portable, loudly fake (like [[decodeStub]]). Everything AROUND
    * the intensities — bit construction, Hamming banding, the
    * pigeonhole candidate join — is the real, swap-ready operator. */
  /** The STAGED relational form of the perceptual fingerprint — the
    * reference [[graft.functions.Phash60]] is pinned against in
    * MediaOpsSpec (the c03 pattern: oracle and spec keep the
    * relational algorithm, the hot path runs the native expression).
    * Built over THREE projection steps so the 61-cell transform
    * references `hexs`/`w` as plain attributes: higher-order
    * functions are interpreted (no codegen, no subexpression
    * elimination), so an inline `hex(media)` would be re-evaluated
    * once per cell — ~180 full-payload hex passes per row, measured
    * 10 s vs ~2 s at sf0.1. CollapseProject's expensive-expression
    * guard keeps the staging projections separate. */
  private[operators] def phashFrameRelational(media: DataFrame): DataFrame = {
    val cells = transform(sequence(lit(0), lit(PH_CELLS - 1)),
      k => Portable.h60(col("hexs").substr(k * col("w") + lit(1), col("w"))))
    // bit k (0-based) set iff cell_k < cell_{k+1}; fold most-
    // significant-first so sig = Σ bit_k·2^k < 2^60 in exact longs
    val bits = zip_with(
      slice(col("cs"), 1, PH_BITS), slice(col("cs"), 2, PH_BITS),
      (a, b) => when(a < b, lit(1L)).otherwise(lit(0L)))
    media
      .select(col("doc_id"), hex(col("media")).as("hexs"))
      // slice width: floor(len/61), min 1 (tail chars beyond 61·w are
      // cropped — the same crop a grid downsample does)
      .select(col("doc_id"), col("hexs"),
        greatest(floor(length(col("hexs")) / lit(PH_CELLS.toDouble))
          .cast(IntegerType), lit(1)).as("w"))
      .select(col("doc_id"), cells.as("cs"))
      .select(col("doc_id"),
        aggregate(reverse(bits), lit(0L), (acc, x) => acc * lit(2L) + x)
          .as("fp"))
      .where(col("fp").isNotNull)
  }

  /** m04 — perceptual near-duplicate pairs: payloads whose
    * fingerprints differ in ≤ 3 of 60 bits. Candidate generation and
    * verification are EXACTLY c03's machinery ([[DedupOps
    * .c03SimhashOf]]: 4×15-bit chunk blocking — pigeonhole-complete
    * at Hamming ≤ 3 — then bit_count verify), applied to the
    * perceptual fingerprint instead of the text SimHash: the
    * image-near-dup pass (pHash/dHash family) every multimodal
    * curation pipeline runs beside exact CAS dedup (m03), with the
    * same linear scale shape c03 measured. The fingerprint is ONE
    * codegen'd expression ([[graft.functions.Phash60]] — c03's
    * native-vs-relational trade, same rationale); the staged
    * relational twin above stays as the spec/oracle reference. */
  def m04MediaNeardup(s: SparkSession, d: String): DataFrame =
    DedupOps.c03SimhashOf(attachMedia(s, d).toDF()
      .select(col("doc_id"),
        call_function("graft_phash60", col("media")).as("fp"))
      .where(col("fp").isNotNull))

  private val FRAMES = 8 // strided "video" frames per payload
  private val VOTES = 4  // half the frame slots must match (short stub
                         // frames make single-frame collisions cheap)
  /** Frame-IDENTITY Hamming gate — deliberately TIGHTER than c03's
    * document gate (3). A frame is 1/FRAMES of a payload, so its
    * 60-bit sketch carries far less entropy than a whole-document
    * fingerprint; at ≤ 3 the per-frame match relation on short stub
    * frames went quadratic (sf0.1: 786k frame pairs, 34k "video
    * pairs", 18 s — measured). Frame matching in a vote scheme wants
    * near-identity; ROBUSTNESS to re-encoding comes from the
    * VOTES-of-FRAMES rule, not from a loose per-frame radius. At ≤ 1
    * the same corpus yields output proportional to true duplicate
    * clusters and the join cost collapses with it. */
  private val FRAME_HAMMING_T = 1

  /** m05 — VIDEO near-duplicate detection by frame voting: the
    * m02 × m04 composition every video-curation pipeline runs (e.g.
    * re-encoded or trimmed copies of a clip). Each payload is cut
    * into FRAMES equal byte slices — the deterministic stand-in for
    * a strided frame sample, [[decodeStub]]'s honesty contract: swap
    * the slicer for a real keyframe extractor and everything
    * downstream stays — each frame is perceptually fingerprinted
    * (graft_phash60, m04's expression), and frames flow through
    * EXACTLY c03's pigeonhole machinery keyed by (doc, frame). Two
    * videos are near-dups when ≥ VOTES distinct frame slots of the
    * first find a Hamming ≤ [[FRAME_HAMMING_T]] frame anywhere in
    * the second — position-blind on the match side, so a trimmed/
    * reordered copy still votes. Scale shape: FRAMES× the rows of
    * m04 through the same linear band join, then one (da, db)-keyed
    * count — pair output stays duplicate-proportional, and empty
    * tail frames of short payloads are dropped so they can't
    * band-match each other into a clique. */
  /** The per-frame fingerprint table m05 blocks on (spec/probe
    * surface): synthetic frame id = doc_id · FRAMES + slot. */
  private[graft] def m05Frames(s: SparkSession, d: String): DataFrame =
    attachMedia(s, d).toDF()
      .where(col("media").isNotNull)
      .withColumn("fb",
        greatest(expr(s"octet_length(media) div $FRAMES"), lit(1)))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${FRAMES - 1}), " +
          "j -> substring(media, j * fb + 1, fb))")))
      .toDF("doc_id", "frame", "fmedia")
      .where(expr("octet_length(fmedia) > 0"))
      .select((col("doc_id") * FRAMES + col("frame")).as("doc_id"),
        call_function("graft_phash60", col("fmedia")).as("fp"))
      .where(col("fp").isNotNull)

  def m05VideoNeardup(s: SparkSession, d: String): DataFrame = {
    val frames = persistedM05Frames(s, d)
    DedupOps.c03PairsPairBand(frames, FRAME_HAMMING_T)
      .select(expr(s"da div $FRAMES").as("va"), expr(s"da % $FRAMES").as("fra"),
        expr(s"db div $FRAMES").as("vb"))
      .where(col("va") < col("vb"))
      .groupBy(col("va").as("da"), col("vb").as("db"))
      .agg(countDistinct(col("fra")).as("n_frames"))
      .where(col("n_frames") >= VOTES)
      .orderBy(col("da"), col("db"))
  }

  /** m06 — AUDIO waveform statistics: each payload interpreted as
    * 8-bit unsigned PCM (the honest stub decode —
    * [[graft.functions.PcmStats]] carries the swap-for-a-real-codec
    * contract) and reduced in ONE codegen'd per-row pass to sample/
    * silence/clipping counts, peak amplitude and exact integer
    * energy, plus the silence ratio every voice-activity gate cuts
    * on. Completes the multimodal family's third modality: m01/m02
    * image-shaped, m05 video-shaped, m06 audio-shaped.
    *
    * Scale shape: embarrassingly parallel projection, no shuffle
    * but the determinism sort; the oracle replays the byte→sample
    * arithmetic through DuckDB's hex/list machinery — all integer
    * except the final single-division ratio. */
  def m06AudioStats(s: SparkSession, d: String): DataFrame =
    attachMedia(s, d).toDF()
      .where(col("media").isNotNull)
      .select(col("doc_id"),
        call_function("graft_pcm_stats", col("media")).as("st"))
      .select(col("doc_id"),
        col("st")(0).as("n_samples"),
        col("st")(1).as("silence_ct"),
        col("st")(2).as("clip_ct"),
        col("st")(3).as("peak"),
        col("st")(4).as("energy"))
      .withColumn("silence_ratio",
        when(col("n_samples") > 0,
          col("silence_ct").cast(DoubleType) / col("n_samples").cast(DoubleType))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------
  // m07 — incremental media ingest vs a persisted fingerprint store
  // ---------------------------------------------------------------

  private def phashTables(d: String): (String, String) = {
    val tag = Integer.toHexString(d.hashCode)
    (s"graft_phash_band_$tag", s"graft_phash_meta_$tag")
  }

  /** m05's frame-fingerprint table name (frame-grain (doc_id, fp) —
    * the video face's store artifact). */
  private def phashFramesTable(d: String): String =
    s"graft_phash_frames_${Integer.toHexString(d.hashCode)}"

  /** Store layout version (round 9 added the frame table). */
  private val PHASH_STORE_VER = "ph2§"

  /** Per-asset (doc_id, fp, bandv) chunk-band rows — bandv packs
    * (chunk, 15-bit chunk value) into ONE join key so the store can
    * be bucketed on a single column. */
  private def bandRows(fp: DataFrame): DataFrame =
    fp.select(col("doc_id"), col("fp"), explode(array(
      (0 until DedupOps.CHUNKS).map(c =>
        (lit(c.toLong) * (1L << DedupOps.CHUNK_BITS)) +
          shiftright(col("fp"), c * DedupOps.CHUNK_BITS)
            .bitwiseAND((1 << DedupOps.CHUNK_BITS) - 1)): _*)).as("bandv"))

  private def splitFp(s: SparkSession, d: String, newSide: Boolean): DataFrame =
    attachMedia(s, d).toDF()
      .where(col("media").isNotNull &&
        (if (newSide) DedupOps.newSplitFlag else !DedupOps.newSplitFlag))
      .select(col("doc_id"),
        call_function("graft_phash60", col("media")).as("fp"))
      .where(col("fp").isNotNull)

  /** Persist the EXISTING media corpus's perceptual fingerprints as
    * a band-keyed bucketed table + drift token — c13b's build-once
    * lifecycle for the media modality. Every later ingest batch
    * probes these buckets instead of re-fingerprinting the corpus. */
  def buildPhashStore(s: SparkSession, d: String): Unit = {
    val (bandT, metaT) = phashTables(d)
    val framesT = phashFramesTable(d)
    Seq(bandT, metaT, framesT).foreach(ScaleOps.dropStale(s, _))
    ScaleOps.writeBucketed(
      bandRows(splitFp(s, d, newSide = false)), bandT, "bandv", buckets = 16)
    // m05's frame fingerprints — fingerprinting the corpus's frames
    // is the once-per-corpus half; the banded frame-vote pairing
    // (the operator under study) runs on the table.
    m05Frames(s, d).write.mode("overwrite").format("parquet")
      .saveAsTable(framesT)
    s.createDataFrame(Seq(Tuple1(
      PHASH_STORE_VER + ScaleOps.corpusToken(s, d, "documents.parquet"))))
      .toDF("token").write.mode("overwrite").format("parquet").saveAsTable(metaT)
  }

  /** The persisted m05 frame table, drift-token guarded like every
    * store artifact. */
  private[graft] def persistedM05Frames(s: SparkSession, d: String): DataFrame = {
    val (_, metaT) = phashTables(d)
    val want = PHASH_STORE_VER + ScaleOps.corpusToken(s, d, "documents.parquet")
    def token(): Option[String] =
      if (!s.catalog.tableExists(metaT)) None
      else s.table(metaT).collect().headOption.map(_.getString(0))
    if (!token().contains(want)) buildPhashStore(s, d)
    s.table(phashFramesTable(d))
  }

  /** m07 — INCREMENTAL media near-dup: a new ingest batch (the c13
    * split convention) against the PERSISTED fingerprint store only
    * — batch-vs-corpus, never corpus-vs-corpus. The steady-state
    * shape every media ingest runs nightly: fingerprint the batch,
    * probe the bucketed band table (the store side reads bucketed —
    * no corpus-side exchange), verify candidates by exact Hamming.
    *
    * Scale shape: batch-side work is batch-sized; the store is
    * touched only through the band equi-join's bucket-pruned read.
    * Shuffle ∝ batch bands + candidates, independent of the old
    * corpus's size. Oracle replays fingerprints and the split for
    * both sides relationally (m04's pipeline). */
  def m07MediaIncremental(s: SparkSession, d: String): DataFrame = {
    val (bandT, metaT) = phashTables(d)
    def token(): Option[String] =
      if (!s.catalog.tableExists(metaT)) None
      else s.table(metaT).collect().headOption.map(_.getString(0))
    if (!token().contains(
        PHASH_STORE_VER + ScaleOps.corpusToken(s, d, "documents.parquet")))
      buildPhashStore(s, d)
    bandRows(splitFp(s, d, newSide = true)).as("n")
      .join(s.table(bandT).as("o"), col("n.bandv") === col("o.bandv"))
      .select(col("n.doc_id").as("da"), col("o.doc_id").as("db"),
        col("n.fp").as("fpa"), col("o.fp").as("fpb"))
      .withColumn("hamming", expr("CAST(bit_count(fpa ^ fpb) AS BIGINT)"))
      .filter(col("hamming") <= DedupOps.HAMMING_T)
      .distinct()
      .orderBy(col("da"), col("db"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m07_media_incremental" -> ((s, d) => m07MediaIncremental(s, d)),
    "m01_media_meta" -> ((s, d) => m01MediaMeta(s, d)),
    "m06_audio_stats" -> ((s, d) => m06AudioStats(s, d)),
    "m02_frame_sample" -> ((s, d) => m02FrameSample(s, d)),
    "m03_media_dedup" -> ((s, d) => m03MediaDedup(s, d)),
    "m04_media_neardup" -> ((s, d) => m04MediaNeardup(s, d)),
    "m05_video_neardup" -> ((s, d) => m05VideoNeardup(s, d)))

  override val oracle: Map[String, String] = Map(
    "m03_media_dedup" ->
      """SELECT md5(text) AS content_key,
        |  'application/octet-stream' AS mime,
        |  MIN(doc_id) AS canonical_id,
        |  CAST(COUNT(*) AS BIGINT) AS dup_ct,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS bytes_total
        |FROM documents GROUP BY 1, 2 ORDER BY canonical_id""".stripMargin,
    "m02_frame_sample" ->
      """SELECT doc_id,
        |  substr(hex(CAST(text AS BLOB)), 1, 16) AS head_hex,
        |  CAST(ceil(octet_length(CAST(text AS BLOB)) / 8.0) AS BIGINT) AS n_samples
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m01_media_meta" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         |  'application/octet-stream' AS mime,
         |  CAST(320 + ${Portable.h60Sql("text || ':w'")} % 1600 AS BIGINT) AS width,
         |  CAST(240 + ${Portable.h60Sql("text || ':h'")} % 840 AS BIGINT) AS height
         |FROM documents ORDER BY doc_id""".stripMargin,
    "m04_media_neardup" -> m04OracleSql,
    "m07_media_incremental" -> m07OracleSql,
    "m05_video_neardup" -> m05OracleSql,
    "m06_audio_stats" -> {
      val band = graft.functions.PcmStats.SILENCE_BAND
      s"""WITH src AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hexs,
         |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
         |     FROM documents WHERE text IS NOT NULL),
         |b AS (SELECT doc_id, n,
         |        list_transform(range(0, n),
         |          i -> CAST(('0x' || substr(hexs, CAST(i * 2 + 1 AS INT), 2)) AS INT)) AS vs
         |      FROM src)
         |SELECT doc_id, n AS n_samples,
         |  CAST(len(list_filter(vs, v -> abs(v - 128) < $band)) AS BIGINT) AS silence_ct,
         |  CAST(len(list_filter(vs, v -> v = 0 OR v = 255)) AS BIGINT) AS clip_ct,
         |  CAST(COALESCE(list_max(list_transform(vs, v -> abs(v - 128))), 0) AS BIGINT) AS peak,
         |  CAST(COALESCE(list_sum(list_transform(vs,
         |    v -> CAST((v - 128) * (v - 128) AS BIGINT))), 0) AS BIGINT) AS energy,
         |  CASE WHEN n > 0
         |       THEN CAST(len(list_filter(vs, v -> abs(v - 128) < $band)) AS DOUBLE)
         |            / CAST(n AS DOUBLE)
         |       ELSE 0.0 END AS silence_ratio
         |FROM b ORDER BY doc_id""".stripMargin
    })

  /** DuckDB twin of [[m04MediaNeardup]]: same hex slicing, the same
    * h60 cell hashes, the same MSB-first bit fold, then c03's chunk
    * blocking and bit_count verify replayed relationally. */
  /** src→cw→cells→fp: the whole-asset perceptual-hash pipeline as
    * CTEs — shared by the m04 and m07 oracles. */
  private def phashFpCtes: String =
    s"""src AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hexs
       |             FROM documents WHERE text IS NOT NULL),
       |cw AS (SELECT doc_id, hexs,
       |         greatest(length(hexs) // $PH_CELLS, 1) AS w FROM src),
       |cells AS (SELECT doc_id, list_transform(range(0, $PH_CELLS),
       |            k -> ${Portable.h60Sql(s"substr(hexs, k * w + 1, w)")}) AS cs
       |          FROM cw),
       |fp AS (SELECT doc_id, list_reduce(
       |         list_reverse(list_transform(range(1, $PH_CELLS),
       |           i -> CAST(CASE WHEN cs[i] < cs[i + 1] THEN 1 ELSE 0 END
       |                     AS BIGINT))),
       |         (acc, x) -> acc * 2 + x) AS fp
       |       FROM cells)""".stripMargin

  private def chunkRowsSql(from: String): String =
    (0 until DedupOps.CHUNKS).map(c =>
      s"SELECT doc_id, fp, $c AS chunk, (fp >> ${c * DedupOps.CHUNK_BITS}) & ${(1 << DedupOps.CHUNK_BITS) - 1} AS cv FROM $from")
      .mkString("\n       UNION ALL ")

  private def m04OracleSql: String =
    s"""WITH $phashFpCtes,
       |chunks AS (${chunkRowsSql("fp")}),
       |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db,
       |                x.fp AS fpa, y.fp AS fpb
       |         FROM chunks x JOIN chunks y
       |           ON x.chunk = y.chunk AND x.cv = y.cv AND x.doc_id < y.doc_id)
       |SELECT da, db, fpa, fpb,
       |       CAST(bit_count(xor(fpa, fpb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(fpa, fpb)) <= ${DedupOps.HAMMING_T}
       |ORDER BY da, db""".stripMargin

  /** DuckDB twin of [[m07MediaIncremental]]: the same fp pipeline,
    * sides split by the c13 convention, batch × store chunk join. */
  private def m07OracleSql: String = {
    val newPred =
      s"${Portable.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 >= 80"
    s"""WITH $phashFpCtes,
       |newfp AS (SELECT doc_id, fp FROM fp WHERE $newPred),
       |oldfp AS (SELECT doc_id, fp FROM fp WHERE NOT ($newPred)),
       |nb AS (${chunkRowsSql("newfp")}),
       |ob AS (${chunkRowsSql("oldfp")})
       |SELECT DISTINCT n.doc_id AS da, o.doc_id AS db,
       |       n.fp AS fpa, o.fp AS fpb,
       |       CAST(bit_count(xor(n.fp, o.fp)) AS BIGINT) AS hamming
       |FROM nb n JOIN ob o ON n.chunk = o.chunk AND n.cv = o.cv
       |WHERE bit_count(xor(n.fp, o.fp)) <= ${DedupOps.HAMMING_T}
       |ORDER BY da, db""".stripMargin
  }

  /** DuckDB twin of [[m05VideoNeardup]]: the same byte-equal frame
    * slicing replayed on the hex string (frame j's bytes
    * [j·fb+1, fb] are hex chars [j·2fb+1, 2fb]), m04's cell/bit
    * pipeline per frame, c03's chunk blocking over (doc, frame)
    * ids, then the frame-slot vote. */
  private def m05OracleSql: String = {
    val chunkRows = (0 until DedupOps.CHUNKS).map(c =>
      s"SELECT fid, fp, $c AS chunk, (fp >> ${c * DedupOps.CHUNK_BITS}) & ${(1 << DedupOps.CHUNK_BITS) - 1} AS cv FROM fp")
      .mkString("\n       UNION ALL ")
    s"""WITH src AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hexs
       |             FROM documents WHERE text IS NOT NULL),
       |fr AS (SELECT doc_id, j, substr(hexs, j * fb * 2 + 1, fb * 2) AS fhex
       |       FROM (SELECT doc_id, hexs,
       |               greatest((length(hexs) // 2) // $FRAMES, 1) AS fb
       |             FROM src)
       |       CROSS JOIN (SELECT unnest(range(0, $FRAMES)) AS j)),
       |frn AS (SELECT doc_id, j, fhex,
       |          greatest(length(fhex) // $PH_CELLS, 1) AS w
       |        FROM fr WHERE length(fhex) > 0),
       |cells AS (SELECT doc_id, j, list_transform(range(0, $PH_CELLS),
       |            k -> ${Portable.h60Sql(s"substr(fhex, k * w + 1, w)")}) AS cs
       |          FROM frn),
       |fp AS (SELECT doc_id * $FRAMES + j AS fid, list_reduce(
       |         list_reverse(list_transform(range(1, $PH_CELLS),
       |           i -> CAST(CASE WHEN cs[i] < cs[i + 1] THEN 1 ELSE 0 END
       |                     AS BIGINT))),
       |         (acc, x) -> acc * 2 + x) AS fp
       |       FROM cells),
       |chunks AS ($chunkRows),
       |cand AS (SELECT DISTINCT x.fid AS fa, y.fid AS fbid,
       |                x.fp AS fpa, y.fp AS fpb
       |         FROM chunks x JOIN chunks y
       |           ON x.chunk = y.chunk AND x.cv = y.cv AND x.fid < y.fid),
       |hit AS (SELECT fa // $FRAMES AS da, fa % $FRAMES AS fra,
       |               fbid // $FRAMES AS db
       |        FROM cand
       |        WHERE bit_count(xor(fpa, fpb)) <= $FRAME_HAMMING_T
       |          AND fa // $FRAMES < fbid // $FRAMES)
       |SELECT da, db, CAST(count(DISTINCT fra) AS BIGINT) AS n_frames
       |FROM hit GROUP BY da, db HAVING count(DISTINCT fra) >= $VOTES
       |ORDER BY da, db""".stripMargin
  }
}
