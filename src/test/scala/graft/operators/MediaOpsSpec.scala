package graft.operators

import graft.SparkSpec

/** Multimodal plumbing: binary columns, batched per-partition decode,
  * determinism across partitionings. */
class MediaOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("attachMedia carries binary payload + typed metadata") {
    val rows = MediaOps.attachMedia(spark, sf).limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.media.nonEmpty)
      assert(r.mime == "application/octet-stream")
      assert(r.width >= 320 && r.width < 1920)
      assert(r.height >= 240 && r.height < 1080)
    }
  }

  test("decode batches respect DECODE_BATCH and cover every row") {
    val feats = MediaOps.decodeAll(spark, sf, partitions = 4).collect()
    val n = MediaOps.attachMedia(spark, sf).count()
    assert(feats.length.toLong === n)
    assert(feats.forall(f => f.batch_size > 0 && f.batch_size <= MediaOps.DECODE_BATCH))
    // histogram bins must sum to the payload size — the decoder saw
    // every byte exactly once
    assert(feats.forall(f => f.histogram.sum == f.n_bytes))
  }

  test("decode output is independent of partitioning") {
    def run(p: Int) = MediaOps.decodeAll(spark, sf, partitions = p)
      .collect().map(f => f.doc_id -> (f.n_bytes, f.sample_checksum, f.histogram.toSeq))
      .toMap
    assert(run(2) === run(8))
  }

  test("resize stub: stride tracks target width, output independent of partitioning") {
    val feats = MediaOps.resizeAll(spark, sf, targetW = 256).collect()
    val meta = MediaOps.attachMedia(spark, sf).collect()
      .map(r => r.doc_id -> r).toMap
    assert(feats.length === meta.size)
    feats.foreach { f =>
      val r = meta(f.doc_id)
      val stride = math.max(1, r.width / 256)
      assert(f.stride === stride)
      assert(f.out_w === r.width / stride)
      assert(f.out_h === r.height / stride)
      // strided byte count: ceil(len / stride)
      assert(f.resized_bytes === (r.media.length + stride - 1) / stride)
      // stride 1 resize IS the full-payload checksum walk
      if (stride == 1) assert(f.resized_bytes === r.media.length.toLong)
    }
    val again = MediaOps.resizeAll(spark, sf, targetW = 256, partitions = 7)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.map(f => f.doc_id -> f).toMap === again)
  }

  test("decode/resize stubs survive null payloads (null-text documents)") {
    val rows = Iterator(
      MediaRow(1L, null, "application/octet-stream", 320, 240),
      MediaRow(2L, "abc".getBytes("UTF-8"), "application/octet-stream", 320, 240))
    val feats = MediaOps.decodeStub(rows).toList
    assert(feats.find(_.doc_id == 1L).get.n_bytes === 0L)
    assert(feats.find(_.doc_id == 2L).get.n_bytes === 3L)
    val resized = MediaOps.resizeStub(256)(Iterator(
      MediaRow(1L, null, "application/octet-stream", 512, 240))).toList
    assert(resized.head.resized_bytes === 0L)
  }

  test("m03 groups byte-identical payloads under one content key") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(7L, "same bytes".getBytes("UTF-8"), "image/png", 1, 1),
      MediaRow(3L, "same bytes".getBytes("UTF-8"), "image/png", 2, 2),
      MediaRow(9L, "other".getBytes("UTF-8"), "image/png", 3, 3),
      // same bytes, different mime: a DIFFERENT storage group
      MediaRow(4L, "same bytes".getBytes("UTF-8"), "audio/wav", 4, 4))
    val got = MediaOps.mediaDedup(rows.toDF())
      .select("canonical_id", "dup_ct", "bytes_total")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((3L, 2L, 20L), (4L, 1L, 10L), (9L, 1L, 5L)))
  }

  test("m04 finds every byte-identical payload pair at hamming 0") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val pairs = MediaOps.m04MediaNeardup(spark, sf)
      .select("da", "db", "hamming").as[(Long, Long, Long)].collect().toSeq
    assert(pairs.nonEmpty)
    pairs.foreach { case (da, db, h) =>
      assert(da < db && h >= 0 && h <= 3)
    }
    // exact-dup pairs (same text ⇒ same payload) must all surface
    // with hamming 0 — the pigeonhole completeness floor
    val texts = graft.Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").as[(Long, String)].collect()
    val exactPairs = texts.groupBy(_._2).values.filter(_.size > 1)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield (ids(i), ids(j))
      }.toSet
    val zeroPairs = pairs.collect { case (a, b, 0L) => (a, b) }.toSet
    assert(exactPairs.subsetOf(zeroPairs))
  }

  test("native graft_phash60 equals the staged relational fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col}
    val media = MediaOps.attachMedia(spark, sf).toDF()
    val native = media
      .select(col("doc_id"), call_function("graft_phash60", col("media")))
      .as[(Long, Long)].collect().toMap
    val staged = MediaOps.phashFrameRelational(media)
      .as[(Long, Long)].collect().toMap
    assert(native.nonEmpty && native === staged)
  }

  test("m05: byte-identical videos vote with every frame slot; votes stay in range") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = MediaOps.m05VideoNeardup(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (da, db, n) =>
      assert(da < db && n >= 4 && n <= 8, s"($da, $db, $n)")
    }
    // exact-dup payloads slice into identical frames, so every frame
    // slot matches at hamming 0 — the full 8-vote floor (payloads
    // long enough for 8 non-empty frames, which any fixture text is)
    val texts = graft.Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select("doc_id", "text").as[(Long, String)].collect()
    val exactPairs = texts.filter(_._2.getBytes("UTF-8").length >= 8)
      .groupBy(_._2).values.filter(_.size > 1)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield (ids(i), ids(j))
      }.toSet
    val full = got.collect { case (a, b, 8L) => (a, b) }.toSet
    assert(exactPairs.subsetOf(full),
      s"missing full-vote pairs: ${exactPairs -- full}")
  }
}
