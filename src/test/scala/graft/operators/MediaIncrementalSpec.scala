package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** m07: the persisted-phash-store incremental media dedup — batch
  * probes the store, the store is reused while the corpus token
  * matches, and the answer equals the direct (storeless) compute. */
class MediaIncrementalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Direct recompute: new-batch fingerprints × old-corpus
    * fingerprints through the same chunk pigeonhole, no store. */
  private def direct(): Seq[(Long, Long, Long, Long, Long)] = {
    def fp(newSide: Boolean) = MediaOps.attachMedia(spark, sf).toDF()
      .where(col("media").isNotNull &&
        (if (newSide) DedupOps.newSplitFlag else !DedupOps.newSplitFlag))
      .select(col("doc_id"),
        call_function("graft_phash60", col("media")).as("fp"))
      .where(col("fp").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val old = fp(newSide = false)
    def chunks(v: Long) = (0 until DedupOps.CHUNKS)
      .map(c => (c, (v >> (c * DedupOps.CHUNK_BITS)) & ((1 << DedupOps.CHUNK_BITS) - 1)))
    (for {
      (na, fa) <- fp(newSide = true)
      (ob, fb) <- old
      if chunks(fa).intersect(chunks(fb)).nonEmpty
      h = java.lang.Long.bitCount(fa ^ fb).toLong
      if h <= DedupOps.HAMMING_T
    } yield (na, ob, fa, fb, h)).sortBy(t => (t._1, t._2))
  }

  test("m07 equals the storeless batch-vs-corpus compute") {
    val got = MediaOps.m07MediaIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === direct())
    assert(got.nonEmpty) // fixture must actually exercise the join
  }

  test("the store is reused while the corpus token matches") {
    MediaOps.m07MediaIncremental(spark, sf).collect()
    val tag = Integer.toHexString(sf.hashCode)
    val before = spark.table(s"graft_phash_band_$tag").inputFiles.toSeq.sorted
    MediaOps.m07MediaIncremental(spark, sf).collect()
    val after = spark.table(s"graft_phash_band_$tag").inputFiles.toSeq.sorted
    assert(before === after, "store was rebuilt despite a matching token")
  }
}
