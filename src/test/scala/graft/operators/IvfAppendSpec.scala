package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, max}

/** Incremental IVF maintenance: a batch appended under FROZEN
  * centroids lands in exactly the cells an independent argmax
  * assigns, is immediately visible to the persisted read path, and
  * never causes a base-corpus re-scan. The fixture index is
  * restored (retrained base-only) afterwards so the shared
  * warehouse stays canonical for every other suite and run. */
class IvfAppendSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("frozen-centroid append: assignment parity, read visibility, isolation") {
    VectorOps.buildIvfIndex(spark, sf) // known-clean base index
    try {
      val (idxT, centT) = VectorOps.ivfTables(sf)
      val base = spark.table(idxT).count()
      val cents = spark.table(centT).collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
      val anchors = VectorOps.anchorVectors(spark, sf, 2)
      val maxId = spark.table(idxT).agg(max(col("vec_id")))
        .collect()(0).getLong(0)
      val batch = Seq((maxId + 1, anchors(0)._2), (maxId + 2, anchors(1)._2))
        .toDF("vec_id", "embedding")
      assert(VectorOps.appendIvfIndex(spark, sf, batch) === 2L)
      assert(spark.table(idxT).count() === base + 2)

      def quant(v: Seq[Float]): Seq[Long] =
        v.map(x => math.floor(x.toDouble * VectorOps.KM_Q).toLong)
      def argmaxCell(q: Seq[Long]): Int = cents.map { case (cid, qc) =>
        (-q.zip(qc).map { case (a, b) => a * b }.sum, cid) }.min._2
      val got = spark.table(idxT).filter(col("vec_id") > maxId)
        .select(col("vec_id"), col("cid"))
        .as[(Long, Int)].collect().toMap
      assert(got(maxId + 1) === argmaxCell(quant(anchors(0)._2)))
      assert(got(maxId + 2) === argmaxCell(quant(anchors(1)._2)))

      // the copied anchor is a top hit for its own query — the read
      // path sees appended vectors with no rebuild (score = the
      // anchor's exact integer self-dot)
      val q0 = quant(anchors(0)._2)
      val self = q0.map(x => x * x).sum
      val res = VectorOps.c07cAnnIvfPersisted(spark, sf)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(res.exists(r => r._1 == 0L && r._3 == maxId + 1 && r._4 == self))

      // appending without a built index is refused, never mis-indexed
      val err = intercept[IllegalArgumentException] {
        VectorOps.appendIvfIndex(spark, "/root/testdata/no_such_dir", batch)
      }
      assert(err.getMessage.contains("IVF"))
    } finally VectorOps.buildIvfIndex(spark, sf) // restore base-only state
  }
}
