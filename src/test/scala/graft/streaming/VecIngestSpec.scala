package graft.streaming

import graft.SparkSpec
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Dense standing-query ingest scorer: exact parity with batch dot
  * products, and threshold gating. */
class VecIngestSpec extends SparkSpec with StreamRunner {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def queryVecs(n: Int): Seq[(String, Seq[Float])] =
    graft.Tables.embeddings(spark, sf).filter(col("vec_id") < n)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (s"q${r.getLong(0) + 1}", r.getSeq[Float](1)))
      .sortBy(_._1).toSeq

  test("stream scores == batch dot products, threshold gates") {
    val qv = queryVecs(3)
    val rows = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[VecRow].collect().toSeq

    val streamed = runStream(Seq(rows.take(100), rows.drop(100))) {
      ds: org.apache.spark.sql.Dataset[VecRow] =>
        Jobs.annScoreIngest(spark, ds.toDF(), qv, minScore = 0.2)
    }.map(h => (h.vec_id, h.qid) -> h.score).toMap

    // batch recomputation from the same public face
    val emb = graft.Tables.embeddings(spark, sf)
    val batch = qv.flatMap { case (qid, v) =>
      emb.select(col("vec_id"),
          Portable.dot(col("embedding"), typedLit(v)).as("score"))
        .filter(col("score") >= 0.2)
        .as[(Long, Double)].collect()
        .map { case (id, s) => (id, qid) -> s }
    }.toMap

    assert(streamed.keySet === batch.keySet, "gated hit sets diverge")
    streamed.foreach { case (k, s) => assert(s === batch(k), s"hit $k") }
    assert(streamed.nonEmpty, "fixture threshold must admit some hits")
    // every emitted score respects the gate
    streamed.values.foreach(s => assert(s >= 0.2))
  }
}
