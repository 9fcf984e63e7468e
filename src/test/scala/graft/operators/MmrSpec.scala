package graft.operators

import graft.{SparkSpec, Tables}

/** c40: the distributed MMR selection must replay an INDEPENDENT
  * in-memory greedy reference exactly — same shortlist, same picks,
  * same scores (the dots share Portable's pinned fold order, so
  * doubles are bit-identical). */
class MmrSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val NQ = 20
  private val SHORT = 16
  private val K = 5

  private def dot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0)((acc, t) => acc + t._1.toDouble * t._2.toDouble)

  /** Driver-side greedy MMR from the raw embeddings table. */
  private def reference(): Seq[(Long, Long, Long, Double)] = {
    val all = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val queries = all.filter(_._1 < NQ).sortBy(_._1)
    queries.flatMap { case (qid, qv) =>
      val short = all.filter(_._1 != qid)
        .map { case (nid, v) => (nid, dot(v, qv), v) }
        .sortBy { case (nid, sc, _) => (-sc, nid) }
        .take(SHORT)
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Seq[Float])]
      (1 to K).foreach { _ =>
        val pick = short.filterNot(c => sel.exists(_._1 == c._1))
          .map { case (nid, sc, v) =>
            val pen = if (sel.isEmpty) 0.0 else sel.map(s => dot(v, s._3)).max
            val mmr = if (sel.isEmpty) sc else 7.0 * sc - 3.0 * pen
            (nid, sc, v, mmr)
          }
          .sortBy { case (nid, _, _, mmr) => (-mmr, nid) }
          .head
        sel += ((pick._1, pick._2, pick._3))
      }
      sel.zipWithIndex.map { case ((nid, sc, _), i) =>
        (qid, (i + 1).toLong, nid, sc)
      }
    }
  }

  test("c40 equals the in-memory greedy MMR, bit-for-bit") {
    val got = VectorOps.c40MmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === reference())
  }

  test("diversification departs from plain top-k for at least one query") {
    val mmr = VectorOps.c40MmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val topk = VectorOps.c06AnnBrute(spark, sf)
      .filter(org.apache.spark.sql.functions.col("rank") <= K).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(mmr !== topk, "MMR returned exactly the undiversified top-k")
  }
}
