package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.Portable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c28 hybrid retrieval: the fused ranking is pinned against an
  * independent recomputation of both shortlists and the RRF formula,
  * plus shape/determinism invariants. */
class HybridRrfSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Independent (qid, doc_id) -> rank maps for both retrievers,
    * built from the public faces (c24's scorer re-ranked here, and a
    * from-scratch dense scan), NOT from c28's internals. */
  private def shortlists(): (Map[(String, Long), Long], Map[(String, Long), Long]) = {
    val text = SearchOps.bm25(spark, Tables.documents(spark, sf),
        SearchOps.QUERIES, topk = SearchOps.RRF_SHORT)
      .select("qid", "doc_id", "rk").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val emb = Tables.embeddings(spark, sf)
    val qv = emb.filter(col("vec_id") < SearchOps.QUERIES.length)
      .select(col("vec_id").as("qv_id"), col("embedding").as("qemb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val dense = emb.crossJoin(qv)
      .select(concat(lit("q"), (col("qv_id") + 1).cast("string")).as("qid"),
        col("vec_id").as("doc_id"),
        Portable.dot(col("embedding"), col("qemb")).as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= SearchOps.RRF_SHORT)
      .select("qid", "doc_id", "rk").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    (text, dense)
  }

  test("c28 equals the RRF of independently recomputed shortlists") {
    val (text, dense) = shortlists()
    def rrf(qid: String, doc: Long): Long = {
      def part(m: Map[(String, Long), Long]): Long =
        m.get((qid, doc)).map(r => SearchOps.RRF_Q / (SearchOps.RRF_K + r)).getOrElse(0L)
      part(text) + part(dense)
    }
    // expected top-10 per query from the union of shortlist members
    val qids = SearchOps.QUERIES.map(_._1)
    val expected = qids.flatMap { qid =>
      val members = (text.keySet ++ dense.keySet).collect { case (q, d) if q == qid => d }
      members.toSeq.map(d => (qid, d, rrf(qid, d)))
        .sortBy { case (_, d, s) => (-s, d) }
        .take(10).zipWithIndex
        .map { case ((q, d, s), i) => (q, i + 1L, d, s) }
    }.toSet
    val got = SearchOps.c28HybridRrf(spark, sf)
      .select("qid", "rank", "doc_id", "rrf_score")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("c28 shape: contiguous ranks, both-retriever docs dominate") {
    val rows = SearchOps.c28HybridRrf(spark, sf)
      .select("qid", "rank", "rrf_score", "text_rank", "vec_rank")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect().toSeq
    rows.groupBy(_._1).foreach { case (_, qr) =>
      assert(qr.map(_._2).sorted === (1L to qr.size.toLong))
      // scores non-increasing in rank
      val byRank = qr.sortBy(_._2).map(_._3)
      assert(byRank === byRank.sorted(Ordering[Long].reverse))
    }
    // every emitted row carries at least one source rank, and the
    // fused score is exactly the RRF of the ranks it carries
    rows.foreach { case (_, _, s, trk, vrk) =>
      assert(trk.nonEmpty || vrk.nonEmpty)
      val expect = trk.map(r => SearchOps.RRF_Q / (SearchOps.RRF_K + r)).getOrElse(0L) +
        vrk.map(r => SearchOps.RRF_Q / (SearchOps.RRF_K + r)).getOrElse(0L)
      assert(s === expect)
    }
  }
}
