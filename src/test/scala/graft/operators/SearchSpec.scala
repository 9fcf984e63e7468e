package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** c24 BM25 search pinned two ways: a hand-computed 4-document
  * fixture (every fixed-point factor recomputed independently in
  * Scala) and ranking/shape invariants on the real corpus. c25
  * cluster-balanced sampling pinned against a brute-force per-cell
  * recomputation of centrality ranks. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("c24 fixture: scores match an independent BM25 computation") {
    // 4 docs, known token counts. N = 4, L = 10.
    val docs = Seq(
      (1L, "apple banana apple"),       // dl 3, tf(apple)=2
      (2L, "apple"),                    // dl 1, tf(apple)=1
      (3L, "banana cherry"),            // dl 2
      (4L, "cherry cherry date date")   // dl 4
    ).toDF("doc_id", "text")
    val got = SearchOps.bm25(spark, docs,
        Seq("qa" -> Seq("apple", "cherry")), topk = 10)
      .select("qid", "rk", "doc_id", "score")
      .as[(String, Long, Long, Long)].collect().toSeq
    // Independent recomputation of the exact integer formula.
    val n = 4L; val l = 10L
    def term(tf: Long, df: Long, dl: Long): Long =
      ((2 * n - 2 * df + 1) * SearchOps.Q1 / (2 * df + 1)) *
        ((22 * l * tf * SearchOps.Q2) /
          (10 * l * tf + 3 * l + 9 * dl * n))
    val expected = Map(
      1L -> term(2, 2, 3),                  // apple ×2
      2L -> term(1, 2, 1),                  // apple ×1, shortest doc
      3L -> term(1, 2, 2),                  // cherry ×1
      4L -> term(2, 2, 4))                  // cherry ×2
    assert(got.map(r => r._3 -> r._4).toMap === expected)
    // ranks follow (score desc, doc_id asc)
    val byRank = got.sortBy(_._2).map(_._4)
    assert(byRank === byRank.sorted(Ordering[Long].reverse))
  }

  test("c24 corpus invariants: contiguous ranks, ordered scores, determinism") {
    val rows = SearchOps.c24Bm25TopK(spark, sf)
      .select("qid", "rk", "doc_id", "score")
      .as[(String, Long, Long, Long)].collect().toSeq
    val qids = rows.map(_._1).distinct.sorted
    assert(qids === Seq("q1", "q2", "q3", "q4"))
    qids.foreach { q =>
      val rs = rows.filter(_._1 == q).sortBy(_._2)
      assert(rs.map(_._2) === (1L to rs.size.toLong))
      val scores = rs.map(_._4)
      assert(scores === scores.sorted(Ordering[Long].reverse), q)
      assert(scores.forall(_ > 0), q)
    }
    val again = SearchOps.c24Bm25TopK(spark, sf)
      .select("qid", "rk", "doc_id", "score")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(again.toSet === rows.toSet)
  }

  test("c24: a query with an out-of-vocabulary term equals the query without it") {
    val docs = graft.Tables.documents(spark, sf)
    val withOov = SearchOps.bm25(spark, docs,
        Seq("qx" -> Seq("stream", "batch", "zzzunseen")), topk = 10)
      .select("rk", "doc_id", "score").as[(Long, Long, Long)].collect().toSeq
    val without = SearchOps.bm25(spark, docs,
        Seq("qx" -> Seq("stream", "batch")), topk = 10)
      .select("rk", "doc_id", "score").as[(Long, Long, Long)].collect().toSeq
    assert(withOov.sortBy(_._1) === without.sortBy(_._1))
  }

  test("c25 per-cell quotas and centrality ranks match brute force") {
    val got = VectorOps.c25ClusterSample(spark, sf)
      .select("cid", "rk", "vec_id", "cdot")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (cid, rs) =>
      assert(rs.size <= 8, s"cell $cid over quota")
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to rs.size.toLong), s"cell $cid ranks")
      val dots = sorted.map(_._4)
      assert(dots === dots.sorted(Ordering[Long].reverse), s"cell $cid order")
    }
    // Each selected member must genuinely be among its cell's top-8
    // by dot: recheck against the full per-cell membership (the c12
    // oracle machinery guarantees assignment; here we pin selection).
    val full = VectorOps.c25MembershipForSpec(spark, sf)
      .as[(Int, Long, Long)].collect().toSeq
    full.groupBy(_._1).foreach { case (cid, members) =>
      val want = members.sortBy(m => (-m._3, m._2)).take(8)
        .zipWithIndex.map { case ((c, v, dt), i) => (c, i + 1L, v, dt) }
      val have = got.filter(_._1 == cid).sortBy(_._2)
      assert(have === want, s"cell $cid selection")
    }
  }
}
