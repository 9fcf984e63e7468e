package graft.operators

import graft.SparkSpec

/** c44 — LSH quality audit: the ground-truth side must be COMPLETE
  * (every pair with exact 3-shingle Jaccard ≥ 0.8, pinned against an
  * independent in-memory brute force over all pairs), and the
  * recall/binning arithmetic integer-exact. */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Brute-force truth: every doc pair with ≥3 tokens whose DISTINCT
    * 3-shingle sets have Jaccard ≥ 0.8 — no prefix filter, no
    * banding, no hashing; the independent referee for the engine's
    * prefix-filtered truth side. */
  private lazy val bruteTruth: Map[(Long, Long), (Int, Int, Int)] = {
    val shs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val t = text.split("\\s+")
        id -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
    (for {
      i <- shs.indices.iterator
      j <- (i + 1) until shs.length
      (da, sa) = shs(i)
      (db, sb) = shs(j)
      inter = (sa intersect sb).size
      if inter * 5 >= (sa.size + sb.size - inter) * 4 // jac >= 0.8, exact
    } yield (da, db) -> (sa.size, sb.size, inter)).toMap
  }

  test("the truth side is complete and exact against the brute force") {
    val out = DedupOps.c44LshRecall(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2).sum === bruteTruth.size.toLong)
    // per-bin truth counts agree too (bin = (20*inter) div union)
    val bruteBins = bruteTruth.values
      .groupBy { case (na, nb, inter) => 20L * inter / (na + nb - inter) }
      .view.mapValues(_.size.toLong).toMap
    assert(out.map(r => r._1 -> r._2).toMap === bruteBins)
  }

  test("c45: identical pairs are caught by every layout; (4,4) equals c44") {
    val out = DedupOps.c45LshTradeoff(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val layouts = out.map(r => (r._1, r._2)).distinct.sorted
    assert(layouts === Seq((2L, 8L), (4L, 4L), (8L, 2L)))
    // same shared truth on every layout's rows
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).distinct.size === 1)
    }
    // bin 20 (jac = 1.0): identical minima ⇒ every band matches ⇒
    // every layout must reach full recall
    out.filter(_._3 == 20L).foreach { case (_, _, _, nTrue, nCaught, recall) =>
      assert(nCaught === nTrue)
      assert(recall === 1000L)
    }
    // the (4,4) slice IS c44's report
    val c44 = DedupOps.c44LshRecall(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.filter(r => r._1 == 4L)
      .map(r => (r._3, r._4, r._5, r._6)).sortBy(_._1) === c44.sortBy(_._1))
  }

  test("bins and recall arithmetic are range-sound") {
    val out = DedupOps.c44LshRecall(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (bin, nTrue, nCaught, recall) =>
      assert(bin >= 16L && bin <= 20L) // jac ≥ 0.8 ⇒ floor(20·jac) ≥ 16
      assert(nCaught >= 0L && nCaught <= nTrue)
      assert(recall === 1000L * nCaught / nTrue)
    }
  }
}
