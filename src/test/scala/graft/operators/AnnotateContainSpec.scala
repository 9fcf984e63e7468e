package graft.operators

import graft.SparkSpec

/** t25 one-pass annotator (consistency with its standalone parents)
  * and c29 asymmetric containment (the quote-in-long-doc case that
  * Jaccard dedup misses by construction). */
class AnnotateContainSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("t25 columns agree with the standalone t01/t02/t08 queries") {
    val ann = TextOps.t25Annotate(spark, sf)
      .select("doc_id", "pred_lang", "quality", "distinct_ratio",
        "top_tok_frac", "dup_bigram_frac")
      .as[(Long, String, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val t01 = TextOps.t01LangId(spark, sf)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    val t02 = TextOps.t02Quality(spark, sf)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    val t08 = TextOps.t08Repetition(spark, sf)
      .select("doc_id", "distinct_ratio", "top_tok_frac", "dup_bigram_frac")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(ann.keySet === t01.keySet)
    ann.foreach { case (id, (_, pl, q, dr, tf, db)) =>
      assert(pl === t01(id), s"pred_lang diverges for $id")
      assert(q === t02(id), s"quality diverges for $id")
      assert((dr, tf, db) === ((t08(id)._2, t08(id)._3, t08(id)._4)),
        s"repetition signals diverge for $id")
    }
  }

  test("c29 catches a short doc quoted inside a long one") {
    val paragraph = (1 to 40).map(i => s"tok$i").mkString(" ")
    val filler = (1 to 400).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"$filler $paragraph"), // long host document
      (2L, paragraph),             // fully contained quote
      (3L, (1 to 60).map(i => s"other$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val got = DedupOps.c29ContainmentOf(docs)
      .select("da", "db", "na", "nb", "inter", "cont_a", "cont_b")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    val pair = got.find(r => r._1 == 1L && r._2 == 2L)
    assert(pair.nonEmpty, "contained quote pair not flagged")
    val (_, _, na, nb, inter, contA, contB) = pair.get
    // the SHORT side is (near-)fully contained; the long side is not
    assert(contB >= 0.5, s"short-side containment $contB below gate")
    assert(contB > contA, "containment must be asymmetric here")
    assert(inter <= math.min(na, nb))
    // Jaccard on the same pair would NOT fire the c02 gate
    val jac = inter.toDouble / (na + nb - inter).toDouble
    assert(jac < 0.8, "fixture must be a case Jaccard dedup misses")
    // the unrelated doc shares nothing
    assert(!got.exists(r => r._1 == 3L || r._2 == 3L))
  }

  test("c30 matrix totals equal the c02 pair count; keys are canonical") {
    val matrix = DedupOps.c30CrossSourceDup(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    val totalPairs = DedupOps.c02MinhashLsh(spark, sf).count()
    assert(matrix.map(_._3).sum === totalPairs,
      "every near-dup pair must land in exactly one matrix cell")
    matrix.foreach { case (a, b, n) =>
      assert(a <= b, s"unordered key not canonical: ($a, $b)")
      assert(n > 0)
    }
  }

  test("c29 determinism and bounds on the real corpus") {
    val a = DedupOps.c29Containment(spark, sf).collect()
    val b = DedupOps.c29Containment(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    a.foreach { r =>
      val (contA, contB) = (r.getDouble(5), r.getDouble(6))
      assert(contA > 0 && contA <= 1.0 && contB > 0 && contB <= 1.0)
      assert(math.max(contA, contB) >= 0.5)
    }
  }
}
