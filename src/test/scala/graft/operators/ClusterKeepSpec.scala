package graft.operators

import graft.SparkSpec

/** c32 cluster-representative selection: totality over the corpus,
  * exactly one survivor per cluster, and the survivor is the
  * max-quality member (doc_id tie-break) — cross-checked in plain
  * Scala against the independently-computed c10 labels and t02
  * quality scores.
  */
class ClusterKeepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("one kept per cluster, and it is the max-quality member") {
    val keep = DedupOps.c32ClusterKeep(spark, sf)
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(keep.size.toLong === nDocs) // total: every document decided

    val byCluster = keep.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      val keptRows = members.filter(_._3 == "kept")
      assert(keptRows.size === 1, s"cluster $cid: ${keptRows.size} kept")
      val kept = keptRows.head
      // the winner by (quality desc, doc_id asc) among the members
      val want = members.minBy { case (doc, _, _, _, q) => (-q, doc) }._1
      assert(kept._1 === want, s"cluster $cid kept ${kept._1}, want $want")
      // every member points at the same survivor
      assert(members.forall(_._4 == kept._1), s"cluster $cid kept_doc_id mismatch")
    }

    // clustered docs carry c10's labels verbatim; all others are
    // self-labeled singletons
    val c10 = DedupOps.c10DedupCluster(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (doc, cid, _) => doc -> cid }.toMap
    keep.foreach { case (doc, cid, _, _, _) =>
      assert(cid === c10.getOrElse(doc, doc), s"doc $doc label mismatch")
    }

    // quality column is t02's score unchanged
    val q = TextOps.t02Quality(spark, sf)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    keep.foreach { case (doc, _, _, _, quality) =>
      assert(quality === q(doc), s"doc $doc quality mismatch")
    }
  }

  test("deep-chain graph: one survivor, max quality, round-bounded path") {
    // a 1,000-doc dup chain (diameter 999) + 50 singletons through
    // c32's factored core — the star components keep this bounded
    // where min-label propagation would need ~999 rounds
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("da", "db")
    val quality = (0L until 1050L).map(i => (i, (i % 97).toDouble)).toDF("doc_id", "quality")
    val keep = DedupOps.clusterKeep(quality, chain)
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    assert(keep.size === 1050)
    val members = keep.filter(_._1 < 1000L)
    // best quality in the chain: max (i % 97) over 0..999 is 96,
    // smallest doc_id achieving it is 96
    assert(members.count(_._3 == "kept") === 1)
    assert(members.forall(r => r._2 === 0L && r._4 === 96L))
    assert(members.find(_._3 == "kept").get._1 === 96L)
    val singles = keep.filter(_._1 >= 1000L)
    assert(singles.forall(r => r._3 == "kept" && r._4 == r._1 && r._2 == r._1))
  }
}
