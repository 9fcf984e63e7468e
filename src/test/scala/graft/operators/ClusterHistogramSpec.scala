package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** c37 accounting invariants against c10's labels on real data:
  * docs sum to the corpus, dup_mass = docs − families row-wise, and
  * the singleton row closes the books exactly.
  */
class ClusterHistogramSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("histogram sums to the corpus and dup_mass closes the books") {
    val h = DedupOps.c37ClusterHistogram(spark, sf).cache()
    val corpus = graft.Tables.documents(spark, sf).count()
    val sums = h.agg(sum($"docs"), sum($"dup_mass"), sum($"n_clusters"))
      .as[(Long, Long, Long)].collect().head
    assert(sums._1 === corpus)             // every doc counted once
    assert(sums._2 === sums._1 - sums._3)  // removable = docs − families
    // row-wise identities
    assert(h.filter($"docs" =!= $"sz" * $"n_clusters" ||
      $"dup_mass" =!= ($"sz" - 1) * $"n_clusters").count() === 0L)
    // the singleton row equals corpus − labeled docs from c10
    val labeled = DedupOps.c10DedupCluster(spark, sf).count()
    val single = h.filter($"sz" === 1).select($"n_clusters").as[Long]
      .collect().headOption.getOrElse(0L)
    assert(single === corpus - labeled)
    h.unpersist()
  }

  test("deep-chain graph: the production path stays round-bounded and the books close") {
    // a 1,000-doc dup CHAIN (diameter 999 — the topology min-label
    // propagation cannot absorb) inside a 1,200-doc corpus; c37's
    // core runs over the same star-components labels production uses
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("da", "db")
    val labels = DedupOps.connectedComponentsStar(chain)
    val corpus = (0L until 1200L).toDF("doc_id")
    val h = DedupOps.clusterHistogram(labels, corpus)
      .as[(Long, Long, Long, Long)].collect().toList
    // one 1,000-family + 200 singletons; dup_mass = 999
    assert(h === List((1L, 200L, 200L, 0L), (1000L, 1L, 1000L, 999L)))
  }
}
