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
}
