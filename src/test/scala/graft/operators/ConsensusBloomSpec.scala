package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** c14 consensus membership against the three detectors it composes,
  * and c09b's exactness contract: the Bloom prefilter must change the
  * plan, never the rows. */
class ConsensusBloomSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("c14 keeps exactly the pairs two or more detectors flag") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("da", "db").as[(Long, Long)].collect().toSet
    val mh = pairs(DedupOps.c02MinhashLsh(spark, sf))
    val sh = pairs(DedupOps.c03Simhash(spark, sf))
    val ng = pairs(DedupOps.c04NgramJaccard(spark, sf))
    val got = DedupOps.c14DedupConsensus(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    val expected = (mh ++ sh ++ ng).filter(p =>
      Seq(mh(p), sh(p), ng(p)).count(identity) >= 2)
    assert(got.map(r => (r._1, r._2)).toSet === expected)
    got.foreach { case (da, db, n, methods) =>
      val want = Seq("minhash" -> mh, "ngram" -> ng, "simhash" -> sh)
        .collect { case (m, s) if s((da, db)) => m }
      assert(n === want.length, s"n_methods for ($da,$db)")
      assert(methods === want.sorted.mkString(","), s"methods for ($da,$db)")
    }
  }

  test("c09b bloom-prefiltered result is row-identical to c09") {
    val a = DedupOps.c09Decontaminate(spark, sf).collect().toSeq
    val b = DedupOps.c09bDecontaminateBloom(spark, sf).collect().toSeq
    assert(b === a)
    assert(a.nonEmpty) // the fixture must actually exercise overlap
  }

  test("graft_bloom_agg/might_contain: no false negatives, bounded false positives") {
    val members = (1L to 2000L).map(_ * 7919L)
    val bloom = members.toDF("v")
      .agg(call_function("graft_bloom_agg", col("v"), lit(4096L), lit(1L << 16)))
      .head.getAs[Array[Byte]](0)
    val probed = (1L to 4000L).map(_ * 7919L).toDF("v")
      .select(col("v"), call_function("graft_might_contain", lit(bloom), col("v")).as("mc"))
      .as[(Long, Boolean)].collect().toMap
    members.foreach(m => assert(probed(m), s"false negative for $m"))
    val fp = (2001L to 4000L).map(_ * 7919L).count(probed(_))
    assert(fp < 200, s"false-positive count $fp out of 2000 non-members")
  }
}
