package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** c38 per-suite decontamination vs c20's merged report: the suite
  * dimension must refine c20, never disagree with it — a doc's
  * per-suite method flags union exactly to its merged flags.
  */
class MultiSuiteDeconSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("suite flags union to c20's merged flags, doc for doc") {
    val merged = DedupOps.c20DeconConsensus(spark, sf)
      .select($"doc_id", $"methods").as[(Long, String)].collect().toMap
    val perSuite = DedupOps.c38MultiSuiteDecon(spark, sf)
      .select($"doc_id", $"suite", $"methods")
      .as[(Long, String, String)].collect().toSeq
    assert(perSuite.nonEmpty)
    // suites are the fixture's three ids only
    assert(perSuite.map(_._2).toSet.subsetOf(Set("suite0", "suite1", "suite2")))
    // union over suites == the merged detector verdicts
    val unioned = perSuite.groupBy(_._1).map { case (doc, rows) =>
      doc -> rows.flatMap(_._3.split(",")).distinct.sorted.mkString(",")
    }
    assert(unioned.keySet === merged.keySet)
    unioned.foreach { case (doc, methods) =>
      assert(methods === merged(doc), s"doc $doc methods diverge")
    }
  }
}
