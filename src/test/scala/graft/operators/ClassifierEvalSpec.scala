package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** t40 — held-out classifier evaluation: the confusion cells must
  * partition exactly the held-out stratum, and accuracy must be the
  * integer ratio of the agreeing cells. */
class ClassifierEvalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("confusion cells partition the held-out stratum; accuracy is exact") {
    val out = TextOps.t40ClassifierEval(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    val heldPerLang = TextOps.t34StratifiedSplit(spark, sf)
      .filter(col("split") === "heldout")
      .groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    assert(out.map(_._1).toSet === heldPerLang.keySet)
    out.foreach { case (lang, tp, fp, fn, tn, acc) =>
      assert(tp + fp + fn + tn === heldPerLang(lang))
      assert(acc === 1000L * (tp + tn) / (tp + fp + fn + tn))
      assert(acc >= 0L && acc <= 1000L)
    }
    // the distilled model must beat coin-flip against its teacher
    // overall (it trained to ~high agreement; a collapse here means
    // the weights or the held-out join broke)
    val agree = out.map(r => r._2 + r._5).sum
    val total = out.map(r => r._2 + r._3 + r._4 + r._5).sum
    assert(agree * 2L > total)
  }
}
