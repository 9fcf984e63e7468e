package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t33 distributed batch-perceptron training pinned against an
  * independent in-memory Scala implementation (the BpeLearnSpec
  * precedent): same hashed features, same labels, same update rule —
  * the distributed loop must land on the identical weight vector.
  * Labels come from t19's rule cascade, itself oracle-gated.
  */
class ClassifierTrainSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val B = 256
  private val R = 6
  private val K = 24L

  /** Portable 60-bit hash: first 15 md5 hex digits (Portable.h60). */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private def fixture: (Map[Long, Map[Int, Long]], Map[Long, Long]) = {
    val docs = graft.Tables.documents(spark, sf)
    val labels = TextOps.t19RuleFilterOf(docs)
      .select($"doc_id", $"keep").as[(Long, Long)].collect().toMap
    val feats = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val toks = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
        id -> toks.groupBy(t => (h60("clfb:" + t) % B).toInt)
          .map { case (b, ts) => b -> ts.length.toLong }
      }.toMap
    (feats, labels)
  }

  /** Reference pocket batch perceptron (plain Scala, no Spark):
    * damped batch updates Δw/K (toward zero), keep the round with
    * the best train accuracy, earliest round wins ties. */
  private def refTrain(feats: Map[Long, Map[Int, Long]],
      labels: Map[Long, Long]): Array[Long] = {
    // accuracy over FEATURE-BEARING docs only (zero-token docs have
    // no rows in the distributed feature table, so both sides skip
    // them) — the pocket choice must agree exactly
    def accOf(w: Array[Long]): Long =
      feats.count { case (id, fx) =>
        fx.nonEmpty && {
          val m = fx.iterator.map { case (b, x) => w(b) * x }.sum
          (if (m >= 0) 1L else -1L) == 2 * labels(id) - 1
        }
      }.toLong
    val w = Array.fill(B)(0L)
    var bestW = w.clone()
    var bestAcc = -1L
    for (_ <- 1 to R) {
      val delta = Array.fill(B)(0L)
      feats.foreach { case (id, fx) =>
        val y = 2 * labels(id) - 1
        val margin = fx.iterator.map { case (b, x) => w(b) * x }.sum
        if (y * margin <= 0) fx.foreach { case (b, x) => delta(b) += y * x }
      }
      for (b <- 0 until B) w(b) += delta(b) / K
      val acc = accOf(w)
      if (acc > bestAcc) { bestAcc = acc; bestW = w.clone() }
    }
    bestW
  }

  test("distributed training equals the in-memory reference exactly") {
    val (feats, labels) = fixture
    val want = refTrain(feats, labels)
    val got = TextOps.clfTrain(graft.Tables.documents(spark, sf))
    assert(got.toSeq === want.toSeq)
    assert(got.exists(_ != 0L), "training learned nothing")
  }

  test("the learned gate beats the majority-class baseline on its train set") {
    val (feats, labels) = fixture
    val w = refTrain(feats, labels)
    val correct = feats.count { case (id, fx) =>
      val margin = fx.iterator.map { case (b, x) => w(b) * x }.sum
      (if (margin >= 0) 1L else 0L) == labels(id)
    }
    val majority = math.max(labels.values.count(_ == 1L),
      labels.values.count(_ == 0L))
    info(s"train accuracy ${correct}/${feats.size}, majority $majority")
    assert(correct > majority,
      s"accuracy $correct/${feats.size} does not beat majority $majority")
  }

  test("t33b applies the persisted model; a drifted token retrains") {
    val metaTable = s"graft_clf_meta_${Integer.toHexString(sf.hashCode)}"
    val first = TextOps.t33bClassifierApply(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // margins replay the reference weights doc-for-doc
    val (feats, labels) = fixture
    val w = refTrain(feats, labels)
    first.foreach { case (id, _, margin, kept) =>
      val want = feats(id).iterator.map { case (b, x) => w(b) * x }.sum
      assert(margin === want, s"doc $id margin")
      assert(kept === (if (want >= 0) 1L else 0L))
    }
    val tok1 = spark.table(metaTable).as[String].collect().head
    TextOps.t33bClassifierApply(spark, sf).collect() // no rebuild
    assert(spark.table(metaTable).as[String].collect().head === tok1)
    Seq("stale").toDF("token").write.mode("overwrite")
      .format("parquet").saveAsTable(metaTable)
    val again = TextOps.t33bClassifierApply(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(again === first)
    assert(spark.table(metaTable).as[String].collect().head !== "stale")
  }
}
