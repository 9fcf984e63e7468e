package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** t37 per-source token-budget quota + c43 dedup-adjusted token
  * accounting: budget boundary semantics and the accounting
  * identities against their constituent operators. */
class TokenQuotaEffectiveSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val sfMid = "/root/testdata/sf0.01"

  test("t37 keeps whole docs until the budget binds; crossing doc included") {
    val kept = TextOps.t37TokenQuota(spark, sfMid)
      .as[(String, Long, Long, Long)].collect().toSeq
    val perSourceTotal = Tables.documents(spark, sfMid)
      .select(col("source"),
        coalesce(size(split(col("text"), "\\s+")), lit(0)).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("t"))
      .as[(String, Long)].collect().toMap
    kept.groupBy(_._1).foreach { case (src, rows) =>
      val spent = rows.map(_._4).sum
      // either the source fits entirely, or the kept set crosses the
      // 500-token budget exactly once (last doc included)
      if (spent < 500L) assert(spent === perSourceTotal(src), src)
      else {
        val last = rows.maxBy(_._2)
        assert(last._2 < 500L, src)          // budget unspent before it
        assert(spent - last._4 < 500L, src)  // dropping it goes under
      }
      // every kept doc individually satisfied the before-budget rule
      rows.foreach(r => assert(r._2 < 500L, src))
    }
  }

  test("t37 is deterministic and spends in seeded-hash order") {
    val a = TextOps.t37TokenQuota(spark, sf).collect().toSeq
    val b = TextOps.t37TokenQuota(spark, sf).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("t37's running sum reuses the source partitioning (one keyed exchange)") {
    val df = TextOps.t37TokenQuota(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"expected at most 1 keyed exchange, got $hashEx — " +
      "the running token sum must share the source Window partitioning")
  }

  test("c43 books close against c32's keep decision and raw totals") {
    val rows = DedupOps.c43EffectiveTokens(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_._2).sum === docs.count())
    val rawTok = docs
      .select(coalesce(size(split(col("text"), "\\s+")), lit(0)).cast("long"))
      .as[Long].collect().sum
    assert(rows.map(_._3).sum === rawTok)
    rows.foreach { case (src, rd, rt, kd, kt, dup) =>
      assert(kd <= rd, src); assert(kt <= rt, src)
      assert(dup === rt - kt, src); assert(dup >= 0L, src)
    }
    // kept docs per source equal c32's kept statuses per source
    val keptBySource = DedupOps.c32ClusterKeep(spark, sf)
      .filter(col("status") === "kept")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    rows.foreach { case (src, _, _, kd, _, _) =>
      assert(kd === keptBySource.getOrElse(src, 0L), src)
    }
  }
}
