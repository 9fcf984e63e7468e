package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the bucketed co-location layout (ScaleOps.writeBucketed):
  * with orders and lineitem bucketed by their join key into the same
  * bucket count, the join + keyed aggregation plans with ZERO shuffle
  * exchanges — the property that makes repeated fact⋈fact joins
  * feasible at the 100 TB design point. Broadcast and AQE are
  * disabled inside the test so the assertion is about bucketing, not
  * about a small-input broadcast plan.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join + agg plans without a shuffle and matches plain join") {
    val d = "/root/testdata/sf0.001"
    ScaleOps.writeBucketed(Tables.orders(spark, d), "b_orders", "o_orderkey", 8)
    ScaleOps.writeBucketed(Tables.lineitem(spark, d), "b_lineitem", "l_orderkey", 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      def joinAgg(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("qty"),
            count(lit(1)).as("lines"))

      val bucketed = joinAgg(spark.table("b_orders"), spark.table("b_lineitem"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free bucketed plan, got:\n$plan")

      val plain = joinAgg(Tables.orders(spark, d), Tables.lineitem(spark, d))
      val got = bucketed.as[(Long, BigDecimal, Long)].collect().sortBy(_._1).toSeq
      val want = plain.as[(Long, BigDecimal, Long)].collect().sortBy(_._1).toSeq
      assert(got === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
