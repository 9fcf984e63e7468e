package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Entry point 2 end-to-end (SURVEY.md §3.2): CDC envelope lines →
  * BaseDBApp twin (parse, filter, per-table route, dim upsert) →
  * OrderWideApp twin (±5s interval join + broadcast dim enrich) →
  * PaymentWideApp twin ([-15min,0] join) — streaming with
  * AvailableNow, asserted against hand-derived pairs. */
class DbJobsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z
  private def cdc(table: String, typ: String, ts: Long, data: (String, String)*) = {
    val payload = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","table":"$table","type":"$typ","ts":$ts,"data":{$payload}}"""
  }

  private val lines = Seq(
    // dim: alice inserted then renamed; bob; carol never referenced
    cdc("user_info", "insert", t0, "id" -> "7", "name" -> "alice"),
    cdc("user_info", "update", t0 + 1000, "id" -> "7", "name" -> "alicia"),
    cdc("user_info", "insert", t0, "id" -> "8", "name" -> "bob"),
    cdc("user_info", "insert", t0, "id" -> "9", "name" -> "carol"),
    // orders
    cdc("order_info", "insert", t0, "id" -> "1", "user_id" -> "7"),
    cdc("order_info", "insert", t0 + 60000, "id" -> "2", "user_id" -> "8"),
    // details: d11/d12 within ±5s of order 1; d13 at +8s misses
    cdc("order_detail", "insert", t0 + 2000, "id" -> "11", "order_id" -> "1", "sku_id" -> "100", "amount" -> "5"),
    cdc("order_detail", "insert", t0 - 3000, "id" -> "12", "order_id" -> "1", "sku_id" -> "101", "amount" -> "7"),
    cdc("order_detail", "insert", t0 + 8000, "id" -> "13", "order_id" -> "1", "sku_id" -> "102", "amount" -> "9"),
    cdc("order_detail", "insert", t0 + 61000, "id" -> "21", "order_id" -> "2", "sku_id" -> "103", "amount" -> "11"),
    // payments: p1 at +10min joins order 1; p2 at +899s after order 2
    // joins; p3 at +901s after order 2 misses the 15-min bound
    cdc("payment_info", "insert", t0 + 600000, "id" -> "91", "order_id" -> "1"),
    cdc("payment_info", "insert", t0 + 60000 + 899000, "id" -> "92", "order_id" -> "2"),
    cdc("payment_info", "insert", t0 + 60000 + 901000, "id" -> "93", "order_id" -> "2"),
    // deletes and empty payloads are filtered by splitDb
    cdc("order_info", "delete", t0, "id" -> "1"),
    s"""{"database":"gmall","table":"order_info","type":"insert","ts":$t0,"data":{}}""")

  test("CDC → route + dim upsert → order-wide → payment-wide, streaming") {
    val root = java.nio.file.Files.createTempDirectory("dbjobs").toString
    val inDir = s"$root/ods_base_db"
    new java.io.File(inDir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$inDir/part-0.txt"),
      lines.mkString("\n").getBytes)

    def source() = Sources.fileJson(spark, inDir, Sources.cdcSchema)

    // ---- BaseDBApp twin: dim rows upsert into the dim snapshot ----
    val qDim = Jobs.splitDb(source(), "user_info")
      .select(
        col("data")("id").as("user_id"),
        col("data")("name").as("user_name"),
        col("ts").as("ver"))
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_dim")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.upsertDim(spark, batch, s"$root/dim_user", "user_id", "ver")
      }.start()
    assert(qDim.awaitTermination(120000))
    val dim = spark.read.parquet(s"$root/dim_user").drop("ver")
    assert(dim.count() === 3L) // upserted by key, not appended

    // ---- OrderWideApp twin ----
    val orders = Jobs.splitDb(source(), "order_info")
      .select(
        col("data")("id").cast("long").as("order_id"),
        col("data")("user_id").as("user_id"),
        timestamp_millis(col("ts")).as("ts"))
      .withWatermark("ts", "1 hour")
    val details = Jobs.splitDb(source(), "order_detail")
      .select(
        col("data")("id").cast("long").as("detail_id"),
        col("data")("order_id").cast("long").as("detail_order_id"),
        col("data")("sku_id").cast("long").as("sku_id"),
        col("data")("amount").cast("long").as("amount"),
        timestamp_millis(col("ts")).as("dts"))
      .withWatermark("dts", "1 hour")
    val qWide = Jobs.orderWide(orders, details, dim)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_wide")
      .format("parquet").option("path", s"$root/dwm_order_wide").start()
    assert(qWide.awaitTermination(120000))

    val wide = spark.read.parquet(s"$root/dwm_order_wide")
    val gotWide = wide.select($"order_id", $"detail_id", $"user_name")
      .as[(Long, Long, String)].collect().toSet
    // d13 (+8s) out of the ±5s bound; alice renamed before the join
    assert(gotWide === Set((1L, 11L, "alicia"), (1L, 12L, "alicia"), (2L, 21L, "bob")))

    // ---- PaymentWideApp twin ----
    val payments = Jobs.splitDb(source(), "payment_info")
      .select(
        col("data")("id").cast("long").as("payment_id"),
        col("data")("order_id").cast("long").as("pay_order_id"),
        timestamp_millis(col("ts")).as("pts"))
      .withWatermark("pts", "1 hour")
    val wides = spark.readStream.schema(wide.schema)
      .parquet(s"$root/dwm_order_wide")
      .withWatermark("ts", "1 hour")
    val qPay = Jobs.paymentWide(payments, wides)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt_pay")
      .format("parquet").option("path", s"$root/dwm_payment_wide").start()
    assert(qPay.awaitTermination(120000))

    val gotPay = spark.read.parquet(s"$root/dwm_payment_wide")
      .select($"payment_id", $"order_id", $"detail_id")
      .as[(Long, Long, Long)].collect().toSet
    // p1 joins both order-1 wide rows; p2 within 899s; p3 at 901s out
    assert(gotPay === Set((91L, 1L, 11L), (91L, 1L, 12L), (92L, 2L, 21L)))
  }

  test("upsertDim recovers a snapshot stranded mid-swap at __old") {
    val root = java.nio.file.Files.createTempDirectory("dimrec").toString
    val dim = s"$root/dim_user"
    Sinks.upsertDim(spark,
      Seq((1L, "alice", 1L), (2L, "bob", 1L)).toDF("user_id", "user_name", "ver"),
      dim, "user_id", "ver")
    // simulate a crash between the two swap renames: the full
    // snapshot sits at __old, dst is missing
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dim),
      new org.apache.hadoop.fs.Path(dim + "__old")))
    // next upsert must restore the backup and merge against it —
    // NOT treat the table as empty and discard alice/bob
    Sinks.upsertDim(spark,
      Seq((3L, "carol", 1L)).toDF("user_id", "user_name", "ver"),
      dim, "user_id", "ver")
    val got = spark.read.parquet(dim)
      .select($"user_id", $"user_name").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "alice", 2L -> "bob", 3L -> "carol"))
  }
}
