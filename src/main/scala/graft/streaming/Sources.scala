package graft.streaming

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A1/A4/A28 — source wiring (SURVEY.md §2).
  *
  * Kafka topics and the CDC envelope are contracts, not engines: the
  * same from_json projection runs over a Kafka stream in production
  * and a file/memory stream in tests (the harness has no brokers).
  */
object Sources {

  /** App-log event schema (BaseLogApp.java:48-121): common/page maps,
    * displays[] fan-out array, epoch-ms ts. */
  val logSchema: StructType = StructType(Seq(
    StructField("common", MapType(StringType, StringType)),
    StructField("page", MapType(StringType, StringType)),
    StructField("start", MapType(StringType, StringType)),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("display_type", StringType),
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("order", LongType))))),
    StructField("ts", LongType)))

  /** Maxwell/Debezium CDC envelope (BaseDBApp.java:52-62). */
  val cdcSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType),
    StructField("data", MapType(StringType, StringType))))

  /** A1 — Kafka source: topic of string records → parsed DataFrame.
    * Matches MyKafkaUtil.java:37-42 (value-as-string contract). */
  def kafkaJson(spark: SparkSession, servers: String, topic: String,
      schema: StructType, startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(from_json(col("value").cast(StringType), schema).as("j"))
      .select(col("j.*"))

  /** Test-mode equivalent: JSON-lines files under `dir`, same schema,
    * same downstream code. */
  def fileJson(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
      .format("text").load(dir)
      .select(from_json(col("value"), schema).as("j"))
      .select(col("j.*"))

  /** A6 — parse with dirty side-channel: returns (clean, dirty).
    * In PERMISSIVE mode from_json maps unparseable input to a struct
    * whose fields are ALL null (not a null struct), so the dirty
    * predicate is the conjunction of per-field nullness. The dirty
    * stream keeps the raw line for a dead-letter sink
    * (UniqueVisitApp.java:47-59's OutputTag("dirty")). */
  def parseWithDirty(raw: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val parsed = raw.withColumn("j", from_json(col("value"), schema))
    val dirty = schema.fields.map(f => col(s"j.${f.name}").isNull).reduce(_ && _)
    (parsed.filter(!dirty).select(col("j.*")),
      parsed.filter(dirty).select(col("value").as("dirty_raw")))
  }
}
