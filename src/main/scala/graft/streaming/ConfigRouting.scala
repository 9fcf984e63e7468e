package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** A11 full fidelity — STREAMING config-table routing
  * (TableProcessFunction.java:24-170 + BaseDBApp.java:67-144).
  *
  * The reference keeps the routing config as BROADCAST STATE fed by a
  * MySQL-CDC stream: a config row added while the job runs changes the
  * routing of every later record (TableProcessFunction.processBroadcast
  * Element, :49-67), and new hbase-bound rows trigger CREATE TABLE
  * (:79-126). The Spark-idiomatic twin is foreachBatch: the config
  * fixture (an append-only JSON-lines dir standing in for the binlog)
  * is RE-READ AND RE-BROADCAST once per micro-batch — micro-batches
  * are Spark's state-update granularity, exactly as the reference's
  * broadcast element is Flink's.
  */
object ConfigRouting {

  /** TableProcess config row (TableProcess.java:11-30) + op_ts, the
    * CDC ordinal that makes the fixture append-only (an UPDATE is a
    * later row for the same source_kind). */
  val configSchema: StructType = StructType(Seq(
    StructField("source_kind", StringType),
    StructField("sink_type", StringType),
    StructField("sink_table", StringType),
    StructField("sink_columns", StringType),
    StructField("sink_pk", StringType),
    StructField("op_ts", LongType)))

  /** Materialize the CURRENT config from the CDC fixture dir:
    * last writer per source_kind wins (binlog replay semantics). */
  def currentConfig(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source_kind"))
      .orderBy(col("op_ts").desc)
    spark.read.schema(configSchema).json(dir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** DDL side-effect of hbase-bound config rows (TableProcessFunction
    * .checkTable, :79-126): CREATE TABLE IF NOT EXISTS with sink_pk as
    * the leading column. Idempotent; the config is a handful of rows
    * (the documented broadcast-config pattern), so collect() is the
    * bounded driver-side read the reference also does. */
  def ensureSinkTables(spark: SparkSession, config: DataFrame): Unit =
    config.filter(col("sink_type") === "hbase").collect().foreach { r =>
      val table = r.getAs[String]("sink_table")
      val pk = r.getAs[String]("sink_pk")
      val cols = r.getAs[String]("sink_columns").split(",")
      val rest = cols.filterNot(_ == pk).map(c => s"$c STRING").mkString(", ")
      spark.sql(s"CREATE TABLE IF NOT EXISTS $table ($pk STRING, $rest) USING parquet")
    }

  /** Routing + per-sink column projection of one (micro-)batch
    * (TableProcessFunction.processElement/filterColumn, :129-170): a
    * record joins its config row by kind (unmatched kinds drop, the
    * reference logs-and-drops, :150-153); a candidate column survives
    * iff named in sink_columns. */
  def route(batch: DataFrame, config: DataFrame, kindCol: String,
      passCols: Seq[String], candidateCols: Seq[String]): DataFrame = {
    def keep(c: String) =
      when(array_contains(split(col("sink_columns"), ","), c), col(c)).as(c)
    batch.join(broadcast(config), batch(kindCol) === config("source_kind"))
      .select(passCols.map(batch(_)) ++
        Seq(col("sink_type"), col("sink_table")) ++
        candidateCols.map(keep): _*)
  }

  /** The streaming routing job: per micro-batch, re-read the config
    * (broadcast-state refresh), apply the DDL side-effect, route and
    * write partitioned by sink_table (per-topic fan-out in the
    * broker-less harness — BaseDBApp.java:129-144's dual sink). */
  def routedJob(events: DataFrame, cfgDir: String, outRoot: String,
      checkpoint: String, kindCol: String, passCols: Seq[String],
      candidateCols: Seq[String]): DataStreamWriter[Row] =
    events.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cfg = currentConfig(spark, cfgDir)
        ensureSinkTables(spark, cfg)
        route(batch, cfg, kindCol, passCols, candidateCols)
          .write.mode("append").partitionBy("sink_table").parquet(outRoot)
      }
}
