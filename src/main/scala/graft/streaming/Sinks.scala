package graft.streaming

import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A2/A3/A13/A27 — sink wiring (SURVEY.md §2).
  *
  * The reference's sink zoo (plain Kafka, dynamic-topic exactly-once
  * Kafka, Phoenix upsert, ClickHouse JDBC batch) collapses into three
  * Spark shapes:
  *  1. Kafka writer with a per-row `topic` column (A3's dynamic
  *     routing is native — MyKafkaUtil.java:44-50's custom serializer
  *     is unnecessary);
  *  2. foreachBatch writers for idempotent/upsert semantics (A13,
  *     A27) — exactly-once = checkpoint + deterministic overwrite;
  *  3. partitioned-directory writes standing in for per-topic fan-out
  *     in the broker-less test harness.
  */
object Sinks {

  /** A2/A3 — Kafka sink; if `topicCol` is set, each row routes to its
    * own topic (dynamic routing, BaseDBApp.java:131-144). */
  def kafka(df: DataFrame, servers: String, checkpoint: String,
      topic: Option[String] = None, topicCol: Option[String] = None): DataStreamWriter[Row] = {
    val keyed = topicCol match {
      case Some(c) => df.select(col(c).as("topic"), to_json(struct(df.columns.map(col): _*)).as("value"))
      case None => df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    }
    val w = keyed.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("checkpointLocation", checkpoint)
    topic.fold(w)(t => w.option("topic", t))
  }

  /** A27 — stats sink: per micro-batch, drop @TransientSink-style
    * columns and append to the warehouse path partitioned by a date
    * column derived from stt, so re-runs overwrite deterministically
    * (dynamic partition overwrite ⇒ idempotent under checkpoint
    * replay — the exactly-once story for file warehouses).
    * Mirrors ClickHouseUtil.java:17-50's reflective skip logic. */
  def statsSink(df: DataFrame, path: String, checkpoint: String,
      transientCols: Seq[String]): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeStatsBatch(batch, path, transientCols)
      }

  /** The batch body of statsSink, callable directly in tests/batch. */
  def writeStatsBatch(batch: DataFrame, path: String, transientCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch.drop(transientCols: _*)
      .withColumn("dt", substring(col("stt"), 1, 10))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dt")
      .parquet(path)
  }

  /** A13 — dim upsert: MERGE-style overwrite by primary key against a
    * parquet dim snapshot (the Phoenix `upsert into` equivalent;
    * DimSink.java:28-69). Last-writer-wins per key within the batch by
    * `versionCol` descending. The reference's Redis cache invalidation
    * (DimSink.java:47-53) is moot — snapshot readers always see the
    * post-merge table. */
  def upsertDim(spark: SparkSession, updates: DataFrame, dimPath: String,
      keyCol: String, versionCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val existing =
      try spark.read.parquet(dimPath)
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], updates.schema) }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("__src").desc)
    val merged = existing.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
    // Write via temp dir then swap: parquet can't overwrite its own input.
    val tmp = dimPath + "__tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dimPath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** A12/A3 fan-out in the broker-less harness: one foreachBatch, N
    * filtered writes — the 3-way log split's sink side
    * (BaseLogApp.java:136-138). Routes each row to
    * `<root>/<sink_table>/` per its routing column. */
  def routedSink(df: DataFrame, root: String, checkpoint: String,
      routeCol: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode(SaveMode.Append)
          .partitionBy(routeCol)
          .parquet(root)
      }
}
