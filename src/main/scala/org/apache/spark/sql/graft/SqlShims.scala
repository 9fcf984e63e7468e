package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset => ClassicDataset}
import org.apache.spark.sql.{DataFrame, Row}

/** The Spark-internal accesses the snapshot streaming connector
  * needs, isolated here (this file lives inside the
  * org.apache.spark.sql package tree solely to satisfy
  * `private[sql]`); every other graft/Spark interaction uses the
  * public API. All three are the standard v1-connector/DML-command
  * shims Delta's connector uses for exactly the same jobs. */
object SqlShims {

  /** Re-root `df`'s physical plan under a streaming-flagged logical
    * leaf with the SAME schema — the micro-batch planner requires
    * every `execution.streaming.Source.getBatch` frame to declare
    * isStreaming, and the v1 Source contract is what lets the
    * stream reuse the engine's whole batch planning stack (manifest
    * resolution, vectorized parquet, codegen) instead of a bespoke
    * partition reader. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The inverse, for the SINK side: a v1 `Sink.addBatch` receives a
    * micro-batch DataFrame whose logical plan still carries streaming
    * leaves — re-root it on the incremental execution's RDD as a
    * plain BATCH frame so the store's commit path (an ordinary batch
    * write) can consume it. */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }

  /** An already-resolved LogicalPlan back as a DataFrame — the DML
    * command face (graft.plans.MergeIntoSnapshotCommand executes its
    * MERGE source this way). */
  def ofRows(session: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    ClassicDataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A resolved catalyst Expression as a user-facing Column — UPDATE
    * assignments and conditions arrive as Expressions and the store's
    * copy-on-write rewrite consumes Columns. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The inverse — a Column's catalyst Expression (the classic-API
    * accessor is private[sql]). */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** A v1 BaseRelation as a DataFrame — the composed merge-on-read
    * read plan (graft.sources.SnapshotDvReadPlan) builds its DV'd
    * half as a HadoopFsRelation over a pruning FileIndex, the one
    * relation shape that exposes `_metadata.row_index` (the deletion
    * vectors' position space). */
  def ofBaseRelation(session: org.apache.spark.sql.SparkSession,
      rel: org.apache.spark.sql.sources.BaseRelation): DataFrame =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(rel)

  /** Catalyst predicate → data-source Filter, the engine's own
    * translation — what lets a DML condition reuse the scan
    * builder's stat-space constraint mapping verbatim. */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)
}
