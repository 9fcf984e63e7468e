package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset => ClassicDataset}
import org.apache.spark.sql.{DataFrame, Row}

/** The ONE Spark-internal access the snapshot streaming source needs,
  * isolated here (this file lives inside the org.apache.spark.sql
  * package tree solely to satisfy `private[sql]`): mark a
  * batch-planned DataFrame as STREAMING so a v1
  * `execution.streaming.Source.getBatch` can return it. This is the
  * standard v1-connector pattern — Delta's DeltaSource builds its
  * per-batch DataFrames exactly this way — because the v1 Source
  * contract lets `getBatch` reuse the engine's whole batch planning
  * stack (manifest resolution, vectorized parquet, codegen) instead
  * of forcing a bespoke partition reader. */
object SqlShims {

  /** Re-root `df`'s physical plan under a streaming-flagged logical
    * leaf with the SAME schema — the micro-batch planner requires
    * every source-produced frame to declare isStreaming. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
