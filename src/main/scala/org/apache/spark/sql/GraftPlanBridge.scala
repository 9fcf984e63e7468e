package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the graft extension needs: turning
  * an already-resolved LogicalPlan back into a DataFrame inside a
  * runnable command (graft.plans.MergeIntoSnapshotCommand executes
  * its MERGE source this way). Spark 4 moved `Dataset.ofRows` behind
  * `org.apache.spark.sql.classic` with sql-private access, so the
  * bridge lives in this package — the established extension shape
  * for DSv2 connectors that execute DML as commands. Nothing else
  * may go through here; every other graft/Spark interaction uses the
  * public API. */
object GraftPlanBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
}
