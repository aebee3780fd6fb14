package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim for `classic.Dataset.ofRows` (private[sql]): the MERGE
  * planner strategy captures the command's analyzed SOURCE plan and the
  * exec node turns it back into a DataFrame to hand to
  * `SnapshotStore.merge` — re-planning the source through the session
  * rather than re-parsing SQL, so CTEs/subqueries/joins in `USING (...)`
  * all work unchanged. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
