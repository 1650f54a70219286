package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` DataFrame constructor — the one hop
  * outside public API needed to hand a custom LogicalPlan
  * (graft.plans.Sessionize) to the session. Everything downstream
  * (analysis, optimization, our injected planner strategy) is the
  * standard public extension path.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
