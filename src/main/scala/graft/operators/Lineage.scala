package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative DataFrame loops (the q203
  * lesson, PLANS.md "iterative-lineage"): a loop whose round reads
  * its parent r times grows the LOGICAL plan r^rounds even when data
  * is cached — plan analysis and the SQL listener's plan-description
  * rendering then dominate (or wedge) the job. Every driver-loop
  * operator cuts per round: reliable `checkpoint()` when the caller
  * has set a checkpoint dir (fault-tolerant, survives executor churn
  * on a real cluster), `localCheckpoint()` otherwise (fast,
  * executor-local — right for local mode and short jobs). */
object Lineage {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
