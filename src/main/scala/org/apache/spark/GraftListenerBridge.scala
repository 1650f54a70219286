package org.apache.spark

/** Bridge to the `private[spark]` listener bus drain — task-metric
  * events are posted asynchronously, so a profiler that snapshots
  * right after an action can miss the tail of its own tasks. Draining
  * the bus is exactly what Spark's own test utilities do; this is the
  * one-hop access to it from graft code (same pattern as
  * `org.apache.spark.sql.GraftSqlBridge`).
  */
object GraftListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
