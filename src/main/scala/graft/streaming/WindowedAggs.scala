package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed aggregations (SURVEY.md ST7): the reference
  * recomputes hourly tower windows in 30-min Airflow batches
  * (network_monitoring_dag.py:46); the Spark-native upgrade is a true
  * event-time tumbling-window aggregate with a watermark — identical
  * output columns to the batch rollup, incremental state instead of
  * recompute.
  *
  * Works on a streaming OR batch DataFrame (same code path — Spark's
  * unified semantics); in append mode a window emits once the
  * watermark passes its end, giving exactly-once finalized rows.
  */
object WindowedAggs {

  /** Per-tower tumbling-window load rollup over a probe stream with
    * columns (probe_ts timestamp, tower_id, load_pct). */
  def towerLoadWindows(probes: DataFrame,
                       windowDuration: String = "1 hour",
                       watermarkDelay: String = "30 seconds"): DataFrame =
    probes
      .withWatermark("probe_ts", watermarkDelay)
      .groupBy(window(col("probe_ts"), windowDuration), col("tower_id"))
      .agg(
        avg(col("load_pct")).as("avg_load_pct"),
        max(col("load_pct")).as("max_load_pct"),
        sum(when(col("load_pct") >= 90, 1L).otherwise(0L)).as("critical_count"),
        count(lit(1)).as("probe_count"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("tower_id"), col("avg_load_pct"), col("max_load_pct"),
        col("critical_count"), col("probe_count"))

  /** Event-time SESSION windows per user: dynamic-gap sessionization
    * as a native streaming aggregate (`session_window`) — the
    * streaming twin of the batch lag+cumsum formulation (q34).
    * Sessions merge as late events arrive and finalize once the
    * watermark passes gap after the last event. */
  def userSessions(events: DataFrame,
                   gap: String = "30 minutes",
                   watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .withWatermark("event_ts", watermarkDelay)
      .groupBy(session_window(col("event_ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("event_count"),
        sum(col("value")).as("session_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("event_count"), col("session_value"))
}
