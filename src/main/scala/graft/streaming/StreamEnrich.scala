package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: enrich each call event with the tower
  * probes observed in the window leading up to the call — the
  * streaming version of the q60 tower-utilization correlation
  * (reference joins calls to probe aggregates in batch,
  * agg_tower_hourly_utilization.sql:114-137; here the enrichment
  * happens in flight).
  *
  * Scale/state design: both sides carry watermarks and the join
  * condition bounds probe_ts to [call_ts − tolerance, call_ts], so
  * Spark derives state-eviction horizons for BOTH sides — state per
  * tower is bounded by tolerance × arrival rate, never unbounded.
  * The same kernel runs in batch (withWatermark is a no-op there),
  * which is what the parity spec asserts.
  */
object StreamEnrich {

  /** Stream-static enrichment: every micro-batch joins the (bounded)
    * tower dimension map-side via broadcast — no stream-side shuffle,
    * no state. Left join keeps events from unknown towers (they flow
    * through with null dim columns for downstream quarantine rather
    * than vanishing). The static side is re-resolved per batch, so a
    * dim refresh is picked up without restarting the query. */
  def callsWithTowerDim(calls: DataFrame, towers: DataFrame): DataFrame =
    calls.join(broadcast(towers), Seq("tower_id"), "left")

  def callsWithTowerLoad(calls: DataFrame, probes: DataFrame,
                         tolerance: String = "10 minutes",
                         lateness: String = "30 seconds"): DataFrame = {
    val c = calls.withWatermark("call_ts", lateness)
    val p = probes
      .withColumnRenamed("tower_id", "probe_tower_id")
      .withWatermark("probe_ts", lateness)
    c.join(p,
        c("tower_id") === p("probe_tower_id") &&
          p("probe_ts") >= c("call_ts") - expr(s"INTERVAL $tolerance") &&
          p("probe_ts") <= c("call_ts"))
      .select(col("event_id"), col("tower_id"), col("call_ts"),
        col("probe_ts"), col("load_pct"))
  }
}
