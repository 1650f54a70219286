package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming top-k monitor — the heavy-hitters face of the windowed
  * monitor family (CardinalityStream = distinct counts,
  * HdrQuantileStream = quantiles, this = most-frequent keys): which
  * users/types dominate each window, maintained at the ingest edge
  * with BOUNDED state.
  *
  * State per in-flight window is ONE Misra–Gries buffer of at most
  * `capacity` (item, count) pairs — the native mergeable aggregate
  * `graft_mg_sketch` (plans/FreqSketch) running as a streaming
  * windowed aggregation, exactly the sketch the batch heavy-hitter
  * funnel (operators.HeavyHitters, q113/q120) uses. An exact
  * streaming per-key count would keep every distinct key in state;
  * the MG buffer keeps `capacity` rows per window no matter how many
  * keys the firehose carries.
  *
  * Exactness regime (the q253 contract): while a window's distinct
  * keys stay ≤ capacity, no decrement ever fires and the sketch IS
  * the exact frequency table for any arrival/merge order — stream ≡
  * batch ≡ SQL GROUP BY, bit-identical, which is what the DuckDB
  * oracle certifies at fixture scale. Past capacity the monitor
  * degrades to the MG guarantee set (every key with true count >
  * n/(capacity+1) is present; counts within n/(capacity+1)) rather
  * than growing state — the intended behavior at 100 TB, spec'd
  * separately in FreqSketchSpec.
  */
object TopKStream {

  /** Per-window MG sketch over a stream with columns (ts timestamp,
    * key string). Append mode emits each window's finalized sketch
    * once the watermark passes its end; works unchanged on a batch
    * frame (no watermark applied). */
  def sketchWindows(events: DataFrame, capacity: Int = 1024,
                    windowDuration: String = "1 hour",
                    watermarkDelay: String = "30 seconds"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
              else events
    src
      .groupBy(window(col("ts"), windowDuration))
      .agg(call_function("graft_mg_sketch", col("key"), lit(capacity)).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("sk"), col("n_events"))
  }

  /** Fold landed sketches to per-window top-k rows (rank by count
    * desc, then item — total order). Batch-side over the sink, like
    * CardinalityStream.estimates; the rank window is partitioned by
    * window_start, bounded by `capacity` rows per partition. */
  def topK(sketches: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("window_start")
      .orderBy(col("cnt").desc, col("item"))
    sketches
      .select(col("window_start"), col("window_end"), col("n_events"),
        explode(col("sk")).as("c"))
      .select(col("window_start"), col("window_end"), col("n_events"),
        col("c.item").as("item"), col("c.lb").as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
