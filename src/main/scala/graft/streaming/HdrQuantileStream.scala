package graft.streaming

import graft.plans.HdrSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming latency-quantile monitor — per-window p50/p95/p99 with
  * the HDR log-linear guarantee, the streaming twin of q243's
  * `graft_hdr` native aggregate (the reference's observability SLAs,
  * pipeline_observability.py, gate on batch medians; a stream gates
  * on window quantiles).
  *
  * A TypedImperativeAggregate could run inside a streaming groupBy,
  * but its state would serialize the whole bucket map per window per
  * micro-batch; the compositional form is strictly better here: the
  * bucket law ([[HdrSketch.bucketExpr]] — shifts and bit lengths, the
  * exact integers of the native agg) is a scan expression, and the
  * aggregate is a plain windowed COUNT per bucket — built-in
  * streaming state, bounded BY CONSTRUCTION at (windows in flight) ×
  * ≤(64−b)·2^b rows no matter the value stream. Append mode emits
  * each window's finalized bucket table once the watermark passes.
  *
  * The fold from bucket table to quantiles is pure integer rank
  * arithmetic, so stream and batch agree bit-for-bit, and
  * HdrQuantileStreamSpec cross-certifies the whole path against the
  * native `graft_hdr` aggregate on the same rows.
  */
object HdrQuantileStream {

  /** Per-window HDR bucket counts over a stream with columns
    * (ts timestamp, v bigint >= 0). Works unchanged on a batch
    * frame (no watermark applied). */
  def bucketWindows(events: DataFrame,
                    b: Int = 5,
                    windowDuration: String = "1 minute",
                    watermarkDelay: String = "30 seconds"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
              else events
    src
      .select(col("ts"), HdrSketch.bucketExpr("v", b).as("bucket"))
      .groupBy(window(col("ts"), windowDuration), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("bucket"), col("cnt"))
  }

  /** Fold a finalized bucket table to per-window quantile lower
    * bounds (the graft_hdr rank rule: smallest bucket whose running
    * count reaches ceil(n·pct/100)). Batch-side over the landed
    * rows; one keyed window per fold, all integers. */
  def quantiles(buckets: DataFrame, b: Int = 5,
                pcts: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    val w = Window.partitionBy("window_start", "window_end").orderBy("bucket")
    val cum = buckets
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy("window_start", "window_end")))
    val picks = pcts.map { pct =>
      min(when(col("cum") >= expr(s"(n * $pct + 99) DIV 100"),
        col("bucket"))).as(s"i$pct")
    }
    val aggCols = max(col("n")).as("n") +: picks
    val picked = cum.groupBy("window_start", "window_end")
      .agg(aggCols.head, aggCols.tail: _*)
    pcts.foldLeft(picked) { (df, pct) =>
      df.withColumn(s"p${pct}_lb", HdrSketch.lowerBoundExpr(s"i$pct", b))
    }.select(col("window_start") +: col("window_end") +: col("n") +:
      pcts.map(p => col(s"p${p}_lb")): _*)
  }
}
