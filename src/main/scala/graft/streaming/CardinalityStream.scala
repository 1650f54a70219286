package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming cardinality monitor — A8's cardinality-drift check
  * (reference soda checks / metrics cardinality monitors,
  * pipeline_observability.py) moved to the INGEST EDGE: per-window
  * distinct-key estimates from HyperLogLog registers maintained as a
  * native streaming aggregate.
  *
  * The register law is q149's deterministic HLL (Flajolet et al.
  * 2007): 48-bit md5-prefix hash, top 6 bits pick one of m = 64
  * registers, the register keeps the max leading-zero rank of the
  * remaining 42 bits. `max` is a built-in streaming aggregate, so
  * the whole monitor is watermark + windowed groupBy — no custom
  * state store code, and the state is BOUNDED BY CONSTRUCTION at
  * (windows in flight) × 64 rows no matter how many distinct keys
  * the stream carries. That bound is the entire point: an exact
  * streaming countDistinct would hold every key in state and grow
  * without limit on a 100 TB/day firehose.
  *
  * Same code path batch or streaming (Spark's unified semantics) —
  * the spec certifies stream ≡ batch on identical rows, and the
  * register table folds to the estimate with q149's dyadic-exact
  * Σ2^(−r) (64 terms spanning < 53 bits: EXACT in doubles in any
  * order, so stream and batch estimates are bit-identical).
  */
object CardinalityStream {

  private val P = 6 // register-index bits: m = 64
  private val M = 1 << P

  /** q149's register law over a string key column. */
  private def bucketAndRank(key: org.apache.spark.sql.Column) = {
    val h = conv(substring(md5(key), 1, 12), 16, 10).cast("long")
    (shiftright(h, 42), h.bitwiseAND(lit((1L << 42) - 1)))
  }

  /** Per-window HLL register table over a stream with columns
    * (ts timestamp, key string). Append mode emits each window's
    * finalized 64-row register table once the watermark passes its
    * end. Works unchanged on a batch frame (no watermark applied). */
  def registerWindows(events: DataFrame,
                      windowDuration: String = "1 minute",
                      watermarkDelay: String = "30 seconds"): DataFrame = {
    val (bucket, w) = bucketAndRank(col("key"))
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
              else events
    src
      .select(col("ts"), bucket.as("bucket"), w.as("w"))
      .select(col("ts"), col("bucket"),
        when(col("w") === 0L, lit(43L))
          .otherwise((lit(43) - length(bin(col("w")))).cast("long")).as("rank"))
      .groupBy(window(col("ts"), windowDuration), col("bucket"))
      .agg(max(col("rank")).as("r"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("bucket"), col("r"))
  }

  /** Fold a finalized register table to per-window raw HLL estimates
    * (q149's α₆₄·m²/Σ2^(−r), empty registers counted at rank 0).
    * Batch-side: runs over the landed register rows. */
  def estimates(regs: DataFrame): DataFrame =
    regs.groupBy("window_start", "window_end")
      .agg(count(lit(1)).as("buckets_seen"),
        sum(pow(lit(0.5), col("r"))).as("sum_inv_seen"))
      // registers the window never touched contribute 2^-0 = 1 each
      .withColumn("sum_inv",
        (col("sum_inv_seen") + (lit(M) - col("buckets_seen"))).cast("double"))
      .withColumn("hll_estimate",
        (lit(0.709) * lit(64.0) * lit(64.0) / col("sum_inv")).cast("double"))
      .select(col("window_start"), col("window_end"), col("buckets_seen"),
        col("sum_inv"), col("hll_estimate"))
}
