package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.operators.{IvfIndex, Similarity}

/** Continuous vector ingest into a persisted IVF index — the
  * operational half of `IvfIndex`'s maintenance contract, run as a
  * stream instead of one-shot appends (reference shape: the
  * kafka-to-bronze micro-batch landing of `kafka_to_bronze.py`,
  * applied to an ANN index instead of a parquet table).
  *
  * Topology: `foreachBatch` — the index write is a partitioned-
  * parquet APPEND with exactly-once bookkeeping delegated to the
  * sink directory layout, precisely the case Structured Streaming
  * documents foreachBatch for. Each micro-batch is assigned to
  * inverted lists with the SAME frozen codebook + native expression
  * the batch path uses (`IvfIndex.assignOnly` — one kernel, the
  * stream ≡ batch discipline every graft streaming operator
  * follows), appended `partitionBy(cid)`, and then the batch's
  * occupancy skew is measured with `IvfIndex.skewRatio`.
  *
  * Retrain policy: when appends concentrate into few lists (data
  * drift — the codebook no longer tessellates the incoming
  * distribution) and skew exceeds `maxSkew`, the configured
  * `onRetrain` hook fires with the measured ratio. The DEFAULT hook
  * only records the trigger (retrain is a heavyweight batch job a
  * production deployment schedules off the hot path — the atomic
  * swap itself is `IvfIndex.rebuild`, spec'd in IvfMaintenanceSpec);
  * wiring `IvfIndex.rebuild` directly into the hook is one line for
  * deployments that want it inline.
  *
  * Scale: per micro-batch work is one scan-speed assignment
  * projection + one partitioned append + one aggregate over list
  * counts (numCentroids rows). No state store at all — the index ON
  * DISK is the state, which is what bounds driver/executor memory
  * regardless of stream lifetime. The marker-file contract is
  * intentionally untouched during streaming: `isValid` gates on the
  * BUILD fingerprint; readers that require a quiesced index check
  * `rows=` against a count at their own read point.
  */
object IvfStreamIngest {

  /** One retrain-trigger observation (batchId, measured skew). */
  final case class SkewEvent(batchId: Long, skewRatio: Double)

  /** Start the ingest stream. `vectors` must be a streaming frame
    * with (vec_id LONG, query_vec ARRAY<BIGINT>) — quantized
    * upstream, like every Similarity input. Returns the running
    * query; observed skew events accumulate in `events` (bounded by
    * stream lifetime in batches, driver-side, test-observable). */
  def start(vectors: DataFrame, indexPath: String, maxSkew: Double = 4.0,
            checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
            onRetrain: SkewEvent => Unit = _ => ()): StreamingQuery = {
    val spark = vectors.sparkSession
    val cents = IvfIndex.centroids(spark, indexPath)
    writer(vectors, spark, cents, indexPath, maxSkew, onRetrain)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  private def writer(vectors: DataFrame, spark: SparkSession,
      cents: Array[(Long, Array[Long])], indexPath: String,
      maxSkew: Double, onRetrain: SkewEvent => Unit): DataStreamWriter[Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // assignment uses the frozen build-time codebook: the standard
      // IVF contract (and what keeps batch/stream results identical)
      IvfIndex.assignOnly(batch, cents)
        .write.partitionBy("cid").mode(SaveMode.Append)
        .parquet(s"$indexPath/lists")
      // occupancy check AFTER the append so the measured ratio is
      // the serving-path truth, not the batch's own distribution
      val ratio = IvfIndex.skewRatio(spark, indexPath)
      if (ratio > maxSkew) onRetrain(SkewEvent(batchId, ratio))
    }
}
