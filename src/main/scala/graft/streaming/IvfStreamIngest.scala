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
      appendBatch(spark, batch, cents, indexPath, batchId)
      // occupancy check AFTER the append so the measured ratio is
      // the serving-path truth, not the batch's own distribution
      val ratio = IvfIndex.skewRatio(spark, indexPath)
      if (ratio > maxSkew) onRetrain(SkewEvent(batchId, ratio))
    }

  /** Test failpoint: invoked after SOME (not all) staged files have
    * been moved into the lists — the torn-append window a replay must
    * clean up. Receives the count of files moved so far. */
  private[streaming] var failpointMidPublish: Int => Unit = _ => ()

  /** Replay-idempotent micro-batch append. A bare
    * `mode(Append).parquet(lists)` duplicates the whole batch when
    * foreachBatch replays after a crash (Structured Streaming's
    * contract is at-least-once delivery TO the sink; exactly-once is
    * the sink's job) — every replayed vector would then surface twice
    * in probed candidates. Discipline (the Retention intent-marker
    * idea applied to an append): (1) delete any `b{batchId}_*` files
    * a previous attempt of THIS batch published (one glob,
    * numCentroids-bounded); (2) stage the assigned batch to a
    * batch-keyed scratch dir with mode=Overwrite (itself idempotent);
    * (3) publish by renaming each staged file into its cid partition
    * under a `b{batchId}_` name. A crash at any point leaves either
    * unpublished staging (harmless, overwritten on replay) or a
    * partial publish whose files step (1) removes — so replaying the
    * batch any number of times converges to exactly one copy.
    * Per-batch cost is unchanged: one assignment scan, one staged
    * write, plus numCentroids-bounded renames (metadata ops). */
  private[streaming] def appendBatch(spark: SparkSession, batch: DataFrame,
      cents: Array[(Long, Array[Long])], indexPath: String,
      batchId: Long): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val listsRoot = new org.apache.hadoop.fs.Path(s"$indexPath/lists")
    val hfs = listsRoot.getFileSystem(hconf)
    // (1) replay cleanup: torn publish from a prior attempt of this batch
    val prior = hfs.globStatus(
      new org.apache.hadoop.fs.Path(s"$indexPath/lists/cid=*/b${batchId}_*"))
    if (prior != null) prior.foreach(st => hfs.delete(st.getPath, false))
    // (2) stage: assignment uses the frozen build-time codebook (the
    // standard IVF contract, and what keeps batch/stream results
    // identical); Overwrite makes re-staging idempotent
    val staging = s"$indexPath/_staging/batch=$batchId"
    // cluster by cid before the partitioned write (round 13, guide §6
    // small-files — the IvfIndex.writeIndex r12 fix applied to the
    // streaming appender): without it every batch stages p × |cids|
    // files, and the publish step's rename loop below is one metadata
    // op PER FILE — clustering makes that numCentroids renames per
    // batch instead of p·numCentroids at any executor parallelism.
    IvfIndex.assignOnly(batch, cents).repartition(col("cid"))
      .write.partitionBy("cid").mode(SaveMode.Overwrite).parquet(staging)
    // (3) publish: rename staged data files under their cid partition
    // with the batch-id prefix step (1) keys on
    var moved = 0
    val cidDirs = hfs.globStatus(
      new org.apache.hadoop.fs.Path(s"$staging/cid=*"))
    if (cidDirs != null) cidDirs.filter(_.isDirectory).foreach { cd =>
      val destDir = new org.apache.hadoop.fs.Path(listsRoot, cd.getPath.getName)
      hfs.mkdirs(destDir)
      hfs.listStatus(cd.getPath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        .foreach { f =>
          require(hfs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(destDir, s"b${batchId}_${f.getPath.getName}")),
            s"publish rename of ${f.getPath} failed")
          moved += 1
          failpointMidPublish(moved)
        }
    }
    // Cleanup scoped to the batch this call OWNS: deleting the whole
    // _staging root was safe under one serial foreachBatch query but
    // would wipe a second ingest query's (or an overlapping retry's)
    // in-flight staging mid-publish (round-10 advice).
    hfs.delete(new org.apache.hadoop.fs.Path(staging), true)
    spark.catalog.refreshByPath(s"$indexPath/lists")
  }
}
