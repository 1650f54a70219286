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
  */
object Retention {

  /** Sweep fingerprints out of a BloomIndex-layout table at `path`.
    * Returns the per-bucket audit (all buckets, including untouched).
    * Bounded driver state: per-bucket counts (≤ buckets rows) and the
    * candidate id list; the kept slice is localCheckpoint-ed before
    * the overwrite (Spark refuses a same-path read-write plan) — at
    * real scale the equivalent is a temp-dir write + partition move,
    * same file-skipping shape. */
  def sweep(spark: SparkSession, path: String, fps: DataFrame): DataFrame = {
    import spark.implicits._
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
    val kept = touched.join(delKeys, Seq("fingerprint"), "left_anti")
      .select(col("doc_id"), col("fingerprint"), col("bucket"))
      .localCheckpoint()
    kept.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(s"$path/data")
    // Dynamic overwrite only rewrites partitions PRESENT in `kept`: a
    // candidate bucket whose every row matched the delete set has no
    // kept rows, so its old files would silently survive — the exact
    // failure the takedown contract forbids. Delete those bucket dirs
    // explicitly (bounded: ≤ candidate-bucket count of metadata ops).
    val keptBuckets = kept.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val hfs = {
      val p = new org.apache.hadoop.fs.Path(s"$path/data")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    }
    cand.filterNot(keptBuckets).foreach { b =>
      hfs.delete(new org.apache.hadoop.fs.Path(s"$path/data/bucket=$b"), true)
    }
    val after = spark.read.parquet(s"$path/data")
      .groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    beforeCounts.keys.toSeq.sorted.map { b =>
      (b, beforeCounts(b), deletedCounts.getOrElse(b, 0L),
        after.getOrElse(b, 0L))
    }.toDF("bucket", "rows_before", "rows_deleted", "rows_after")
  }
}
