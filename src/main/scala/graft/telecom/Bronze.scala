package graft.telecom

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze landing + compaction (SURVEY.md S5-S8, A13, O2-O3;
  * reference processing/bronze/bronze_compaction.py).
  *
  * Compaction = dedup by primary key, cluster-sort within partitions
  * for compression/locality, and size-targeted repartitioning using
  * the reference's rows = count / (targetBytes / avgRowBytes) formula
  * (py:115-122). With two or more sort columns the layout is TRUE
  * Z-order (py:141-151) via operators.Zorder — interleaved-bit
  * clustering, so file min/max envelopes prune on every sort column,
  * not just the leading one (closes SURVEY.md O4).
  */
object Bronze {

  /** Partitioned Hive-layout landing write (reference
    * kafka_to_bronze.py:57-87, S5). Returns write-path DQ metrics
    * (rows, null event-times, event-time bounds in µs) collected by
    * the write's OWN tasks via Dataset.observe — the landing is
    * self-auditing with zero extra reads, where the reference
    * re-scans bronze per check batch
    * (pipeline_observability.py:92-173). */
  def writeLanding(df: DataFrame, path: String,
                   eventTsCol: String): Map[String, Long] = {
    val obs = org.apache.spark.sql.Observation()
    df.withColumn("year", year(col(eventTsCol)))
      .withColumn("month", month(col(eventTsCol)))
      .withColumn("day", dayofmonth(col(eventTsCol)))
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col(eventTsCol).isNull, 1L).otherwise(0L)).as("null_ts"),
        min(unix_micros(col(eventTsCol))).as("min_ts_us"),
        max(unix_micros(col(eventTsCol))).as("max_ts_us"))
      .write.mode(SaveMode.Append)
      .partitionBy("year", "month", "day")
      .option("compression", "snappy")
      .parquet(path)
    obs.get.map { case (k, v) =>
      k -> (if (v == null) 0L else v.asInstanceOf[Number].longValue())
    }
  }

  /** Compaction of a landing table (reference bronze_compaction.py:
    * 88-136): dedup on pk keeping the LATEST by version column
    * (deterministic, unlike the reference's arbitrary-survivor
    * dropDuplicates — SURVEY.md §7.4 #2), size-targeted repartition,
    * range-clustered sort, atomic-ish overwrite. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              pk: Seq[String], versionCol: String, sortCols: Seq[String],
              targetFileBytes: Long = 256L * 1024 * 1024,
              avgRowBytes: Int = 500): Unit = {
    import org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(inPath)
    val w = Window.partitionBy(pk.map(col): _*).orderBy(col(versionCol).desc)
    val deduped = df
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    val rows = deduped.count()
    val rowsPerFile = targetFileBytes / avgRowBytes
    val numFiles = math.max(1, math.ceil(rows.toDouble / rowsPerFile).toInt)
    val clustered =
      if (rows > 0 && sortCols.size >= 2)
        graft.operators.Zorder.cluster(deduped, sortCols, numFiles)
      else
        deduped
          .repartitionByRange(numFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
    clustered
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(outPath)
  }
}
