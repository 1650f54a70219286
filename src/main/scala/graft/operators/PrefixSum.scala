package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global running sum — the scale-safe replacement for an
  * unpartitioned `Window.orderBy(...)` (which funnels every row
  * through ONE task and is the classic 100 TB killer).
  *
  * Two-phase scan, the textbook parallel prefix sum:
  *   1. range-partition + sort by the order column, then compute one
  *      subtotal per partition (P numbers — bounded by the partition
  *      count, never by the data);
  *   2. exclusive-prefix the subtotals on the driver, broadcast the P
  *      offsets, and stream each partition once adding offset +
  *      partition-local running sum.
  *
  * Identical results to the windowed form at any partition count
  * (PrefixSumSpec asserts both), O(rows/P) per task, no single-task
  * stage anywhere. The sorted input is persisted so phase 1 and
  * phase 2 see the same range boundaries and partition contents.
  *
  * Used by CurationOps.q59 (token-budget shard packing) and
  * Multimodal.repartitionBySize (byte-balanced blob partitioning).
  */
object PrefixSum {

  /** Append `outCol` = inclusive running sum of `valueCol` in global
    * `orderCol` order. `orderCol` must be unique (it defines the
    * total order; ties would make any running sum ill-defined). */
  def withRunningSum(df: DataFrame, orderCol: String, valueCol: String,
                     outCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val vIdx = df.schema.fieldIndex(valueCol)
    val sorted = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist()
    // Phase 1: one (pid, subtotal) row per partition — P rows total.
    val subtotals = sorted
      .select(col(valueCol).cast("long"))
      .mapPartitions { it =>
        var s = 0L
        it.foreach(s += _.getLong(0))
        Iterator((TaskContext.getPartitionId(), s))
      }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .collect()
    val offsets = new Array[Long](n)
    subtotals.sortBy(_._1).foreach { case (pid, s) =>
      if (pid + 1 < n) offsets(pid + 1) = s
    }
    var i = 1
    while (i < n) { offsets(i) += offsets(i - 1); i += 1 }
    val bc = spark.sparkContext.broadcast(offsets)
    // Phase 2: partition-local running sum + broadcast offset.
    val outSchema = df.schema.add(outCol, LongType, nullable = false)
    sorted.mapPartitions { it =>
      var run = bc.value(TaskContext.getPartitionId())
      it.map { row =>
        run += row.get(vIdx).asInstanceOf[Number].longValue
        Row.fromSeq(row.toSeq :+ run)
      }
    }(Encoders.row(outSchema))
  }

  /** Byte-balanced partition targets: rows in `orderCol` order are
    * cut into `numPartitions` contiguous chunks of ~equal total
    * `valueCol` (a blob heavier than a chunk overflows its own
    * partition — a single row cannot split). Returns df + `_target`
    * in [0, numPartitions). */
  def packTargets(df: DataFrame, orderCol: String, valueCol: String,
                  numPartitions: Int): DataFrame = {
    val withCum = withRunningSum(df, orderCol, valueCol, "_cum")
    val total = math.max(1L,
      withCum.agg(max(col("_cum"))).head().getLong(0))
    val chunk = math.max(1L, (total + numPartitions - 1) / numPartitions)
    withCum
      .withColumn("_target",
        least(
          floor((col("_cum") - col(valueCol).cast("long")) / chunk),
          lit(numPartitions - 1L)))
      .drop("_cum")
  }
}
