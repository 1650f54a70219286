package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** One-pass data-quality metrics on the WRITE path via
  * `Dataset.observe` (Spark's accumulator-backed observation API):
  * the row count, corrupt count, null-key count and min/max of the
  * event-time column are collected DURING the landing write instead
  * of by a second scan — at 100 TB the reference's pattern (write,
  * then run row-count/null checks as separate queries,
  * `pipeline_observability.py` re-reading bronze) pays a full extra
  * pass per check batch; observation metrics ride the write's own
  * tasks for free and cannot drift from what was actually written
  * (a post-hoc check scans files a concurrent writer may have
  * appended to).
  *
  * ObservedDqSpec pins both halves: the metrics equal the
  * separate-pass aggregates, and the observed path reads the input
  * ONCE (TaskMetricsProfiler input bytes ≈ 1 scan vs the check-after
  * path's 2).
  */
object ObservedDq {

  /** The five observed metrics, shared by the batch write and the
    * streaming sink (MicroBatchIngest.startBronzeSinkObserved) so
    * both faces report the same names with the same semantics. */
  private[graft] def dqMetrics(corrupt: Column, key: Column, ts: Column): Seq[Column] = Seq(
    count(lit(1)).as("rows"),
    sum(when(corrupt, 1L).otherwise(0L)).as("corrupt"),
    sum(when(key.isNull, 1L).otherwise(0L)).as("null_keys"),
    min(unix_micros(ts)).as("min_ts_us"),
    max(unix_micros(ts)).as("max_ts_us"))

  private[graft] val MetricNames =
    Seq("rows", "corrupt", "null_keys", "min_ts_us", "max_ts_us")

  private[graft] def toLongMap(row: Map[String, Any]): Map[String, Long] =
    MetricNames.map { k =>
      val v = row(k)
      k -> (if (v == null) 0L else v.asInstanceOf[Number].longValue())
    }.toMap

  /** Write `df` as parquet while observing DQ metrics; returns
    * (rows, corrupt, null_keys, min_ts_micros, max_ts_micros) as a
    * name→value map. `corrupt` marks rows failing the caller's
    * validity predicate; `key`/`ts` are the PK and event-time
    * columns the reference's checks monitor. */
  def parquetWithDq(df: DataFrame, path: String,
                    corrupt: Column, key: Column, ts: Column): Map[String, Long] = {
    val obs = Observation()
    val ms = dqMetrics(corrupt, key, ts)
    df.observe(obs, ms.head, ms.tail: _*)
      .write.mode("overwrite").parquet(path)
    toLongMap(obs.get)
  }
}
