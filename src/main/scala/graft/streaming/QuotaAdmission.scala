package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Event to be admitted: `seq` is the arrival order within the key
  * (admission is deterministic in seq, never in shuffle order). */
case class AdmissionEvent(source: String, doc_id: Long, seq: Long)

/** Admission decision; `admitted_so_far` is the key's running
  * admitted count AFTER this event. */
case class AdmissionDecision(source: String, doc_id: Long,
                             admitted: Boolean, admitted_so_far: Long)

/** Per-key streaming admission quota on the Spark 4
  * `transformWithState` API — the arbitrary-stateful-processing
  * successor to `flatMapGroupsWithState` (SPARK-46815; RocksDB state
  * store, typed per-key state with optional TTL, timers). This is the
  * STREAMING twin of q99's per-domain quota cap: admit the first
  * `limit` events per source across all micro-batches, reject the
  * rest — the admission-control shape of crawl-ingest pipelines
  * (stop pulling from a domain once its budget is spent) running
  * continuously instead of as a nightly batch.
  *
  * State is one ValueState[Long] counter per key — O(|keys|) total,
  * no per-event state growth; a TTL could age budgets out for
  * rolling-window quotas (kept NONE here: the batch twin is the
  * all-time cap). QuotaAdmissionSpec pins stream ≡ batch parity and
  * cross-batch state carry.
  */
class QuotaProcessor(limit: Long)
    extends StatefulProcessor[String, AdmissionEvent, AdmissionDecision] {

  @transient private var admitted: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    admitted = getHandle.getValueState[Long](
      "admitted", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[AdmissionEvent],
      timerValues: TimerValues): Iterator[AdmissionDecision] = {
    var c = if (admitted.exists()) admitted.get() else 0L
    // the whole micro-batch of one key arrives at once: order by seq
    // so admission does not depend on shuffle arrival order (same
    // argument as FraudDetection's in-group event-time sort)
    val out = rows.toVector.sortBy(e => (e.seq, e.doc_id)).map { e =>
      val ok = c < limit
      if (ok) c += 1
      AdmissionDecision(e.source, e.doc_id, ok, c)
    }
    admitted.update(c)
    out.iterator
  }
}

object QuotaAdmission {

  /** Streaming admission over a typed event stream. Requires the
    * RocksDB state store provider (transformWithState's contract). */
  def admitStream(events: Dataset[AdmissionEvent],
                  limit: Long): Dataset[AdmissionDecision] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.source)
      .transformWithState(new QuotaProcessor(limit),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch replay of the same decisions: rank by (seq, doc_id) within
    * source; admitted = rank ≤ limit; a rejected event's running
    * count has already saturated at `limit`. Exactly the stream's
    * output when micro-batches arrive in seq order (the at-source
    * ordering contract; the spec exercises both). */
  def admitBatch(events: DataFrame, limit: Long): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("seq"), col("doc_id"))
    events
      .withColumn("_rk", row_number().over(w))
      .select(col("source"), col("doc_id"),
        (col("_rk") <= limit).as("admitted"),
        when(col("_rk") <= limit, col("_rk").cast("long"))
          .otherwise(lit(limit)).as("admitted_so_far"))
  }
}
