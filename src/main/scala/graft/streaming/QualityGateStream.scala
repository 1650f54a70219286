package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document quality gate: the q212 filter-report rule
  * kernel ([[graft.queries.MixOps.withFilterRules]] — the SAME
  * function, not a re-implementation) applied at ingest, plus the
  * per-rule rejection counters a curation run dashboards on. The
  * gate itself is stateless scan-speed expressions, so it composes
  * with any micro-batch source at full throughput; only the counter
  * aggregate keeps (bounded: windows × rules) state. The reference's
  * DQ philosophy (dq_rules.yml severity gates) moved from nightly
  * batch to the ingest edge: reject early, account for every drop.
  */
object QualityGateStream {

  /** Annotate a document stream (doc_id, lang, text, event_ts) with
    * rule outcomes — works identically on a streaming or batch frame
    * (Spark's unified semantics; the parity spec runs both). */
  def annotate(docs: DataFrame): DataFrame =
    graft.queries.MixOps.withFilterRules(docs)

  /** The kept stream: documents passing every rule.
    *
    * The throwaway nondeterministic column is a PUSHDOWN BARRIER
    * (the q242 hazard class, PLANS.md "filter-pushdown
    * re-tokenization"): filtering directly on `kept` lets
    * PushPredicateThroughNonJoin inline the gate's alias chain into
    * the predicate — including the token split inside the nested
    * repetition lambdas, which re-tokenizes each document per array
    * element. A projection containing any nondeterministic field is
    * not pushed through (canPushThrough requires all-deterministic
    * fields), so `kept` stays a once-per-row attribute. Batch
    * callers stage behind localCheckpoint instead (q242); a stream
    * cannot, hence the barrier column. */
  def gate(docs: DataFrame): DataFrame =
    annotate(docs)
      .withColumn("_gate_barrier", rand())
      .filter(col("kept"))
      .drop("_gate_barrier")

  /** Tumbling-window per-rule rejection counts over event time —
    * the observability side of the gate. Emits one row per (window,
    * rule) in append mode once the watermark passes. Per-rule rows
    * count (rule, doc) PAIRS — a document failing k rules appears
    * under all k, so rule counts must NOT be summed for a document
    * total. The document-level counters are the two synthetic rules:
    * `_kept` (survivors) and `_rejected` (each rejected doc exactly
    * once, however many rules it failed); `_kept + _rejected` is the
    * window's document total. */
  def ruleCounts(docs: DataFrame,
                 windowDuration: String = "1 minute",
                 watermarkDelay: String = "30 seconds"): DataFrame =
    annotate(docs)
      .select(col("event_ts"),
        explode(when(col("kept"), array(lit("_kept")))
          .otherwise(concat(array(lit("_rejected")),
            split(col("failed_rules"), ",")))).as("rule"))
      .withWatermark("event_ts", watermarkDelay)
      .groupBy(window(col("event_ts"), windowDuration), col("rule"))
      .agg(count(lit(1)).as("doc_count"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("rule"), col("doc_count"))
}
