package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PII scrub: the q236 mask cascade
  * ([[graft.operators.TextAnalysis.piiMask]] — the SAME kernel, not
  * a re-implementation) applied at the ingest edge, so raw PII never
  * lands in bronze — the anonymize-before-persist discipline (Dolma
  * §2.3, FineWeb) that a batch-only scrub cannot give you, plus the
  * per-window category counters a privacy review dashboards on. The
  * scrub is stateless scan-speed regex projections; only the counter
  * aggregate keeps (bounded: windows × 3 categories) state. */
object PiiScrubStream {

  /** Annotate a document stream (doc_id, text, event_ts, ...) with
    * per-category match counts, the masked text, and a `pii_found`
    * flag — identical semantics on a streaming or batch frame (the
    * parity spec runs both). Downstream persists `masked`, never
    * `text`. */
  def scrub(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_emails",
        TextAnalysis.emailCount(col("text")).cast("bigint"))
      .withColumn("n_phones",
        TextAnalysis.phoneCount(col("text")).cast("bigint"))
      .withColumn("n_ips", TextAnalysis.ipCount(col("text")).cast("bigint"))
      .withColumn("pii_found",
        col("n_emails") + col("n_phones") + col("n_ips") > 0)
      .withColumn("masked", TextAnalysis.piiMask(col("text")))

  /** Tumbling-window PII-category totals over event time — the
    * observability side (documents scanned, documents with PII, and
    * per-category match totals per window). Append mode once the
    * watermark passes, exactly the QualityGateStream.ruleCounts
    * shape. */
  def piiCounts(docs: DataFrame,
                windowDuration: String = "1 minute",
                watermarkDelay: String = "30 seconds"): DataFrame =
    scrub(docs)
      .withWatermark("event_ts", watermarkDelay)
      .groupBy(window(col("event_ts"), windowDuration))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("pii_found"), 1L).otherwise(0L)).as("docs_with_pii"),
        sum(col("n_emails")).as("emails"),
        sum(col("n_phones")).as("phones"),
        sum(col("n_ips")).as("ips"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("docs"), col("docs_with_pii"),
        col("emails"), col("phones"), col("ips"))
}
