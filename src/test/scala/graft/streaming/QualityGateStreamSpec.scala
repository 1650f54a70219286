package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class GateDoc(doc_id: Long, lang: String, text: String, event_ts: Timestamp)

/** The streaming gate runs the LITERAL q212 kernel, so stream must
  * equal batch row for row, and the windowed rule counters must
  * account for every document exactly once. */
class QualityGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L
  private def doc(id: Long, lang: String, text: String, offsetSec: Long) =
    GateDoc(id, lang, text, new Timestamp(t0 + offsetSec * 1000))

  // one doc per rule outcome + survivors, spread over two 1-min windows
  private val docs = Seq(
    doc(1, "en", "the catalog keeps statistics and the optimizer is using it to plan the scan of a table", 0),
    doc(2, "en", "a a a a a a a a a a", 5),                     // repetitive
    doc(3, "de", "der plan ist und das ist gut so wirklich sehr gut heute", 10), // non_english (+quality)
    doc(4, "en", "too short", 65),                              // too_short (+quality)
    doc(5, "en", "the shuffle is wide and the join is keyed so it is fine to run it in parallel today", 70))

  test("stream gate ≡ batch gate, and rule counters account for every doc") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GateDoc]
    val kept = QualityGateStream.gate(mem.toDF())
      .select("doc_id").writeStream.format("memory")
      .queryName("gate_kept").outputMode("append").start()
    val counts = QualityGateStream.ruleCounts(mem.toDF())
      .writeStream.format("memory").queryName("gate_counts")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(3)); kept.processAllAvailable(); counts.processAllAvailable()
      mem.addData(docs.drop(3)); kept.processAllAvailable(); counts.processAllAvailable()
      // close the final window: a late sentinel far past the watermark
      mem.addData(Seq(doc(99, "en", "sentinel closing the watermark window now for the counters to flush it", 600)))
      kept.processAllAvailable(); counts.processAllAvailable()

      val streamKept = spark.table("gate_kept").as[Long].collect().toSet - 99L
      val batchKept = QualityGateStream.gate(docs.toDF())
        .select("doc_id").as[Long].collect().toSet
      assert(streamKept === batchKept)
      assert(batchKept.contains(1L) && batchKept.contains(5L))
      assert(!batchKept.exists(Set(2L, 3L, 4L)))

      // every non-sentinel doc appears exactly once across rules
      val ruleRows = spark.table("gate_counts")
        .filter(col("window_start") < new Timestamp(t0 + 300 * 1000))
      val perRule = ruleRows.groupBy("rule")
        .agg(sum("doc_count").as("n"))
        .as[(String, Long)].collect().toMap
      assert(perRule("_kept") === 2L)
      // _rejected counts each rejected DOC once (doc 4 fails two
      // rules but increments _rejected once), so _kept + _rejected
      // reconstructs the window document total
      assert(perRule("_rejected") === 3L)
      assert(perRule("_kept") + perRule("_rejected") === docs.size.toLong)
      // doc 4 trips repetitive too: any <5-token doc has
      // top_word_frac >= 1/4 > 0.2, so too_short implies repetitive
      assert(perRule("repetitive") === 2L)
      assert(perRule("non_english") === 1L)
      assert(perRule("too_short") === 1L)
      // batch run of the same counter code on the same docs agrees
      val batchRule = QualityGateStream.ruleCounts(docs.toDF())
        .groupBy("rule").agg(sum("doc_count").as("n"))
        .as[(String, Long)].collect().toMap
      assert(batchRule.view.filterKeys(perRule.contains).toMap
        === perRule.view.filterKeys(batchRule.contains).toMap)
    } finally { kept.stop(); counts.stop() }
  }
}
