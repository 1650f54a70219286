package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class PiiDoc(doc_id: Long, text: String, event_ts: Timestamp)

/** The streaming scrub runs the LITERAL q236 mask kernel, so stream
  * must equal batch row for row, the masked stream must carry no
  * residual PII, and the windowed counters must account for every
  * match. */
class PiiScrubStreamSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L
  private def doc(id: Long, text: String, offsetSec: Long) =
    PiiDoc(id, text, new Timestamp(t0 + offsetSec * 1000))

  private val docs = Seq(
    doc(1, "mail bob@corp.io or sue@dev.net about the release", 0),
    doc(2, "call +14155550123 before noon", 5),
    doc(3, "host at 192.168.0.12 is down and 10.0.0.7 is up", 10),
    doc(4, "nothing sensitive here at all", 65),
    doc(5, "mixed bag bob@corp.io and +14155550123 and 10.1.2.3", 70))

  test("stream scrub ≡ batch scrub; masked stream is PII-free; window counters exact") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiDoc]
    val scrubbed = PiiScrubStream.scrub(mem.toDF())
      .select("doc_id", "n_emails", "n_phones", "n_ips", "pii_found", "masked")
      .writeStream.format("memory").queryName("pii_scrubbed")
      .outputMode("append").start()
    val counts = PiiScrubStream.piiCounts(mem.toDF())
      .writeStream.format("memory").queryName("pii_counts")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(3)); scrubbed.processAllAvailable(); counts.processAllAvailable()
      mem.addData(docs.drop(3)); scrubbed.processAllAvailable(); counts.processAllAvailable()
      mem.addData(Seq(doc(99, "sentinel far past the watermark", 600)))
      scrubbed.processAllAvailable(); counts.processAllAvailable()

      val stream = spark.table("pii_scrubbed")
        .filter(col("doc_id") =!= 99L).collect()
        .map(r => r.getLong(0) -> r).toMap
      val batch = PiiScrubStream.scrub(docs.toDF()).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(stream.keySet === batch.keySet)
      for (id <- batch.keySet; c <- Seq("n_emails", "n_phones", "n_ips"))
        assert(stream(id).getAs[Long](c) === batch(id).getAs[Long](c),
          s"$c doc $id")
      for (id <- batch.keySet)
        assert(stream(id).getAs[String]("masked") ===
          batch(id).getAs[String]("masked"))
      // expected per-doc counts
      assert(batch(1L).getAs[Long]("n_emails") === 2L)
      assert(batch(2L).getAs[Long]("n_phones") === 1L)
      assert(batch(3L).getAs[Long]("n_ips") === 2L)
      assert(!batch(4L).getAs[Boolean]("pii_found"))
      assert(batch(5L).getAs[Long]("n_emails") === 1L &&
        batch(5L).getAs[Long]("n_phones") === 1L &&
        batch(5L).getAs[Long]("n_ips") === 1L)
      // no residual PII in any masked output
      for (re <- Seq(graft.operators.TextAnalysis.EmailRe,
          graft.operators.TextAnalysis.PhoneRe,
          graft.operators.TextAnalysis.IpRe);
          r <- stream.values)
        assert(re.r.findAllIn(r.getAs[String]("masked")).isEmpty)

      // windowed counters: first window (docs 1-3), second (4-5)
      val w = spark.table("pii_counts")
        .filter(col("window_start") < new Timestamp(t0 + 300 * 1000))
        .collect().map(r =>
          r.getAs[Timestamp]("window_start").getTime -> r).toMap
      val w1 = w(t0)
      assert(w1.getAs[Long]("docs") === 3L)
      assert(w1.getAs[Long]("docs_with_pii") === 3L)
      assert(w1.getAs[Long]("emails") === 2L)
      assert(w1.getAs[Long]("phones") === 1L)
      assert(w1.getAs[Long]("ips") === 2L)
      val w2 = w(t0 + 60 * 1000)
      assert(w2.getAs[Long]("docs") === 2L)
      assert(w2.getAs[Long]("docs_with_pii") === 1L)
      assert(w2.getAs[Long]("emails") === 1L)
      assert(w2.getAs[Long]("phones") === 1L)
      assert(w2.getAs[Long]("ips") === 1L)
      // batch run of the same counter code agrees
      val batchW = PiiScrubStream.piiCounts(docs.toDF())
        .filter(col("window_start") < new Timestamp(t0 + 300 * 1000))
        .collect().map(r =>
          r.getAs[Timestamp]("window_start").getTime -> r).toMap
      for ((k, r) <- batchW; c <- Seq("docs", "docs_with_pii", "emails",
          "phones", "ips"))
        assert(r.getAs[Long](c) === w(k).getAs[Long](c), s"$c window $k")
    } finally { scrubbed.stop(); counts.stop() }
  }
}
