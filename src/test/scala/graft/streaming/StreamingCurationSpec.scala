package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class IngestDoc(doc_id: Long, lang: String, text: String,
                     event_ts: Timestamp)

/** The composed ingest-edge curation chain: quality gate → PII scrub
  * → decontamination flag, stacked in ONE streaming query. All three
  * stages are stateless scan-speed kernels, so the composition needs
  * no extra state, watermark, or output-mode change — the property
  * this spec certifies (plus stream ≡ batch of the SAME composed
  * function, so the chain cannot drift from its batch twin). */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L
  private def doc(id: Long, lang: String, text: String, off: Long) =
    IngestDoc(id, lang, text, new Timestamp(t0 + off * 1000))

  // eval corpus for the decontam bloom
  private val evalDocs = Seq(
    doc(1, "en", "alpha beta gamma delta epsilon zeta", 0))

  private val docs = Seq(
    // survives the gate, carries PII, clean of eval grams
    doc(10, "en", "the catalog keeps statistics and the optimizer is using it to plan the scan so mail bob@corp.io today", 0),
    // survives the gate, contaminated (carries the eval 5-gram run)
    doc(11, "en", "the pipeline is good and it is fine alpha beta gamma delta epsilon end of it", 5),
    // rejected by the gate (repetitive) — PII inside must never reach
    // the kept stream even unmasked
    doc(12, "en", "a a a a a a a a +14155550123", 10),
    // rejected (non-English)
    doc(13, "de", "der plan ist gut und das ist wirklich sehr gut heute ja", 15),
    // survives, no PII, no contamination
    doc(14, "en", "the shuffle is wide and the join is keyed so it is fine to run it in parallel", 20))

  /** The composed chain — one function, applied to stream AND batch. */
  private def chain(in: DataFrame, bloom: Array[Byte]): DataFrame =
    DecontamStream.flag(
      PiiScrubStream.scrub(QualityGateStream.gate(in)), bloom)

  test("gate → scrub → decontam stack in one streaming query, stream ≡ batch") {
    val evalGrams = evalDocs.toDF()
      .select(explode(DecontamStream.fiveGrams(col("text"))).as("gram"))
      .distinct()
    val bloom = evalGrams
      .agg(call_function("graft_bloom_agg",
        xxhash64(col("gram")), lit(math.max(evalGrams.count(), 1L))).as("bf"))
      .head().getAs[Array[Byte]](0)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[IngestDoc]
    val q = chain(mem.toDF(), bloom)
      .select("doc_id", "masked", "pii_found", "maybe_contaminated")
      .writeStream.format("memory").queryName("curation_chain")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(3)); q.processAllAvailable()
      mem.addData(docs.drop(3)); q.processAllAvailable()
      val stream = spark.table("curation_chain").collect()
        .map(r => r.getLong(0) -> r).toMap
      val batch = chain(docs.toDF(), bloom)
        .select("doc_id", "masked", "pii_found", "maybe_contaminated")
        .collect().map(r => r.getLong(0) -> r).toMap

      // same survivors, same values, row for row
      assert(stream.keySet === batch.keySet)
      for (id <- batch.keySet; c <- Seq("masked"))
        assert(stream(id).getAs[String](c) === batch(id).getAs[String](c))
      for (id <- batch.keySet; c <- Seq("pii_found", "maybe_contaminated"))
        assert(stream(id).getAs[Boolean](c) === batch(id).getAs[Boolean](c))

      // the gate dropped 12/13 BEFORE scrub/flag ran — rejected docs
      // (and their PII) never reach the kept lane
      assert(stream.keySet === Set(10L, 11L, 14L))
      // doc 10: PII masked, not contaminated
      assert(stream(10L).getAs[Boolean]("pii_found"))
      assert(!stream(10L).getAs[Boolean]("maybe_contaminated"))
      assert(!stream(10L).getAs[String]("masked").contains("bob@corp.io"))
      assert(stream(10L).getAs[String]("masked").contains("<EMAIL>"))
      // doc 11: contaminated, no PII
      assert(stream(11L).getAs[Boolean]("maybe_contaminated"))
      assert(!stream(11L).getAs[Boolean]("pii_found"))
      // doc 14: clean on every axis
      assert(!stream(14L).getAs[Boolean]("pii_found"))
      assert(!stream(14L).getAs[Boolean]("maybe_contaminated"))
    } finally q.stop()
  }
}
