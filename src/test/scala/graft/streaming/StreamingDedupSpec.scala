package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.operators.Dedup
import graft.streaming.StreamingDedup.DocEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L
  private def doc(id: Long, text: String, offsetSec: Long = 0) =
    DocEvent(id, text, new Timestamp(t0 + offsetSec * 1000))

  // planted near-dup pairs (one-word edits of >8-token sentences) in
  // a bed of unrelated documents
  private val base =
    "the quick brown fox jumps over the lazy dog near the riverbank today"
  private val docs = Seq(
    doc(1, base),
    doc(2, base.replace("quick", "swift"), 10),
    doc(3, "completely unrelated text about spark sql shuffle partitions and joins", 20),
    doc(4, base.replace("today", "tonight"), 30),
    doc(5, "another standalone document mentioning parquet files and column pruning", 40),
    doc(6, "streaming state stores keep keyed aggregates across micro batch boundaries", 50))

  private def runStream(batches: Seq[Seq[DocEvent]]): Seq[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = StreamingDedup.detectStream(mem.toDS())
      .writeStream.format("memory").queryName("neardups")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("neardups")
        .select(least(col("doc_id"), col("prior_doc_id")),
          greatest(col("doc_id"), col("prior_doc_id")))
        .distinct().as[(Long, Long)].collect().toSeq.sorted
    } finally q.stop()
  }

  private def batchPairs(ds: Seq[DocEvent]): Seq[(Long, Long)] = {
    val df = ds.toDF()
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text")
    Dedup.lshCandidatePairs(sigs, "doc_id")
      .as[(Long, Long)].collect().toSeq.sorted
  }

  test("stream candidate pairs equal the batch LSH formulation") {
    val streamed = runStream(Seq(docs))
    val batch = batchPairs(docs)
    assert(batch.nonEmpty, "fixture must plant at least one colliding pair")
    assert(streamed === batch)
  }

  test("state carries across micro-batches: late doc pairs with earlier one") {
    val streamed = runStream(Seq(docs.take(3), docs.drop(3)))
    val batch = batchPairs(docs)
    assert(streamed === batch) // doc 4 (batch 2) still finds doc 1/2 (batch 1)
  }

  test("bucket FIFO cap bounds state without losing fresh collisions") {
    // 3 mutually-colliding docs with cap 1: only the MOST RECENT
    // entry survives per bucket, so each arrival pairs with exactly
    // the previous doc — a sliding dedup horizon, never unbounded
    implicit val sqlCtx = spark.sqlContext
    val trio = Seq(doc(1, base), doc(2, base, 10), doc(3, base, 20))
    val mem = MemoryStream[DocEvent]
    val q = StreamingDedup.detectStream(mem.toDS(), maxBucketDocs = 1)
      .writeStream.format("memory").queryName("neardups_cap")
      .outputMode("append").start()
    try {
      mem.addData(trio); q.processAllAvailable()
      val pairs = spark.table("neardups_cap")
        .select(least(col("doc_id"), col("prior_doc_id")),
          greatest(col("doc_id"), col("prior_doc_id")))
        .distinct().as[(Long, Long)].collect().toSeq.sorted
      assert(pairs === Seq((1L, 2L), (2L, 3L))) // (1,3) evicted by cap
    } finally q.stop()
  }

  test("idle buckets expire via EventTimeTimeout; fresh buckets keep state") {
    implicit val sqlCtx = spark.sqlContext
    def run(idle: String): Seq[(Long, Long)] = {
      val mem = MemoryStream[DocEvent]
      val q = StreamingDedup.detectStream(mem.toDS(),
          watermarkDelay = "1 second", idleTimeout = idle)
        .writeStream.format("memory").queryName("neardups_ttl")
        .outputMode("append").start()
      try {
        // b1: seed the bucket; b2: advance watermark far past the
        // bucket's timeout (different bucket); b3: no data for the
        // seeded bucket -> timeout fires, state removed; b4: identical
        // doc arrives -> pairs only if the bucket survived.
        mem.addData(Seq(doc(1, base, 0))); q.processAllAvailable()
        mem.addData(Seq(doc(99, docs(2).text, 100))); q.processAllAvailable()
        mem.addData(Seq(doc(98, docs(4).text, 102))); q.processAllAvailable()
        mem.addData(Seq(doc(2, base, 105))); q.processAllAvailable()
        spark.table("neardups_ttl")
          .select(least(col("doc_id"), col("prior_doc_id")),
            greatest(col("doc_id"), col("prior_doc_id")))
          .distinct().as[(Long, Long)].collect().toSeq.sorted
      } finally {
        q.stop()
        spark.catalog.dropTempView("neardups_ttl")
      }
    }
    // 5s idle: bucket seeded at t=0 times out once watermark hits 99s
    assert(run("5 seconds") === Seq.empty)
    // 10min idle: same sequence, bucket survives, pair found
    assert(run("10 minutes") === Seq((1L, 2L)))
  }

  test("identical docs estimate jaccard 1.0; near-dups estimate high") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = StreamingDedup.detectStream(mem.toDS())
      .writeStream.format("memory").queryName("neardups_est")
      .outputMode("append").start()
    try {
      mem.addData(Seq(doc(1, base), doc(2, base, 5), doc(4, base.replace("today", "tonight"), 10)))
      q.processAllAvailable()
      val est = spark.table("neardups_est")
        .groupBy("doc_id", "prior_doc_id")
        .agg(max("est_jaccard").as("est"))
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, e) => (math.min(a, b), math.max(a, b)) -> e }.toMap
      assert(est((1L, 2L)) === 1.0)
      assert(est((1L, 4L)) > 0.5)
    } finally q.stop()
  }
}
