package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class StreamDoc(doc_id: Long, text: String, event_ts: Timestamp)

/** The streaming decontamination flag must (a) agree with the batch
  * run of the same kernel row for row, and (b) NEVER miss a document
  * the exact gram check finds contaminated — bloom false negatives
  * are impossible, and this spec exercises that guarantee against an
  * exact array-intersect reformulation. */
class DecontamStreamSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L
  private def doc(id: Long, text: String, off: Long) =
    StreamDoc(id, text, new Timestamp(t0 + off * 1000))

  // eval docs 1-2; train docs 10-13 (10 copies eval gram run, 11 has
  // a partial 4-token overlap — NOT a 5-gram collision, 12 clean,
  // 13 shares a run with eval doc 2)
  private val evalDocs = Seq(
    doc(1, "alpha beta gamma delta epsilon zeta", 0),
    doc(2, "one two three four five six seven", 0))
  private val trainDocs = Seq(
    doc(10, "noise alpha beta gamma delta epsilon more noise", 10),
    doc(11, "beta gamma delta epsilon other words entirely here", 20),
    doc(12, "totally unrelated content with no overlap at all", 30),
    doc(13, "zz one two three four five yy", 40))

  test("stream flag ≡ batch flag; no false negatives vs the exact gram check") {
    // build the eval bloom exactly as q239 does
    val evalGrams = evalDocs.toDF()
      .select(explode(DecontamStream.fiveGrams(col("text"))).as("gram"))
      .distinct()
    val nKeys = math.max(evalGrams.count(), 1L)
    val bloomBytes = evalGrams
      .agg(call_function("graft_bloom_agg",
        xxhash64(col("gram")), lit(nKeys)).as("bf"))
      .head().getAs[Array[Byte]](0)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = DecontamStream.flag(mem.toDF(), bloomBytes)
      .select("doc_id", "maybe_contaminated")
      .writeStream.format("memory").queryName("decontam_flags")
      .outputMode("append").start()
    try {
      mem.addData(trainDocs.take(2)); q.processAllAvailable()
      mem.addData(trainDocs.drop(2)); q.processAllAvailable()
      val stream = spark.table("decontam_flags").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val batch = DecontamStream.flag(trainDocs.toDF(), bloomBytes)
        .select("doc_id", "maybe_contaminated").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(stream === batch)

      // exact ground truth: any shared distinct 5-gram
      val exact = trainDocs.toDF()
        .select(col("doc_id"),
          (size(array_intersect(DecontamStream.fiveGrams(col("text")),
            typedLit(evalGrams.as[String].collect().toSeq))) > 0)
            .as("contaminated"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // no false negatives: exact-contaminated ⇒ flagged
      for ((id, c) <- exact if c)
        assert(stream(id), s"bloom missed contaminated doc $id")
      assert(exact(10L) && exact(13L))
      assert(!exact(11L) && !exact(12L))
      // the gate split partitions the stream consistently
      val (clean, sus) = DecontamStream.gate(trainDocs.toDF(), bloomBytes)
      val cleanIds = clean.select("doc_id").as[Long].collect().toSet
      val susIds = sus.select("doc_id").as[Long].collect().toSet
      assert((cleanIds ++ susIds) === trainDocs.map(_.doc_id).toSet)
      assert(cleanIds.intersect(susIds).isEmpty)
      // clean-by-proof: nothing exact-contaminated may land in clean
      for ((id, c) <- exact if c) assert(!cleanIds(id))
    } finally q.stop()
  }
}
