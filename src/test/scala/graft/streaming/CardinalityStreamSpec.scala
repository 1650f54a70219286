package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the ingest-edge cardinality monitor: the
  * windowed HLL register table built incrementally across
  * micro-batches must equal the batch run on the same rows, and the
  * folded estimates must be bit-identical (dyadic-exact Σ2^(−r)). */
class CardinalityStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // two 1-minute windows with overlapping key sets + heavy duplication
  // (duplicates are the monitor's whole point), then a sentinel window
  // whose arrival pushes the watermark past both real windows
  private def w1Rows = (0 until 400).map(i =>
    (ts(s"2026-01-01 10:00:${10 + i % 40}"), s"user${i % 150}"))
  private def w2Rows = (0 until 400).map(i =>
    (ts(s"2026-01-01 10:01:${10 + i % 40}"), s"user${i % 300 + 100}"))
  private def sentinel = Seq((ts("2026-01-01 10:05:00"), "sentinel"))

  test("streaming register table across micro-batches ≡ batch; estimates bit-equal") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = CardinalityStream.registerWindows(mem.toDS().toDF("ts", "key"))
      .writeStream.format("memory").queryName("card_out")
      .outputMode("append").start()
    try {
      mem.addData(w1Rows)
      q.processAllAvailable()
      mem.addData(w2Rows)
      q.processAllAvailable()
      mem.addData(sentinel) // advances the watermark, finalizing w1+w2
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators.head
      // bounded by construction: <= (windows in flight) x 64 registers,
      // never the 450-key distinct universe
      assert(state.numRowsTotal <= 3 * 64, s"state rows ${state.numRowsTotal}")
    } finally q.stop()

    val streamed = spark.table("card_out")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long)].collect().toSet
    val batch = CardinalityStream
      .registerWindows((w1Rows ++ w2Rows ++ sentinel).toDF("ts", "key"))
      .filter(col("window_end") <= ts("2026-01-01 10:02:00"))
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long)].collect().toSet
    assert(streamed == batch, "finalized register rows must equal the batch run")
    assert(streamed.groupBy(r => r._1).forall(_._2.size <= 64))

    val se = CardinalityStream.estimates(spark.table("card_out"))
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Double, Double)]
      .collect().toSet
    val be = CardinalityStream.estimates(
        CardinalityStream.registerWindows(
            (w1Rows ++ w2Rows ++ sentinel).toDF("ts", "key"))
          .filter(col("window_end") <= ts("2026-01-01 10:02:00")))
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Double, Double)]
      .collect().toSet
    assert(se == be, "estimates must be bit-identical stream vs batch")

    // the estimate tracks truth within the m=64 error regime
    val trueDistinct = Map(
      ts("2026-01-01 10:00:00") -> w1Rows.map(_._2).distinct.size,
      ts("2026-01-01 10:01:00") -> w2Rows.map(_._2).distinct.size)
    se.foreach { case (ws, _, _, _, est) =>
      val t = trueDistinct(ws).toDouble
      assert(est > 0.5 * t && est < 2.0 * t, s"window $ws est=$est true=$t")
    }
  }
}
