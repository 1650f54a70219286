package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the ingest-edge top-k monitor: the windowed
  * Misra–Gries sketch built incrementally across micro-batches must
  * fold to the same top-k as the batch run on the same rows, and —
  * in the no-decrement regime — to the EXACT per-key counts, for any
  * arrival order. State stays bounded by the sketch capacity, not by
  * the distinct-key universe. */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // skewed key frequencies (i % k favors low ids via the mod bias),
  // split across two windows; a sentinel advances the watermark
  private def w1Rows = (0 until 500).map(i =>
    (ts(s"2026-01-01 10:00:${10 + i % 40}"), s"k${i % 37}"))
  private def w2Rows = (0 until 500).map(i =>
    (ts(s"2026-01-01 10:01:${10 + i % 40}"), s"k${(i * i) % 53}"))
  private def sentinel = Seq((ts("2026-01-01 10:05:00"), "sentinel"))

  test("streaming top-5 across micro-batches ≡ batch ≡ exact counts; bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = TopKStream.sketchWindows(mem.toDS().toDF("ts", "key"),
        capacity = 64, windowDuration = "1 minute",
        watermarkDelay = "2 minutes") // > the 2-window span, so split
        // batches can carry rows of both windows without late drops
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      // deliberately shuffled arrival WITHIN each batch (MG exactness
      // in the no-decrement regime must not depend on order); both
      // batches carry rows of both windows but only within the 30 s
      // watermark delay — a later batch must not push the watermark
      // past a window that still has rows in flight
      val rnd = new scala.util.Random(11)
      val mixed = rnd.shuffle(w1Rows ++ w2Rows)
      mem.addData(mixed.take(500))
      q.processAllAvailable()
      mem.addData(mixed.drop(500))
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators.head
      // one sketch row per in-flight window — N windows, not N keys
      assert(state.numRowsTotal <= 3, s"state rows ${state.numRowsTotal}")
    } finally q.stop()

    val landed = spark.table("topk_out")
    val streamed = TopKStream.topK(landed, 5)
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, String, Long, Int)]
      .collect().toSet
    val batch = TopKStream.topK(
        TopKStream.sketchWindows(
            (w1Rows ++ w2Rows ++ sentinel).toDF("ts", "key"), capacity = 64,
            windowDuration = "1 minute")
          .filter(col("window_end") <= ts("2026-01-01 10:02:00")), 5)
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, String, Long, Int)]
      .collect().toSet
    assert(streamed == batch, "top-k rows must be identical stream vs batch")

    // exactness against a plain Scala count (the regime contract:
    // 37 and 53 distinct keys, capacity 64 → no decrement fired)
    val exact = (w1Rows ++ w2Rows).groupBy(r =>
        (ts(s"2026-01-01 10:0${if (r._1.toString.contains("10:00:")) 0 else 1}:00"), r._2))
      .view.mapValues(_.size.toLong).toMap
    streamed.foreach { case (ws, _, n, item, cnt, _) =>
      assert(exact((ws, item)) === cnt, s"window $ws item $item")
      assert(n === 500L)
    }
    // ranks are a correct top-5: every reported count >= every
    // unreported count in its window
    val reported = streamed.groupBy(_._1)
    reported.foreach { case (ws, rows) =>
      assert(rows.size === 5)
      val minReported = rows.map(_._5).min
      val unreported = exact.collect {
        case ((w, item), c) if w == ws && !rows.exists(_._4 == item) => c }
      assert(unreported.forall(_ <= minReported), s"window $ws")
    }
  }
}
