package graft.streaming

import graft.SparkSpec
import graft.plans.HdrSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Triangulation for the streaming quantile monitor: the Column
  * bucket law must equal the JVM law pointwise, the streaming bucket
  * table must equal the batch run, and the folded quantiles must
  * equal the NATIVE graft_hdr aggregate on the same rows — one law,
  * three execution forms, bit-identical. */
class HdrQuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // skewed latencies spanning the exact and log-linear branches
  private def w1Rows = (0 until 500).map(i =>
    (ts(s"2026-01-01 10:00:${10 + i % 40}"), (i.toLong * i) % 90000L))
  private def w2Rows = (0 until 500).map(i =>
    (ts(s"2026-01-01 10:01:${10 + i % 40}"), (i.toLong * 37) % 3000L))
  private def sentinel = Seq((ts("2026-01-01 10:05:00"), 1L))

  test("Column bucket law ≡ JVM law pointwise (both branches)") {
    val got = spark.range(0, 100000)
      .select(col("id").as("v"), HdrSketch.bucketExpr("v", 5).as("bk"))
      .as[(Long, Long)].collect()
    got.foreach { case (v, bk) =>
      assert(bk === HdrSketch.bucketOf(v, 5).toLong, s"v=$v")
    }
    val lbs = spark.range(0, 100000)
      .select(col("id").as("v"), HdrSketch.bucketExpr("v", 5).as("i"))
      .select(col("v"), HdrSketch.lowerBoundExpr("i", 5).as("lb"),
        col("i"))
      .as[(Long, Long, Long)].collect()
    lbs.foreach { case (v, lb, i) =>
      assert(lb === HdrSketch.lowerBound(i.toInt, 5), s"v=$v")
    }
  }

  test("streaming bucket table ≡ batch; folded quantiles ≡ native graft_hdr") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = HdrQuantileStream.bucketWindows(mem.toDS().toDF("ts", "v"))
      .writeStream.format("memory").queryName("hdr_out")
      .outputMode("append").start()
    try {
      mem.addData(w1Rows)
      q.processAllAvailable()
      mem.addData(w2Rows)
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators.head
      assert(state.numRowsTotal <= 3 * 1888, s"state rows ${state.numRowsTotal}")
    } finally q.stop()

    val streamed = spark.table("hdr_out")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long)].collect().toSet
    val batch = HdrQuantileStream
      .bucketWindows((w1Rows ++ w2Rows ++ sentinel).toDF("ts", "v"))
      .filter(col("window_end") <= ts("2026-01-01 10:02:00"))
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long)].collect().toSet
    assert(streamed == batch, "finalized bucket rows must equal the batch run")

    val folded = HdrQuantileStream.quantiles(spark.table("hdr_out"))
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._3, r._4, r._5, r._6)).toMap

    // the native aggregate on the same rows, windowed in batch
    val native = (w1Rows ++ w2Rows).toDF("ts", "v")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"),
        call_function("graft_hdr", col("v"), lit(5), lit(50)).as("p50"),
        call_function("graft_hdr", col("v"), lit(5), lit(95)).as("p95"),
        call_function("graft_hdr", col("v"), lit(5), lit(99)).as("p99"))
      .select(col("window.start"), col("n"), col("p50"), col("p95"), col("p99"))
      .as[(java.sql.Timestamp, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(folded == native,
      "streamed compositional quantiles must equal the native aggregate")
  }
}
