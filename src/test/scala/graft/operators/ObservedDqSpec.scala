package graft.operators

import graft.{SparkSpec, TaskMetricsProfiler}
import org.apache.spark.sql.functions._

/** ObservedDq: write-path metrics equal the separate-pass aggregates,
  * and the observed path scans the input ONCE where write-then-check
  * scans twice. */
class ObservedDqSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L

  test("observed metrics ≡ separate-pass aggregates; input scanned once") {
    // a real parquet input so input-bytes attribution is measurable
    val srcDir = java.nio.file.Files.createTempDirectory("obsdq").toString
    val rows = (0L until 20000L).map { i =>
      (if (i % 97 == 0) null else s"e$i",
        new java.sql.Timestamp(t0 + i * 1000),
        i % 53 == 0) // corrupt flag
    }
    rows.toDF("event_id", "event_ts", "bad")
      .write.mode("overwrite").parquet(s"$srcDir/in")
    val outDir = s"$srcDir/out"

    val profiler = TaskMetricsProfiler.install(spark)
    profiler.reset()
    val in1 = spark.read.parquet(s"$srcDir/in")
    val got = ObservedDq.parquetWithDq(in1, outDir,
      corrupt = col("bad"), key = col("event_id"), ts = col("event_ts"))
    val observedInput = profiler.snapshot(spark).inputBytes

    // separate-pass ground truth over the same input
    val check = spark.read.parquet(s"$srcDir/in").agg(
      count(lit(1)), sum(when(col("bad"), 1L).otherwise(0L)),
      sum(when(col("event_id").isNull, 1L).otherwise(0L)),
      min(unix_micros(col("event_ts"))), max(unix_micros(col("event_ts")))).head
    assert(got("rows") === check.getLong(0))
    assert(got("corrupt") === check.getLong(1))
    assert(got("null_keys") === check.getLong(2))
    assert(got("min_ts_us") === check.getLong(3))
    assert(got("max_ts_us") === check.getLong(4))

    // write-then-check pays a second scan; the observed path did not
    profiler.reset()
    spark.read.parquet(s"$srcDir/in").write.mode("overwrite")
      .parquet(s"$srcDir/out2")
    spark.read.parquet(s"$srcDir/in").agg(count(lit(1)),
      sum(when(col("bad"), 1L).otherwise(0L))).head
    val twoPassInput = profiler.snapshot(spark).inputBytes
    assert(observedInput < twoPassInput * 3 / 4,
      s"observed path should scan once: $observedInput vs two-pass $twoPassInput")

    // and the write actually landed everything
    assert(spark.read.parquet(outDir).count() === 20000L)
  }
}
