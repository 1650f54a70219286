package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import java.nio.file.Files

/** Regression guard for the `events.ts` encoding drift that broke 15
  * queries in round 4: the driver's testdata has shipped `ts` as
  * nanos-LongType (round ≤3) and as µs TIMESTAMP with
  * isAdjustedToUTC=false → TimestampNTZType (round 4+). `Tables.events`
  * must normalize EVERY encoding to a µs TimestampType so downstream
  * `unix_micros(ts)` always resolves. Each test writes a fixture in one
  * encoding and asserts both the normalized type and the exact epoch-µs
  * value (the session TZ is UTC, so NTZ→TZ casts must be value-exact).
  */
class EventsLoaderSpec extends SparkSpec {

  // 2024-03-01T12:34:56.789012 UTC
  private val epochUs = 1709296496789012L

  private def writeFixture(schema: StructType, rows: Seq[Row]): String = {
    val dir = Files.createTempDirectory("events-fixture").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def assertNormalized(dir: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"Tables.events must yield TimestampType, got ${ev.schema("ts").dataType}")
    // unix_micros must ANALYZE (this is exactly what broke in round 4)
    // and produce the fixture's epoch value.
    val got = ev.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === epochUs, s"epoch-µs mismatch: $got != $epochUs")
  }

  test("NTZ µs encoding (isAdjustedToUTC=false) normalizes to TimestampType") {
    // Spark writes TimestampNTZType as parquet TIMESTAMP(MICROS, adj=false),
    // matching the driver's round-4+ testdata encoding.
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType)))
    val dir = writeFixture(schema,
      Seq(Row(1L, java.time.LocalDateTime.ofEpochSecond(
        epochUs / 1000000L, (epochUs % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC))))
    // Confirm the fixture round-trips as NTZ before normalization — if
    // Spark's inference ever changes, this spec should fail loudly here.
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType === TimestampNTZType)
    assertNormalized(dir)
  }

  test("legacy nanos-LongType encoding normalizes to TimestampType") {
    // Under spark.sql.legacy.parquet.nanosAsLong=true (set in every
    // graft session), TIMESTAMP(NANOS) reads back as LongType; emulate
    // with a raw long column holding epoch-ns.
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType)))
    val dir = writeFixture(schema, Seq(Row(1L, epochUs * 1000L)))
    assertNormalized(dir)
  }

  test("already-µs TimestampType passes through unchanged") {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    val dir = writeFixture(schema,
      Seq(Row(1L, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(
          epochUs / 1000000L, (epochUs % 1000000L) * 1000L)))))
    assertNormalized(dir)
  }
}
