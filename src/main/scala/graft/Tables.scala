package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read only what they
  * need — filters/projections stay above the scan so Catalyst pushes
  * them into the parquet reader (column pruning + predicate pushdown,
  * the same layout discipline the reference gets from Hive-style
  * partitioning, cf. reference kafka_to_bronze.py:62-67).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** events.parquet has shipped `ts` under several encodings across
    * testdata regenerations; normalize them all to a µs TimestampType
    * in this one place so every downstream query can assume it:
    *  - TIMESTAMP(NANOS) → LongType under
    *    spark.sql.legacy.parquet.nanosAsLong=true (set in Verify/Bench
    *    sessions); integer DIV, because ns epochs ~1.7e18 exceed
    *    double's 2^53 mantissa and float division would corrupt them.
    *  - µs TIMESTAMP with isAdjustedToUTC=false → TimestampNTZType;
    *    the session TZ is pinned to UTC, so a cast to TimestampType is
    *    value-exact and `unix_micros` matches DuckDB's epoch_us.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for spark.sql surfaces). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
