package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Object-store landing face (S12). The reference flushes micro-batch
  * buffers as parquet objects under a Hive-partitioned run-timestamp
  * key and attaches request metadata {topic, record_count,
  * flush_timestamp} to every PUT
  * (reference processing/bronze/kafka_to_bronze.py:57-88).
  *
  * Zero-egress stand-in: the Hadoop FileSystem API plays the store —
  * the same code path runs unchanged against `s3a://bucket/...` in a
  * real deployment (the URI picks the FS implementation) — and the
  * per-object request metadata lands as a `_meta.json` sidecar, the
  * FS-portable equivalent of S3 object metadata headers.
  */
object ObjectStore {

  /** Hive-partitioned object key for a topic at a run timestamp —
    * mirrors the reference's `events/{topic}/year=/month=/day=/` key
    * scheme (kafka_to_bronze.py:62-67) so downstream engines prune
    * partitions on the raw landing zone. */
  def landingKey(topic: String, runTs: java.time.Instant): String = {
    // Kafka-legal topic names only ([a-zA-Z0-9._-], same charset Kafka
    // enforces): the topic becomes both an object-key path component
    // and a JSON sidecar value, so anything else (quotes, slashes,
    // spaces) would corrupt one or the other — reject loudly instead
    require(topic.nonEmpty && topic.forall(c =>
        c.isLetterOrDigit && c <= 'z' || c == '.' || c == '_' || c == '-'),
      s"topic must match Kafka naming [a-zA-Z0-9._-]+, got '$topic'")
    val d = java.time.LocalDateTime.ofInstant(runTs, java.time.ZoneOffset.UTC)
    f"events/$topic/year=${d.getYear}%04d/month=${d.getMonthValue}%02d/day=${d.getDayOfMonth}%02d"
  }

  private def fs(spark: SparkSession, uri: String): FileSystem =
    FileSystem.get(new URI(uri), spark.sparkContext.hadoopConfiguration)

  /** PUT a micro-batch under the topic's landing key with request
    * metadata. Append mode: each flush adds objects, never rewrites
    * (at-least-once upstream; dedup happens at compaction, S6/A13).
    * The record count is taken from the increment before the write —
    * one extra pass over a micro-batch-sized input, same as the
    * reference counting its buffer. Returns the object prefix. */
  def put(df: DataFrame, bucketPrefix: String, topic: String,
          runTs: java.time.Instant): String = {
    val spark = df.sparkSession
    val dest = s"$bucketPrefix/${landingKey(topic, runTs)}"
    val n = df.count()
    df.write.mode(SaveMode.Append).parquet(dest)
    // topic is validated to [a-zA-Z0-9._-]+ by landingKey, so plain
    // interpolation cannot produce invalid JSON here
    val meta =
      s"""{"topic": "$topic", "record_count": "$n", "flush_timestamp": "$runTs"}"""
    val out = fs(spark, dest).create(new Path(dest, "_meta.json"), true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
    dest
  }

  /** Read back a landed prefix's request metadata sidecar. Parsed as
    * real JSON (not a regex scan) so escaped values round-trip. */
  def metadata(spark: SparkSession, prefix: String): Map[String, String] = {
    val in = fs(spark, prefix).open(new Path(prefix, "_meta.json"))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val row = spark.read
      .json(spark.createDataset(Seq(text))(org.apache.spark.sql.Encoders.STRING))
      .collect()(0)
    row.schema.fieldNames.map(f => f -> String.valueOf(row.getAs[Any](f))).toMap
  }
}
