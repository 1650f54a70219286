package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Micro-batch Bronze ingest (SURVEY.md S4-S5, ST4; reference
  * processing/bronze/kafka_to_bronze.py:39-162).
  *
  * The reference buffers per topic and flushes at 10k records or
  * 300 s with manual offset commit AFTER the write (at-least-once).
  * Structured Streaming's trigger + checkpoint gives the same flush
  * cadence with exactly-once file-sink semantics — strictly stronger
  * (SURVEY.md §4) — while foreachBatch preserves the reference's
  * Hive-partitioned append layout for downstream partition pruning.
  */
object MicroBatchIngest {

  /** Production Kafka source with the reference's consumer options
    * (reference processing/bronze/kafka_to_bronze.py:90-122):
    * subscription list, startingOffsets, bounded micro-batches via
    * maxOffsetsPerTrigger. The zero-egress test container ships no
    * Kafka connector, so specs drive the MemoryStream/file path; this
    * builder keeps compile-checked option parity for the production
    * face — its output feeds [[parse]] unchanged (topic/partition/
    * offset provenance columns come from the source itself). */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
                  topics: Seq[String], startingOffsets: String = "latest",
                  maxOffsetsPerTrigger: Long = 10000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .option("failOnDataLoss", "false")
      .load()

  /** Source selector: `graft.ingest.source=kafka` (with
    * `graft.ingest.brokers`) flips ingest to the production Kafka
    * face; anything else expects the caller to supply a raw stream
    * (MemoryStream/file in tests). */
  def source(spark: SparkSession, topics: Seq[String],
             fallback: => DataFrame): DataFrame =
    if (spark.conf.getOption("graft.ingest.source").contains("kafka"))
      kafkaSource(spark,
        spark.conf.get("graft.ingest.brokers", "localhost:9092"), topics,
        spark.conf.get("graft.ingest.startingOffsets", "latest"),
        spark.conf.get("graft.ingest.maxOffsetsPerTrigger", "10000").toLong)
    else fallback

  /** Per-topic routing for a multi-topic raw stream — the reference's
    * consumer subscribes to all four topics (three CDR + probes,
    * kafka_to_bronze.py:90-122) and buffers/lands each under its own
    * prefix with its own schema. One upstream source fans out to
    * per-topic parsed streams; each gets its own bronze sink. */
  def topicStream(raw: DataFrame, topic: String, schema: StructType): DataFrame =
    parse(raw.filter(col("topic") === topic), schema, topic)

  /** Parse a raw (value JSON + source metadata) stream into typed rows
    * with provenance columns (reference kafka_to_bronze.py:124-129).
    * `raw` must have columns: value (string), plus optional
    * topic/partition/offset/timestamp for Kafka sources. */
  def parse(raw: DataFrame, schema: StructType, topic: String): DataFrame = {
    val hasKafkaCols = Seq("topic", "partition", "offset").forall(raw.columns.contains)
    val base = raw.select(
      from_json(col("value").cast("string"), schema).as("r"),
      (if (hasKafkaCols) col("topic") else lit(topic)).as("_kafka_topic"),
      (if (hasKafkaCols) col("partition") else lit(0)).cast("int").as("_kafka_partition"),
      // xxhash64(value) stands in for the offset on non-Kafka sources —
      // monotonically_increasing_id() is not allowed on streams
      (if (hasKafkaCols) col("offset").cast("long") else xxhash64(col("value")))
        .as("_kafka_offset"))
    base.select(col("r.*"), col("_kafka_topic"), col("_kafka_partition"),
        col("_kafka_offset"))
      .withColumn("_bronze_ingested_at", current_timestamp())
  }

  /** Streaming exact dedup within the watermark horizon (SURVEY.md
    * ST5's stream-side half): at-least-once replays of the same key
    * inside the lateness bound collapse to one row; later silver
    * dedup windows remain the backstop beyond the horizon. State is
    * bounded by keys-per-watermark-window (unlike dropDuplicates,
    * whose state grows forever on a stream). */
  def dedupStream(parsed: DataFrame, keyCols: Seq[String], eventTsCol: String,
                  watermarkDelay: String = "30 seconds"): DataFrame =
    parsed
      .withWatermark(eventTsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** [[parse]] variant that keeps the raw payload and a parse flag
    * instead of silently nulling failed rows. Failure has TWO shapes:
    * malformed JSON yields an all-null struct with the
    * columnNameOfCorruptRecord channel set, while a null payload or
    * the literal "null" document yields a NULL struct (and a null
    * corrupt column) — so `_parse_ok` requires a non-null struct AND
    * an empty corrupt column. Feed to [[startBronzeSinkDlq]] for
    * dead-letter routing. */
  def parseFlagged(raw: DataFrame, schema: StructType, topic: String): DataFrame = {
    val hasKafkaCols = Seq("topic", "partition", "offset").forall(raw.columns.contains)
    val corruptCol = "_graft_corrupt"
    val schemaWithCorrupt = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    raw.select(
        from_json(col("value").cast("string"), schemaWithCorrupt,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)).as("r"),
        col("value").cast("string").as("_raw_value"),
        (if (hasKafkaCols) col("topic") else lit(topic)).as("_kafka_topic"),
        (if (hasKafkaCols) col("partition") else lit(0)).cast("int").as("_kafka_partition"),
        (if (hasKafkaCols) col("offset").cast("long") else xxhash64(col("value")))
          .as("_kafka_offset"))
      // a null struct (null payload / literal "null" JSON) is a parse
      // failure too — the corrupt-record column can't flag those
      .withColumn("_parse_ok",
        col("r").isNotNull && col(s"r.$corruptCol").isNull)
      .select(col("r.*"), col("_raw_value"), col("_parse_ok"),
        col("_kafka_topic"), col("_kafka_partition"), col("_kafka_offset"))
      .drop(corruptCol)
      .withColumn("_bronze_ingested_at", current_timestamp())
  }

  /** Bronze sink with a dead-letter lane (the streaming face of
    * Silver.quarantineCalls): rows whose payload failed to parse or
    * whose event timestamp is missing land under `dlqPath` with a
    * reason column — IN THE SAME MICRO-BATCH, so at-least-once
    * upstreams never lose a record to silent parse drops (the
    * reference's consumer would crash or skip; a lakehouse triages).
    * Good rows take the usual Hive-partitioned append. */
  def startBronzeSinkDlq(flagged: DataFrame, path: String, dlqPath: String,
                         checkpoint: String, eventTsCol: String,
                         triggerSecs: Int = 300): StreamingQuery =
    flagged.writeStream
      .trigger(Trigger.ProcessingTime(s"$triggerSecs seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val reason = concat_ws(",",
          when(!col("_parse_ok"), "unparseable_payload"),
          when(col("_parse_ok") && col(eventTsCol).isNull, "missing_event_ts"))
        val tagged = batch.withColumn("_dlq_reason", reason).cache()
        try {
          tagged.filter(col("_dlq_reason") =!= "")
            .select(col("_raw_value"), col("_kafka_topic"),
              col("_kafka_partition"), col("_kafka_offset"),
              col("_bronze_ingested_at"), col("_dlq_reason"))
            .write.mode("append").parquet(dlqPath)
          tagged.filter(col("_dlq_reason") === "")
            .drop("_raw_value", "_parse_ok", "_dlq_reason")
            .withColumn("year", year(col(eventTsCol)))
            .withColumn("month", month(col(eventTsCol)))
            .withColumn("day", dayofmonth(col(eventTsCol)))
            .write.mode("append")
            .partitionBy("year", "month", "day")
            .option("compression", "snappy")
            .parquet(path)
        } finally tagged.unpersist()
      }
      .start()

  /** Start the Bronze landing sink: micro-batch trigger, foreachBatch
    * Parquet append partitioned year=/month=/day= (reference
    * kafka_to_bronze.py:57-87). Checkpointed AT-LEAST-ONCE: a batch
    * replayed after a crash mid-append re-lands its rows (the bare
    * parquet append is not replay-idempotent), which is the medallion
    * contract — bronze is the immutable at-least-once landing zone,
    * and silver's PK keep-latest dedup ([[dedupStream]] in-stream,
    * `_rn=1` in batch, oracle-proven q09/q55) is the exactly-once
    * layer every consumer reads through. */
  def startBronzeSink(parsed: DataFrame, path: String, checkpoint: String,
                      eventTsCol: String,
                      triggerSecs: Int = 300): StreamingQuery =
    parsed.writeStream
      .trigger(Trigger.ProcessingTime(s"$triggerSecs seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .withColumn("year", year(col(eventTsCol)))
          .withColumn("month", month(col(eventTsCol)))
          .withColumn("day", dayofmonth(col(eventTsCol)))
          .write.mode("append")
          .partitionBy("year", "month", "day")
          .option("compression", "snappy")
          .parquet(path)
      }
      .start()

  /** One micro-batch's write-path DQ record from the observed bronze
    * sink: rows / corrupt / null_keys / ts min-max, collected on the
    * landing write's own tasks. */
  final case class BatchDq(batchId: Long, metrics: Map[String, Long])

  /** [[startBronzeSink]] with write-path observed-DQ counters — the
    * streaming face of ObservedDq.parquetWithDq (round-9 hardening:
    * the sink's counters previously existed only on the batch face).
    * Every micro-batch's landing write observes (rows, corrupt,
    * null_keys, min/max event time) via Dataset.observe on the SAME
    * tasks that write the files: no second scan per batch, and the
    * numbers cannot drift from what the batch actually landed —
    * exactly the at-scale argument of the batch path, paid per
    * micro-batch. `corrupt` rides `_parse_ok` when the frame carries
    * it (parseFlagged output) and counts 0 otherwise. `onBatch`
    * receives each record as the batch commits — the pipeline
    * runner's hook for gate evaluation without re-reading bronze. */
  def startBronzeSinkObserved(parsed: DataFrame, path: String, checkpoint: String,
                              eventTsCol: String, keyCol: String,
                              onBatch: BatchDq => Unit,
                              triggerSecs: Int = 300): StreamingQuery = {
    val corrupt =
      if (parsed.columns.contains("_parse_ok")) !col("_parse_ok")
      else lit(false)
    parsed.writeStream
      .trigger(Trigger.ProcessingTime(s"$triggerSecs seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val obs = org.apache.spark.sql.Observation()
        val ms = graft.operators.ObservedDq.dqMetrics(
          corrupt, col(keyCol), col(eventTsCol))
        batch.observe(obs, ms.head, ms.tail: _*)
          .withColumn("year", year(col(eventTsCol)))
          .withColumn("month", month(col(eventTsCol)))
          .withColumn("day", dayofmonth(col(eventTsCol)))
          .write.mode("append")
          .partitionBy("year", "month", "day")
          .option("compression", "snappy")
          .parquet(path)
        onBatch(BatchDq(batchId, graft.operators.ObservedDq.toLongMap(obs.get)))
      }
      .start()
  }

  /** Streaming upsert sink — the Iceberg "streaming MERGE" pattern:
    * every micro-batch keep-latest-merges into a SnapshotTable
    * version (Pipeline.mergeSnapshot), so the table always serves
    * the latest row per key AND every micro-batch commit is
    * time-travelable / expirable / rollback-able. Replay-safe by
    * CONTENT, not by commit: an at-least-once redelivery re-merges
    * to the identical row set (keep-latest is idempotent — pinned by
    * spec), though it does append a new snapshot version, which
    * expire() reaps like any other. At 100 TB the merge rewrite is
    * the cost: pair with partition-scoped tables (one snapshot table
    * per coarse partition) so each micro-batch rewrites only the
    * partitions it touches. */
  def startUpsertSink(updates: DataFrame, path: String, checkpoint: String,
                      keyCols: Seq[String], versionCol: String,
                      triggerSecs: Int = 300): StreamingQuery =
    updates.writeStream
      .trigger(Trigger.ProcessingTime(s"$triggerSecs seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // skip empty batches: an empty merge would commit a no-op
        // version on every idle trigger
        if (!batch.isEmpty) {
          graft.telecom.Pipeline.mergeSnapshot(
            batch.sparkSession, batch, path, keyCols, versionCol)
        }
        ()
      }
      .start()
}
