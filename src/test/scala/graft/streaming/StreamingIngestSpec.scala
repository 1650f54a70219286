package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Specs for micro-batch bronze ingest (ST4/S4-S5) and streaming
  * windowed aggregation (ST7). */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val callSchema = StructType(Seq(
    StructField("event_id", StringType),
    StructField("caller_msisdn", StringType),
    StructField("event_ts", StringType),
    StructField("duration_seconds", LongType)))

  test("streaming upsert sink: micro-batches merge as snapshot versions, replay is a content no-op") {
    import graft.sources.SnapshotTable
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("upsert-sink").toString
    val mem = MemoryStream[(String, Long, String)]
    val q = MicroBatchIngest.startUpsertSink(
      mem.toDF().toDF("id", "v", "payload"),
      s"$dir/tbl", s"$dir/ckpt", Seq("id"), "v", triggerSecs = 1)
    def table = SnapshotTable.read(spark, s"$dir/tbl")
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    try {
      mem.addData(("k1", 1L, "a"), ("k2", 1L, "b"))
      q.processAllAvailable()
      assert(table === Seq(("k1", 1L, "a"), ("k2", 1L, "b")))
      // batch 2 updates k1 and inserts k3 → keep-latest upsert
      mem.addData(("k1", 2L, "a2"), ("k3", 1L, "c"))
      q.processAllAvailable()
      assert(table === Seq(("k1", 2L, "a2"), ("k2", 1L, "b"), ("k3", 1L, "c")))
      // at-least-once redelivery of batch 2's rows: content no-op
      mem.addData(("k1", 2L, "a2"), ("k3", 1L, "c"))
      q.processAllAvailable()
      assert(table === Seq(("k1", 2L, "a2"), ("k2", 1L, "b"), ("k3", 1L, "c")))
    } finally q.stop()
    // every micro-batch commit is a time-travelable version
    val v1 = SnapshotTable.readVersion(spark, s"$dir/tbl", 1)
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    assert(v1 === Seq(("k1", 1L, "a"), ("k2", 1L, "b")))
    assert(SnapshotTable.snapshots(s"$dir/tbl").length === 3)
  }

  test("micro-batch ingest: JSON stream lands as partitioned parquet with provenance") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bronze-ingest").toString
    val mem = MemoryStream[String]
    val parsed = MicroBatchIngest.parse(
      mem.toDF().withColumnRenamed("value", "value"), callSchema, "call_events")
      .withColumn("event_ts_t", to_timestamp(col("event_ts")))
    val q = MicroBatchIngest.startBronzeSink(
      parsed, s"$dir/data", s"$dir/ckpt", "event_ts_t", triggerSecs = 1)
    try {
      mem.addData(
        """{"event_id":"e1","caller_msisdn":"+15551234567","event_ts":"2024-01-01T10:00:00Z","duration_seconds":60}""",
        """{"event_id":"e2","caller_msisdn":"+15559876543","event_ts":"2024-02-15T11:30:00Z","duration_seconds":120}""")
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(s"$dir/data")
    assert(out.count() === 2)
    assert(out.columns.contains("_kafka_topic") && out.columns.contains("_bronze_ingested_at"))
    // Hive partition layout year=/month=/day= drives partition pruning
    val parts = out.select("year", "month", "day").distinct()
      .as[(Int, Int, Int)].collect().toSet
    assert(parts === Set((2024, 1, 1), (2024, 2, 15)))
    assert(new java.io.File(s"$dir/data/year=2024/month=1/day=1").exists())
  }

  test("observed bronze sink: per-micro-batch write-path DQ counters match the landed files") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bronze-observed").toString
    val mem = MemoryStream[String]
    val flagged = MicroBatchIngest.parseFlagged(
      mem.toDF(), callSchema, "call_events")
      .withColumn("event_ts_t", to_timestamp(col("event_ts")))
    val records = new java.util.concurrent.ConcurrentLinkedQueue[MicroBatchIngest.BatchDq]()
    val q = MicroBatchIngest.startBronzeSinkObserved(
      flagged, s"$dir/data", s"$dir/ckpt", "event_ts_t", "event_id",
      records.add(_), triggerSecs = 1)
    try {
      // batch 1: two good rows + one unparseable payload
      mem.addData(
        """{"event_id":"e1","caller_msisdn":"+15551234567","event_ts":"2024-01-01T10:00:00Z","duration_seconds":60}""",
        """{"event_id":"e2","caller_msisdn":"+15559876543","event_ts":"2024-02-15T11:30:00Z","duration_seconds":120}""",
        """not json at all""")
      q.processAllAvailable()
      // batch 2: one good row + one null-key row
      mem.addData(
        """{"event_id":"e3","caller_msisdn":"+15550000001","event_ts":"2024-03-01T09:00:00Z","duration_seconds":30}""",
        """{"event_id":null,"caller_msisdn":"+15550000002","event_ts":"2024-03-02T09:00:00Z","duration_seconds":45}""")
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val dq = records.asScala.toSeq.sortBy(_.batchId)
    assert(dq.size === 2, s"expected one record per micro-batch, got $dq")
    def total(k: String) = dq.map(_.metrics(k)).sum
    assert(total("rows") === 5)
    assert(total("corrupt") === 1)
    // the corrupt payload parses to all-null fields, so its key is
    // null too: 1 (corrupt) + 1 (explicit null key)
    assert(total("null_keys") === 2)

    // parity: the observed counters equal a separate scan of the
    // landed files — the claim is they measure what was WRITTEN
    val out = spark.read.parquet(s"$dir/data")
    assert(out.count() === total("rows"))
    assert(out.filter(!col("_parse_ok")).count() === total("corrupt"))
    assert(out.filter(col("event_id").isNull).count() === total("null_keys"))
    val Seq((mn, mx)) = out.agg(
        min(unix_micros(col("event_ts_t"))), max(unix_micros(col("event_ts_t"))))
      .as[(Long, Long)].collect().toSeq
    assert(dq.map(_.metrics("min_ts_us")).filter(_ != 0L).min === mn)
    assert(dq.map(_.metrics("max_ts_us")).max === mx)
  }

  test("multi-topic consumer: call/data/sms route to per-topic bronze with their own schemas") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bronze-multi").toString
    import org.apache.spark.sql.Encoders
    // provenance columns are ADDED at ingest (kafka_to_bronze.py:124-129),
    // so the wire payload and its schema exclude them
    val prov = Set("_kafka_topic", "_kafka_partition", "_kafka_offset",
      "_bronze_ingested_at")
    def payloadSchema(s: StructType) = StructType(s.filterNot(f => prov(f.name)))
    // the reference's 30/60/10 weighted mix across three CDR topics
    val calls = graft.telecom.Generators.callEvents(spark, n = 30)
      .drop(prov.toSeq: _*).toJSON.collect().map(("call_events", _))
    val data = graft.telecom.Generators.dataSessionEvents(spark, n = 60)
      .toJSON.collect().map(("data_session_events", _))
    val sms = graft.telecom.Generators.smsEvents(spark, n = 10)
      .toJSON.collect().map(("sms_events", _))
    val mem = MemoryStream[(String, String)]
    val raw = mem.toDF().toDF("topic", "value")
    val topics = Seq(
      ("call_events",
        payloadSchema(Encoders.product[graft.telecom.Schemas.CallEvent].schema),
        "call_start_timestamp"),
      ("data_session_events", Encoders.product[graft.telecom.Schemas.DataSessionEvent].schema,
        "session_start_timestamp"),
      ("sms_events", Encoders.product[graft.telecom.Schemas.SmsEvent].schema,
        "timestamp"))
    val queries = topics.map { case (t, sch, tsCol) =>
      val parsed = MicroBatchIngest.topicStream(raw, t, sch)
        .withColumn("_event_ts", to_timestamp(col(tsCol)))
      MicroBatchIngest.startBronzeSink(
        parsed, s"$dir/$t", s"$dir/ckpt-$t", "_event_ts", triggerSecs = 1)
    }
    try {
      mem.addData(calls ++ data ++ sms)
      queries.foreach(_.processAllAvailable())
    } finally queries.foreach(_.stop())
    val landedCalls = spark.read.parquet(s"$dir/call_events")
    val landedData = spark.read.parquet(s"$dir/data_session_events")
    val landedSms = spark.read.parquet(s"$dir/sms_events")
    // callEvents injects duplicates + planted fraud rows, so compare
    // against the actual payload counts, not the nominal n
    assert(landedCalls.count() === calls.length)
    assert(landedData.count() === data.length && data.length === 60)
    assert(landedSms.count() === sms.length && sms.length === 10)
    // each topic keeps its own shape (no lossy common schema)
    assert(landedCalls.columns.contains("call_result_code"))
    assert(landedData.columns.contains("bytes_downloaded") &&
      landedData.columns.contains("radio_technology"))
    assert(landedSms.columns.contains("delivery_status"))
    // provenance carries the true topic per lane
    assert(landedData.select("_kafka_topic").distinct()
      .as[String].collect().toSeq == Seq("data_session_events"))
    // and the payloads are faithful: deterministic generator re-run matches
    val sumBytes = landedData.agg(sum("total_bytes")).head().getLong(0)
    val expected = graft.telecom.Generators.dataSessionEvents(spark, n = 60)
      .agg(sum("total_bytes")).head().getLong(0)
    assert(sumBytes === expected)
  }

  test("dead-letter lane: unparseable and ts-less rows land in the DLQ, good rows in bronze") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bronze-dlq").toString
    val mem = MemoryStream[String]
    val flagged = MicroBatchIngest.parseFlagged(mem.toDF(), callSchema, "call_events")
      .withColumn("event_ts_t", to_timestamp(col("event_ts")))
    val q = MicroBatchIngest.startBronzeSinkDlq(
      flagged, s"$dir/data", s"$dir/dlq", s"$dir/ckpt", "event_ts_t", triggerSecs = 1)
    try {
      mem.addData(
        """{"event_id":"ok1","caller_msisdn":"+15551234567","event_ts":"2024-01-01T10:00:00Z","duration_seconds":60}""",
        """this is not json at all""",
        """null""",
        """{"event_id":"nots","caller_msisdn":"+15550000001","duration_seconds":5}""",
        """{"event_id":"ok2","caller_msisdn":"+15559876543","event_ts":"2024-02-15T11:30:00Z","duration_seconds":120}""")
      q.processAllAvailable()
    } finally q.stop()

    val good = spark.read.parquet(s"$dir/data")
    assert(good.count() === 2)
    assert(good.select("event_id").as[String].collect().toSet === Set("ok1", "ok2"))
    assert(!good.columns.contains("_raw_value") && !good.columns.contains("_dlq_reason"))
    val dlq = spark.read.parquet(s"$dir/dlq")
    val reasons = dlq.select("_dlq_reason").as[String].collect().sorted
    // literal "null" JSON parses to a null struct — a parse failure,
    // not a missing-timestamp row
    assert(reasons === Array("missing_event_ts", "unparseable_payload", "unparseable_payload"))
    // the raw payload is preserved verbatim for replay after a fix
    assert(dlq.filter(col("_dlq_reason") === "unparseable_payload")
      .select("_raw_value").as[String].head() === "this is not json at all")
  }

  test("streaming windowed agg: append mode emits finalized windows past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val probes = mem.toDF().toDF("probe_ts", "tower_id", "load_pct")
    val q = WindowedAggs.towerLoadWindows(probes, "1 hour", "10 seconds")
      .writeStream.format("memory").queryName("winagg").outputMode("append").start()
    val t0 = 1704067200000L // 2024-01-01T00:00Z
    def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)
    try {
      mem.addData((ts(60), "T1", 50.0), (ts(120), "T1", 94.0), (ts(180), "T2", 70.0))
      q.processAllAvailable()
      // windows still open — nothing finalized yet
      assert(spark.table("winagg").count() === 0)
      // event 2h later closes the first hour's windows
      mem.addData((ts(7200), "T1", 10.0))
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .select("tower_id", "avg_load_pct", "max_load_pct", "critical_count", "probe_count")
        .as[(String, Double, Double, Long, Long)].collect().sortBy(_._1)
      assert(rows.length === 2)
      assert(rows(0) === (("T1", 72.0, 94.0, 1L, 2L)))
      assert(rows(1) === (("T2", 70.0, 70.0, 0L, 1L)))
    } finally q.stop()
  }

  test("windowed agg code path also runs in batch mode (unified semantics)") {
    val t0 = 1704067200000L
    val batch = Seq(
      (new Timestamp(t0 + 60000), "T1", 50.0),
      (new Timestamp(t0 + 120000), "T1", 94.0)
    ).toDF("probe_ts", "tower_id", "load_pct")
    val out = WindowedAggs.towerLoadWindows(batch)
      .select("tower_id", "probe_count").as[(String, Long)].collect()
    assert(out.toSeq === Seq(("T1", 2L)))
  }

  test("streaming dedup within watermark collapses at-least-once replays") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val df = mem.toDF().toDF("event_id", "event_ts", "value")
    val q = MicroBatchIngest.dedupStream(df, Seq("event_id"), "event_ts", "1 minute")
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    val t0 = 1704067200000L
    try {
      mem.addData(("e1", new Timestamp(t0), 1.0), ("e1", new Timestamp(t0 + 1000), 1.0))
      q.processAllAvailable()
      mem.addData(("e1", new Timestamp(t0 + 5000), 1.0), ("e2", new Timestamp(t0 + 6000), 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedupstream").select("event_id")
        .as[String].collect().sorted
      assert(ids.toSeq === Seq("e1", "e2")) // replays within watermark collapsed
    } finally q.stop()
  }

  test("session_window streaming sessionization: gap splits, finalized by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val events = mem.toDF().toDF("event_ts", "user_id", "value")
    val q = WindowedAggs.userSessions(events, gap = "10 minutes", watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    val t0 = 1704067200000L
    def ts(sec: Long) = new Timestamp(t0 + sec * 1000)
    try {
      // session 1: three events within 10-min gaps; session 2: 30 min later
      mem.addData((ts(0), 7L, 1.0), (ts(300), 7L, 2.0), (ts(600), 7L, 3.0))
      q.processAllAvailable()
      mem.addData((ts(2400), 7L, 4.0))
      q.processAllAvailable()
      // the ts(2400) batch advanced the watermark past session 1's
      // close (600s + 10min gap) → exactly that session finalized
      assert(spark.table("sessions").count() === 1)
      mem.addData((ts(7200), 7L, 5.0)) // watermark sails past both sessions
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user_id", "event_count", "session_value")
        .as[(Long, Long, Double)].collect().sortBy(_._3)
      assert(rows.toSeq === Seq((7L, 3L, 6.0), (7L, 1L, 4.0)).sortBy(_._3))
    } finally q.stop()
  }
}
