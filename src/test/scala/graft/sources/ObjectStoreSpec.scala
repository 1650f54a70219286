package graft.sources

import graft.SparkSpec
import graft.telecom.Pipeline
import org.apache.spark.sql.functions._

class ObjectStoreSpec extends SparkSpec {
  import spark.implicits._

  private val runTs = java.time.Instant.parse("2024-01-15T10:30:00Z")

  test("S12: put lands parquet under the hive-partitioned key with metadata sidecar") {
    val bucket = java.nio.file.Files.createTempDirectory("bucket").toString
    val batch = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val prefix = ObjectStore.put(batch, bucket, "call_events", runTs)
    assert(prefix == s"$bucket/events/call_events/year=2024/month=01/day=15")
    assert(spark.read.parquet(prefix).count() == 3)
    val meta = ObjectStore.metadata(spark, prefix)
    assert(meta("topic") == "call_events")
    assert(meta("record_count") == "3")
    assert(meta("flush_timestamp") == "2024-01-15T10:30:00Z")
  }

  test("S12: append semantics — a second flush adds objects, metadata reflects the last PUT") {
    val bucket = java.nio.file.Files.createTempDirectory("bucket").toString
    val prefix = ObjectStore.put(Seq((1L, "a")).toDF("id", "v"), bucket, "t", runTs)
    ObjectStore.put(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), bucket, "t", runTs)
    assert(spark.read.parquet(prefix).count() == 3)
    assert(ObjectStore.metadata(spark, prefix)("record_count") == "2")
  }

  test("S12: non-Kafka-legal topic names are rejected before touching the store") {
    val bucket = java.nio.file.Files.createTempDirectory("bucket").toString
    // a quote would corrupt the JSON sidecar; a slash would escape the
    // key prefix — both are illegal in Kafka topic names, reject loudly
    for (bad <- Seq("""we"ird""", "a/b", "a b", "", "emoji💡")) {
      val e = intercept[IllegalArgumentException] {
        ObjectStore.put(Seq((1L, "a")).toDF("id", "v"), bucket, bad, runTs)
      }
      assert(e.getMessage.contains("Kafka naming"))
    }
    // the full legal charset goes through fine
    val prefix = ObjectStore.put(
      Seq((1L, "a")).toDF("id", "v"), bucket, "A-z.0_9", runTs)
    assert(ObjectStore.metadata(spark, prefix)("topic") == "A-z.0_9")
  }

  test("P8: freshness gate passes at-or-after the SLA horizon and fails when stale") {
    val df = Seq(
      ("x", java.sql.Timestamp.valueOf("2024-01-15 09:00:00")),
      ("y", java.sql.Timestamp.valueOf("2024-01-15 11:00:00"))
    ).toDF("id", "evt_ts")
    assert(Pipeline.isFresh(df, "evt_ts",
      java.sql.Timestamp.valueOf("2024-01-15 10:00:00")))
    assert(!Pipeline.isFresh(df, "evt_ts",
      java.sql.Timestamp.valueOf("2024-01-15 12:00:00")))
  }

  test("S12: runAll persists its manifest as a JSON run record") {
    val out = java.nio.file.Files.createTempDirectory("dagrun").toString
    Pipeline.runAll(spark, out, callEvents = 200)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "run_manifest.json")), "UTF-8")
    Pipeline.lineage.keys.foreach(t => assert(text.contains(s""""table": "$t"""")))
    // parses as ONE auditable run record whose table inventory covers
    // the whole lineage DAG (the round-5 gate-table manifest format)
    val parsed = spark.read.json(Seq(text).toDS())
    assert(parsed.count() == 1)
    val rec = parsed.selectExpr("pipeline_status",
      "size(tables) AS n_tables", "size(checks) AS n_checks").head
    assert(Set("HEALTHY", "DEGRADED", "BLOCKED").contains(rec.getString(0)))
    assert(rec.getAs[Int]("n_tables") == Pipeline.lineage.size)
    assert(rec.getAs[Int]("n_checks") > 0)
  }
}
