package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.streaming.FraudDetection.CallPing
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class FraudDetectionSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L
  private def ping(cust: String, id: String, offsetSec: Long,
                   lat: Double, lon: Double, tower: String = "T1") =
    CallPing(cust, id, new Timestamp(t0 + offsetSec * 1000), lat, lon, tower)

  // NYC → Tokyo in 10 minutes: ~10,800 km → ~65,000 km/h → HIGH
  private val travelCase = Seq(
    ping("C1", "e1", 0, 40.7, -74.0),
    ping("C1", "e2", 600, 35.7, 139.7))
  // 30 calls in 10 minutes → velocity alerts past call #25
  private val burstCase = (0 until 30).map(i =>
    ping("C2", f"b$i%02d", 1000 + i * 20, 10.0, 10.0))
  // normal: 2 calls, nearby towers, 1 hour apart
  private val normalCase = Seq(
    ping("C3", "n1", 0, 40.7, -74.0),
    ping("C3", "n2", 3600, 40.8, -74.1))

  // 27 calls in the SAME second: RANGE-frame ties are where naive
  // batch formulations diverge from per-event stream counting
  private val tieCase = (0 until 27).map(i =>
    ping("C5", f"t$i%02d", 3000, 20.0, 20.0))

  private val allPings = (travelCase ++ burstCase ++ normalCase ++ tieCase)

  private def runStream(pings: Seq[CallPing]): Seq[(String, String, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CallPing]
    val q = FraudDetection.detectStream(mem.toDS())
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      mem.addData(pings)
      q.processAllAvailable()
      spark.table("alerts")
        .select("alert_type", "customer_id", "severity")
        .as[(String, String, String)].collect().toSeq
    } finally q.stop()
  }

  test("stream: impossible travel fires HIGH, velocity fires past threshold, normal silent") {
    val alerts = runStream(allPings)
    assert(alerts.contains(("IMPOSSIBLE_TRAVEL", "C1", "HIGH")))
    assert(alerts.count(a => a._1 == "VELOCITY" && a._2 == "C2") === 5) // calls 26..30 (>25)
    assert(alerts.count(a => a._1 == "VELOCITY" && a._2 == "C5") === 2) // tied-ts calls 26,27
    assert(alerts.forall(_._2 != "C3"))
  }

  test("stream state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CallPing]
    val q = FraudDetection.detectStream(mem.toDS())
      .writeStream.format("memory").queryName("alerts2")
      .outputMode("append").start()
    try {
      mem.addData(travelCase.take(1)); q.processAllAvailable()
      assert(spark.table("alerts2").count() === 0)
      mem.addData(travelCase.drop(1)); q.processAllAvailable()
      val a = spark.table("alerts2").select("alert_type").as[String].collect()
      assert(a.sameElements(Array("IMPOSSIBLE_TRAVEL"))) // state from batch 1 used in batch 2
    } finally q.stop()
  }

  test("batch parity: detectBatch produces the same alert set as the stream") {
    val streamAlerts = runStream(allPings).sorted
    val batchAlerts = FraudDetection.detectBatch(
        allPings.toDF().withColumnRenamed("ts", "ts"))
      .select("alert_type", "customer_id", "severity")
      .as[(String, String, String)].collect().toSeq.sorted
    assert(streamAlerts === batchAlerts)
  }

  test("velocity window prunes: spaced calls never alert") {
    // 30 calls spaced 2 minutes apart → never >25 within 30 min
    val spaced = (0 until 30).map(i => ping("C4", f"s$i%02d", i * 120, 0, 0))
    assert(runStream(spaced).isEmpty)
  }

  test("kafka record shape: severity routes HIGH alerts to the priority topic") {
    import graft.telecom.Schemas.{AlertDetails, FraudAlert}
    val alerts = Seq(
      FraudAlert("travel_e2", "IMPOSSIBLE_TRAVEL", "HIGH", "C1", "e2",
        new Timestamp(t0), AlertDetails(10800.0, 65000.0, 0)),
      FraudAlert("velocity_b26", "VELOCITY", "MEDIUM", "C2", "b26",
        new Timestamp(t0), AlertDetails(0.0, 0.0, 26))).toDS()
    val recs = FraudDetection.alertKafkaRecords(alerts)
    assert(recs.columns.toSeq === Seq("key", "value", "topic"))
    val byTopic = recs.select("topic", "key").as[(String, String)].collect().toMap
    assert(byTopic === Map("fraud_alerts_priority" -> "C1", "fraud_alerts" -> "C2"))
    val sample = recs.select("value").as[String].head()
    assert(sample.contains("\"alert_type\"") && sample.contains("\"customer_id\""))
  }

  test("source selector: default config keeps the supplied fallback stream") {
    val fallback = spark.range(1).toDF()
    assert(MicroBatchIngest.source(spark, Seq("t"), fallback) eq fallback)
  }
}
