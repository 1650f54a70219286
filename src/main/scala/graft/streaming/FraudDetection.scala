package graft.streaming

import java.sql.Timestamp
import graft.telecom.Schemas.{AlertDetails, FraudAlert, FraudState, LastCall}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming fraud detection (SURVEY.md ST1-ST3, J9, W4-W5;
  * reference streaming/flink_jobs/fraud_detection.py:55-204).
  *
  * Rules (identical arithmetic to the reference):
  *  - impossible travel: distance >= 500 km AND implied speed
  *    >= 600 km/h; severity HIGH above 2000 km/h (py:55-59,126-165)
  *  - velocity: more than 25 calls in the trailing 30 minutes
  *    (per-event sliding, NOT tumbling); HIGH above 50 (py:167-200)
  *
  * State per customer = last call (ValueState analog) + pruned recent
  * call list (ListState analog). `flatMapGroupsWithState` receives a
  * whole micro-batch per key, so events are sorted by event time
  * inside the group function to preserve per-event semantics
  * (SURVEY.md §7.4 #3).
  *
  * Scale: state is O(calls in 30 min) per customer, partitioned by
  * customer across executors via the groupByKey shuffle — the exact
  * Flink keyBy topology, with checkpointed state stores.
  */
object FraudDetection {

  case class CallPing(
      customer_id: String, event_id: String, ts: Timestamp,
      lat: Double, lon: Double, tower_id: String)

  val MinDistanceKm = 500.0
  val MinSpeedKmh = 600.0
  val HighSpeedKmh = 2000.0
  val VelocityWindowSec = 1800L
  val VelocityThreshold = 25
  val VelocityHighThreshold = 50

  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * 6371.0 * math.asin(math.sqrt(a))
  }

  /** Pure per-event rule kernel shared by the streaming state function
    * and the batch-parity formulation (single source of truth). */
  def evalEvent(e: CallPing, st: FraudState): (FraudState, Seq[FraudAlert]) = {
    val ts = e.ts.getTime / 1000
    val alerts = Seq.newBuilder[FraudAlert]
    // impossible travel vs previous call
    st.last.foreach { prev =>
      val dist = haversineKm(prev.lat, prev.lon, e.lat, e.lon)
      val dtSec = ts - prev.ts
      if (dtSec > 0 && dist >= MinDistanceKm) {
        val speed = dist / (dtSec / 3600.0)
        if (speed >= MinSpeedKmh) {
          alerts += FraudAlert(
            s"travel_${e.event_id}", "IMPOSSIBLE_TRAVEL",
            if (speed > HighSpeedKmh) "HIGH" else "MEDIUM",
            e.customer_id, e.event_id, e.ts,
            AlertDetails(math.round(dist * 100.0) / 100.0,
              math.round(speed * 100.0) / 100.0, 0))
        }
      }
    }
    // velocity over pruned trailing window (inclusive lower bound)
    val recent = (st.recent :+ (ts, e.event_id)).filter(_._1 >= ts - VelocityWindowSec)
    if (recent.size > VelocityThreshold) {
      alerts += FraudAlert(
        s"velocity_${e.event_id}", "VELOCITY",
        if (recent.size > VelocityHighThreshold) "HIGH" else "MEDIUM",
        e.customer_id, e.event_id, e.ts,
        AlertDetails(0, 0, recent.size))
    }
    (FraudState(Some(LastCall(ts, e.lat, e.lon, e.tower_id)), recent), alerts.result())
  }

  private def processGroup(
      key: String, events: Iterator[CallPing],
      state: GroupState[FraudState]): Iterator[FraudAlert] = {
    var st = state.getOption.getOrElse(FraudState(None, Vector.empty))
    val out = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
      val (newSt, alerts) = evalEvent(e, st)
      st = newSt
      alerts
    }
    state.update(st)
    out.iterator
  }

  /** Streaming entry: watermarked event-time stream → keyed state →
    * alert stream (ST1+ST2+ST3). Works identically on a MemoryStream
    * (tests) or a Kafka source (production). */
  def detectStream(events: Dataset[CallPing]): Dataset[FraudAlert] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 seconds")
      .groupByKey(_.customer_id)
      .flatMapGroupsWithState[FraudState, FraudAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(processGroup)
  }

  /** Alert stream → Kafka record shape with severity ROUTING
    * (reference fraud_detection.py:214-222 publishes HIGH alerts to a
    * priority topic): key = customer (partition affinity per the
    * reference), value = full alert JSON, topic chosen by severity.
    * Pure column transform — unit-tested even without a broker. */
  def alertKafkaRecords(alerts: Dataset[FraudAlert], topicPrefix: String = "fraud_alerts")
      : DataFrame =
    alerts.toDF().select(
      col("customer_id").cast("string").as("key"),
      to_json(struct(col("*"))).as("value"),
      when(col("severity") === "HIGH", s"${topicPrefix}_priority")
        .otherwise(topicPrefix).as("topic"))

  /** Production alert sink: Kafka writer fed by [[alertKafkaRecords]]
    * (per-row topic column does the severity routing). Compile-checked
    * production face — the test container has no Kafka connector, so
    * specs assert the record shape and use a memory sink instead. */
  def startKafkaAlertSink(alerts: Dataset[FraudAlert], bootstrapServers: String,
                          checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    alertKafkaRecords(alerts).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .start()

  /** Batch-parity formulation (W4+W5): LAG window for the previous
    * call + RANGE window for the trailing 30-min count. Used to
    * backfill history and to cross-check the stream (the spec asserts
    * stream ≡ batch on bounded input). */
  def detectBatch(calls: DataFrame): DataFrame = {
    val byCust = Window.partitionBy("customer_id")
      .orderBy(col("ts"), col("event_id"))
    val velocity = Window.partitionBy("customer_id")
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-VelocityWindowSec, 0)
    // RANGE frames include ALL rows tied on the frame timestamp, but
    // the stream counts only events already processed in (ts,
    // event_id) order — subtract same-ts events that sort AFTER this
    // one so batch ≡ stream even when timestamps collide
    val tieWin = Window.partitionBy(col("customer_id"), col("ts").cast("long"))
    val tieOrd = Window.partitionBy(col("customer_id"), col("ts").cast("long"))
      .orderBy(col("ts"), col("event_id")) // stream processing order within the tied second
    val enriched = calls
      .withColumn("prev_ts", lag(col("ts"), 1).over(byCust))
      .withColumn("prev_lat", lag(col("lat"), 1).over(byCust))
      .withColumn("prev_lon", lag(col("lon"), 1).over(byCust))
      .withColumn("calls_30min",
        count(lit(1)).over(velocity) -
          (count(lit(1)).over(tieWin) - row_number().over(tieOrd)))
      .withColumn("dt_sec", col("ts").cast("long") - col("prev_ts").cast("long"))
      .withColumn("dist_km", graft.functions.Funcs.haversineKm(
        col("prev_lat"), col("prev_lon"), col("lat"), col("lon")))
      .withColumn("speed_kmh",
        when(col("dt_sec") > 0, col("dist_km") / (col("dt_sec") / 3600.0)))
    val travel = enriched
      .filter(col("dt_sec") > 0 && col("dist_km") >= MinDistanceKm &&
        col("speed_kmh") >= MinSpeedKmh)
      .select(
        concat(lit("travel_"), col("event_id")).as("alert_id"),
        lit("IMPOSSIBLE_TRAVEL").as("alert_type"),
        when(col("speed_kmh") > HighSpeedKmh, "HIGH").otherwise("MEDIUM").as("severity"),
        col("customer_id"), col("event_id"), col("ts").as("event_ts"),
        round(col("dist_km"), 2).as("distance_km"),
        round(col("speed_kmh"), 2).as("implied_speed_kmh"),
        lit(0).as("window_call_count"))
    val velocityAlerts = enriched
      .filter(col("calls_30min") > VelocityThreshold)
      .select(
        concat(lit("velocity_"), col("event_id")).as("alert_id"),
        lit("VELOCITY").as("alert_type"),
        when(col("calls_30min") > VelocityHighThreshold, "HIGH")
          .otherwise("MEDIUM").as("severity"),
        col("customer_id"), col("event_id"), col("ts").as("event_ts"),
        lit(0.0).as("distance_km"), lit(0.0).as("implied_speed_kmh"),
        col("calls_30min").cast("int").as("window_call_count"))
    travel.unionAll(velocityAlerts)
  }
}
