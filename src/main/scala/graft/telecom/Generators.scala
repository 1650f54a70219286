package graft.telecom

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import Schemas._

/** Deterministic seeded generators mirroring the reference's producers
  * (SURVEY.md S1-S3; reference cdr_producer.py:168-235,
  * network_probe_producer.py:38-107, crm_batch_ingestor.py:65-108).
  *
  * Same distributions (30% calls weighting via event mix collapsed to
  * the call topic here, 5% failed calls with null end-ts, random-walk
  * probe load with spike injection) but fully deterministic: one
  * fixed-seed RNG stream per entity, generated on the DRIVER only for
  * test-fixture sizes; the parallelized variant distributes
  * per-partition seeds for scale testing.
  */
object Generators {

  private val baseTs = 1704067200000L // 2024-01-01T00:00:00Z

  def towers(n: Int = 10): Seq[Tower] =
    (0 until n).map { i =>
      Tower(f"TWR$i%03d", s"Tower $i", Seq("north", "south", "east", "west")(i % 4),
        40.0 + i * 0.5, -74.0 + i * 0.7, 10.0 + (i % 4) * 10.0,
        Seq("4G", "5G")(i % 2))
    }

  /** Call events with controlled anomalies: dupRate exact duplicates
    * (at-least-once replay), failRate failed calls (null end-ts),
    * plus two planted fraud patterns — an impossible-travel pair and
    * a velocity burst — for the fraud-detection specs. */
  /** One event from a per-index seeded RNG — the parallelism-safe
    * determinism scheme: row i's content depends only on (seed, i),
    * never on partition layout or generation order. */
  private def callEventAt(i: Long, n: Long, seed: Long,
                          dupRate: Double, failRate: Double,
                          tw: IndexedSeq[Tower]): Seq[CallEvent] = {
    val rnd = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
    val custId = f"CUST${rnd.nextInt(200)}%04d"
    val tower = tw(rnd.nextInt(tw.length))
    val startMs = baseTs + rnd.nextInt(72 * 3600) * 1000L
    val failed = rnd.nextDouble() < failRate
    val dur = if (failed) 0L else 10L + rnd.nextInt(3600)
    val ev = CallEvent(
      event_id = f"EVT$i%08d",
      event_type = "call",
      caller_msisdn = f"+1555${rnd.nextInt(10000000)}%07d",
      callee_msisdn = f"+1555${rnd.nextInt(10000000)}%07d",
      caller_customer_id = custId,
      tower_id = tower.tower_id,
      cell_lat = tower.latitude + (rnd.nextDouble() - 0.5) * 0.01,
      cell_lon = tower.longitude + (rnd.nextDouble() - 0.5) * 0.01,
      call_start_timestamp = new Timestamp(startMs).toInstant.toString,
      call_end_timestamp =
        if (failed) None else Some(new Timestamp(startMs + dur * 1000).toInstant.toString),
      duration_seconds = dur,
      call_result_code = if (failed) "FAILED" else if (rnd.nextDouble() < 0.02) "DROPPED" else "COMPLETED",
      roaming = rnd.nextDouble() < 0.1,
      revenue_usd = math.round(dur * 0.0015 * 100.0) / 100.0,
      _kafka_topic = "call_events",
      _kafka_partition = (i % 4).toInt,
      _kafka_offset = i,
      _bronze_ingested_at = new Timestamp(startMs + 60000 + rnd.nextInt(600000)))
    // corrupt-record injection (FIXTURES.md contract: NULL msisdn /
    // NULL tower / negative duration) — P2's hard filter and the q81
    // quarantine audit need real prey. event_id/ts/lat/lon stay valid
    // so the fraud path (which reads bronze pre-silver) is unaffected.
    val corrupted = rnd.nextDouble() match {
      case d if d < 0.004 => ev.copy(caller_msisdn = null)
      case d if d < 0.008 => ev.copy(tower_id = null)
      case d if d < 0.012 => ev.copy(duration_seconds = -1L - rnd.nextInt(100))
      case _ => ev
    }
    // at-least-once duplicate with later ingest time (W1 dedup prey)
    if (rnd.nextDouble() < dupRate)
      Seq(corrupted, corrupted.copy(_bronze_ingested_at =
        new Timestamp(corrupted._bronze_ingested_at.getTime + 120000), _kafka_offset = n + i))
    else Seq(corrupted)
  }

  def callEvents(spark: SparkSession, n: Int = 2000, seed: Long = 42L,
                 dupRate: Double = 0.02, failRate: Double = 0.05): Dataset[CallEvent] = {
    import spark.implicits._
    val tw = towers().toIndexedSeq
    // generated on EXECUTORS: spark.range distributes the index space,
    // per-index seeds keep it deterministic at any partition count
    val base = spark.range(0, n).flatMap(
      (i: java.lang.Long) => callEventAt(i, n, seed, dupRate, failRate, tw))
    // sanitized template: planted fraud/burst rows must never inherit
    // an injected corruption (silver would drop them)
    val template = callEventAt(0, n, seed, dupRate = 0, failRate = 0, tw).head
      .copy(caller_msisdn = "+15550000000", tower_id = tw.head.tower_id,
        duration_seconds = 60L)
    // planted impossible travel: same customer, 2 towers ~9700km apart, 10 min gap
    val fraudTravel = Seq(
      template.copy(event_id = "EVTFRAUD01", caller_customer_id = "CUSTFRAUD",
        tower_id = "TWRNYC", cell_lat = 40.7, cell_lon = -74.0,
        call_start_timestamp = new Timestamp(baseTs + 1000000L).toInstant.toString),
      template.copy(event_id = "EVTFRAUD02", caller_customer_id = "CUSTFRAUD",
        tower_id = "TWRTYO", cell_lat = 35.7, cell_lon = 139.7,
        call_start_timestamp = new Timestamp(baseTs + 1600000L).toInstant.toString))
    // planted velocity burst: 30 calls in 10 minutes
    val burst = (0 until 30).map(j =>
      template.copy(event_id = f"EVTBURST$j%02d", caller_customer_id = "CUSTBURST",
        call_start_timestamp = new Timestamp(baseTs + 2000000L + j * 20000L).toInstant.toString))
    base.union((fraudTravel ++ burst).toDS())
  }

  /** data_session_events generator mirroring the reference's
    * distributions (cdr_producer.py:110-139): duration 30-7200 s,
    * heavy download skew, 5G-weighted radio tech, 5% roaming,
    * revenue = total MB × 0.001 at 6 dp. Per-index seeded like
    * callEvents — content depends only on (seed, i). */
  def dataSessionEvents(spark: SparkSession, n: Int = 2000,
                        seed: Long = 45L): Dataset[DataSessionEvent] = {
    import spark.implicits._
    val tw = towers().toIndexedSeq
    val contentTypes = IndexedSeq("streaming_video", "social_media",
      "web_browsing", "voip", "gaming", "file_download")
    val radio = IndexedSeq("4G_LTE", "5G_NR", "5G_NR", "5G_MMWAVE")
    val plans = IndexedSeq("Basic", "Standard", "Premium", "Unlimited", "Business")
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
      val tower = tw(rnd.nextInt(tw.length))
      val startMs = baseTs + rnd.nextInt(72 * 3600) * 1000L
      val dur = 30L + rnd.nextInt(7171)
      val dl = 1024L + (rnd.nextDouble() * 499999000L).toLong
      val ul = 512L + (rnd.nextDouble() * 49999000L).toLong
      val ts = new Timestamp(startMs).toInstant.toString
      DataSessionEvent(
        event_id = f"DSE$i%08d",
        event_type = "DATA_SESSION",
        subscriber_msisdn = f"+1555${rnd.nextInt(10000000)}%07d",
        customer_id = f"CUST${rnd.nextInt(200)}%04d",
        tower_id = tower.tower_id,
        tower_city = s"City ${tower.tower_id.drop(3).toInt % 4}",
        tower_state = tower.region,
        session_start_timestamp = ts,
        session_duration_seconds = dur,
        bytes_downloaded = dl,
        bytes_uploaded = ul,
        total_bytes = dl + ul,
        content_type = contentTypes(rnd.nextInt(contentTypes.length)),
        radio_technology = radio(rnd.nextInt(radio.length)),
        signal_strength_dbm = -110 + rnd.nextInt(61),
        packet_loss_pct = math.round(rnd.nextDouble() * 5 * 100.0) / 100.0,
        latency_ms = 5 + rnd.nextInt(196),
        plan_type = plans(rnd.nextInt(plans.length)),
        roaming = rnd.nextDouble() < 0.05,
        revenue_usd = math.round((dl + ul) / 1000000.0 * 0.001 * 1e6) / 1e6,
        ingested_at = ts)
    }
  }

  /** sms_events generator (cdr_producer.py:142-157): P2P/A2P, delivery
    * status weighted 92/5/3, message size 10-160 bytes. */
  def smsEvents(spark: SparkSession, n: Int = 2000,
                seed: Long = 46L): Dataset[SmsEvent] = {
    import spark.implicits._
    val tw = towers().toIndexedSeq
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
      val tower = tw(rnd.nextInt(tw.length))
      val ts = new Timestamp(baseTs + rnd.nextInt(72 * 3600) * 1000L).toInstant.toString
      val statusDraw = rnd.nextInt(100)
      SmsEvent(
        event_id = f"SMS$i%08d",
        event_type = "SMS",
        sender_msisdn = f"+1555${rnd.nextInt(10000000)}%07d",
        receiver_msisdn = f"+1555${rnd.nextInt(10000000)}%07d",
        sender_customer_id = f"CUST${rnd.nextInt(200)}%04d",
        tower_id = tower.tower_id,
        sms_type = if (rnd.nextBoolean()) "P2P" else "A2P",
        delivery_status =
          if (statusDraw < 92) "DELIVERED" else if (statusDraw < 97) "FAILED" else "PENDING",
        message_size_bytes = 10 + rnd.nextInt(151),
        timestamp = ts,
        ingested_at = ts)
    }
  }

  /** Probe events: random-walk load with 0.1%-style spike injection
    * (reference network_probe_producer.py:38-47). */
  def probeEvents(spark: SparkSession, hours: Int = 24, seed: Long = 43L): Dataset[ProbeEvent] = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val tw = towers()
    val rows = for {
      h <- 0 until hours
      m <- 0 until 60 by 5
      t <- tw
    } yield {
      val drift = rnd.nextGaussian() * 5
      val spike = if (rnd.nextDouble() < 0.005) 40.0 else 0.0
      val load = math.min(100.0, math.max(0.0, 45.0 + drift + spike + (h % 12) * 2))
      val ts = baseTs + (h * 3600L + m * 60L) * 1000L
      ProbeEvent(
        probe_id = f"PRB${t.tower_id}%s$h%02d$m%02d",
        tower_id = t.tower_id, region = t.region,
        event_timestamp = new Timestamp(ts).toInstant.toString,
        load_pct = math.round(load * 100.0) / 100.0,
        avg_latency_ms = math.round((8 + rnd.nextDouble() * 40) * 10.0) / 10.0,
        packet_loss_pct = math.round(rnd.nextDouble() * 2 * 1000.0) / 1000.0,
        temperature_c = math.round((25 + rnd.nextGaussian() * 8) * 10.0) / 10.0,
        connected_users = 50 + rnd.nextInt(500),
        status = if (load > 90) "CRITICAL" else if (load > 75) "DEGRADED" else "HEALTHY",
        _bronze_ingested_at = new Timestamp(ts + 30000))
    }
    rows.toDS()
  }

  /** CRM customers with updated_at watermark field for incremental
    * pulls (reference crm_batch_ingestor.py:52-108). */
  def crmCustomers(spark: SparkSession, n: Int = 200, seed: Long = 44L): Dataset[CrmCustomer] = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val plans = Seq("PREPAID_BASIC", "PREPAID_PLUS", "POSTPAID_STD", "POSTPAID_PREMIUM")
    (0 until n).map { i =>
      val plan = plans(rnd.nextInt(plans.length))
      val updMs = baseTs - rnd.nextInt(90 * 24 * 3600) * 1000L
      CrmCustomer(
        customer_id = f"CUST$i%04d",
        full_name = s"Customer Name$i",
        email = s"customer$i@example.com",
        msisdn = f"+1555${rnd.nextInt(10000000)}%07d",
        plan_code = plan,
        plan_monthly_fee = Seq(9.99, 19.99, 39.99, 79.99)(plans.indexOf(plan)),
        activation_date = new Timestamp(baseTs - (300 + rnd.nextInt(1000)).toLong * 86400000L)
          .toInstant.toString.take(10),
        contract_end_date =
          if (plan.startsWith("POSTPAID") && rnd.nextBoolean())
            Some(new Timestamp(baseTs + rnd.nextInt(700).toLong * 86400000L)
              .toInstant.toString.take(10))
          else None,
        is_active = rnd.nextDouble() < 0.92,
        credit_score = 300 + rnd.nextInt(550),
        nps_score = rnd.nextInt(11),
        updated_at = new Timestamp(updMs).toInstant.toString,
        _source_system = "crm_core",
        _ingested_at = new Timestamp(baseTs))
    }.toDS()
  }
}
