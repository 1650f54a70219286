package graft.telecom

import java.sql.Timestamp

/** Typed row schemas for the telecom domain — the reference's canonical
  * entity shapes (SURVEY.md §1.4; reference cdr_producer.py:88-158,
  * network_probe_producer.py:59-80, crm_batch_ingestor.py:77-106,
  * fraud_detection.py:139-160). Explicit case classes + Encoders
  * everywhere: schema inference is banned on production paths
  * (SURVEY.md §1.3).
  */
object Schemas {

  /** call_events (reference cdr_producer.py:88-108) + Kafka provenance
    * (kafka_to_bronze.py:124-129). Nullable end-ts for failed calls. */
  case class CallEvent(
      event_id: String,
      event_type: String,
      caller_msisdn: String,
      callee_msisdn: String,
      caller_customer_id: String,
      tower_id: String,
      cell_lat: Double,
      cell_lon: Double,
      call_start_timestamp: String,   // ISO-8601, typed at silver (F22)
      call_end_timestamp: Option[String],
      duration_seconds: Long,
      call_result_code: String,
      roaming: Boolean,
      revenue_usd: Double,
      _kafka_topic: String,
      _kafka_partition: Int,
      _kafka_offset: Long,
      _bronze_ingested_at: Timestamp)

  /** data_session_events (reference cdr_producer.py:110-139) — the
    * 60%-weighted topic of the CDR mix. */
  case class DataSessionEvent(
      event_id: String,
      event_type: String,
      subscriber_msisdn: String,
      customer_id: String,
      tower_id: String,
      tower_city: String,
      tower_state: String,
      session_start_timestamp: String,
      session_duration_seconds: Long,
      bytes_downloaded: Long,
      bytes_uploaded: Long,
      total_bytes: Long,
      content_type: String,
      radio_technology: String,
      signal_strength_dbm: Int,
      packet_loss_pct: Double,
      latency_ms: Int,
      plan_type: String,
      roaming: Boolean,
      revenue_usd: Double,
      ingested_at: String)

  /** sms_events (reference cdr_producer.py:142-157) — the
    * 10%-weighted topic; P2P/A2P with weighted delivery status. */
  case class SmsEvent(
      event_id: String,
      event_type: String,
      sender_msisdn: String,
      receiver_msisdn: String,
      sender_customer_id: String,
      tower_id: String,
      sms_type: String,
      delivery_status: String,
      message_size_bytes: Int,
      timestamp: String,
      ingested_at: String)

  /** network_probe_events (reference network_probe_producer.py:59-80). */
  case class ProbeEvent(
      probe_id: String,
      tower_id: String,
      region: String,
      event_timestamp: String,
      load_pct: Double,
      avg_latency_ms: Double,
      packet_loss_pct: Double,
      temperature_c: Double,
      connected_users: Int,
      status: String,
      _bronze_ingested_at: Timestamp)

  /** crm_customers (reference crm_batch_ingestor.py:77-106). */
  case class CrmCustomer(
      customer_id: String,
      full_name: String,
      email: String,
      msisdn: String,
      plan_code: String,
      plan_monthly_fee: Double,
      activation_date: String,
      contract_end_date: Option[String],
      is_active: Boolean,
      credit_score: Int,
      nps_score: Int,
      updated_at: String,
      _source_system: String,
      _ingested_at: Timestamp)

  /** towers_seed (reference dbt_project/seeds/towers_seed.csv). */
  case class Tower(
      tower_id: String,
      tower_name: String,
      region: String,
      latitude: Double,
      longitude: Double,
      capacity_gbps: Double,
      technology: String)

  /** Silver-typed call row (reference silver_calls.sql:57-117). */
  case class SilverCall(
      call_id: String,
      caller_msisdn: String,
      customer_id: String,
      tower_id: String,
      call_start_ts: Timestamp,
      call_end_ts: Option[Timestamp],
      call_date: java.sql.Date,
      duration_seconds: Long,
      duration_minutes: Double,
      call_status: String,
      is_successful: Boolean,
      is_zero_duration: Boolean,
      roaming: Boolean,
      revenue_usd: java.math.BigDecimal,
      _bronze_ingested_at: Timestamp)

  /** Fraud alert with nested details (reference
    * fraud_detection.py:139-160) — the one nested-struct shape. */
  case class AlertDetails(
      distance_km: Double,
      implied_speed_kmh: Double,
      window_call_count: Int)
  case class FraudAlert(
      alert_id: String,
      alert_type: String,
      severity: String,
      customer_id: String,
      event_id: String,
      event_ts: Timestamp,
      details: AlertDetails)

  /** Keyed fraud-detection state (reference fraud_detection.py:85-100):
    * last call (ValueState) + recent 30-min call list (ListState). */
  case class LastCall(ts: Long, lat: Double, lon: Double, towerId: String)
  case class FraudState(last: Option[LastCall], recent: Vector[(Long, String)])
}
