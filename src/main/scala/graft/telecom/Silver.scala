package graft.telecom

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Silver conformed layer (reference dbt_project models/silver):
  * corrupt-record filters (P2), incremental lookback (P3),
  * dedup-keep-latest windows (W1-W3), explicit casts (F1/F22), and
  * business decodes (F2).
  *
  * Incremental semantics: callers pass `asOfDate` + lookbackDays; the
  * lookback predicate is on the partition-friendly ingest column so
  * partition pruning limits the scan exactly like the reference's
  * 3-day incremental models (dbt_project.yml:53).
  */
object Silver {

  /** Reference silver_calls.sql:31-119. */
  /** The silver hard filter's keep condition — single source of
    * truth shared by [[silverCalls]] and [[quarantineCalls]], so the
    * two can never drift out of their partition-of-bronze invariant
    * (each rejectReasons branch must imply NOT cleanCallKeep). */
  private[telecom] def cleanCallKeep: Column =
    col("event_id").isNotNull && col("caller_msisdn").isNotNull &&
      col("tower_id").isNotNull && col("duration_seconds") >= 0

  /** Quarantine audit: exactly the rows silverCalls' hard filter
    * drops, each with comma-joined reason codes. The reference drops
    * them silently (silver_calls.sql:50-55); a production lakehouse
    * lands them for triage. Selection is literally NOT cleanCallKeep
    * (the shared predicate), so silver + quarantine partition the
    * bronze row set by construction; the reason string only labels
    * the rejects. concat_ws skips the null branches identically in
    * Spark and ANSI SQL, keeping it oracle-portable. */
  def quarantineCalls(bronzeCalls: DataFrame): DataFrame = {
    val reasons = concat_ws(",",
      when(col("event_id").isNull, "null_event_id"),
      when(col("caller_msisdn").isNull, "null_caller_msisdn"),
      when(col("tower_id").isNull, "null_tower_id"),
      when(col("duration_seconds").isNull || col("duration_seconds") < 0,
        "bad_duration"))
    bronzeCalls
      .filter(!coalesce(cleanCallKeep, lit(false)))
      .withColumn("reasons", reasons)
      .select(col("event_id"), col("caller_msisdn"), col("tower_id"),
        col("duration_seconds"), col("_kafka_offset"), col("reasons"))
  }

  def silverCalls(bronzeCalls: DataFrame,
                  asOfDate: java.sql.Date = null,
                  lookbackDays: Int = 3): DataFrame = {
    val lookback =
      if (asOfDate == null) lit(true)
      else col("_bronze_ingested_at") >= date_sub(lit(asOfDate), lookbackDays)
    val w = Window.partitionBy("event_id")
      .orderBy(col("_bronze_ingested_at").desc, col("_kafka_offset").desc)
    bronzeCalls
      .filter(cleanCallKeep)
      .filter(lookback)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(
        col("event_id").as("call_id"),
        col("caller_msisdn"),
        col("caller_customer_id").as("customer_id"),
        col("tower_id"),
        to_timestamp(col("call_start_timestamp")).as("call_start_ts"),
        to_timestamp(col("call_end_timestamp")).as("call_end_ts"),
        to_date(to_timestamp(col("call_start_timestamp"))).as("call_date"),
        col("duration_seconds").cast("bigint").as("duration_seconds"),
        round(col("duration_seconds") / 60.0, 2).as("duration_minutes"),
        when(col("call_result_code") === "COMPLETED", "Completed")
          .when(col("call_result_code") === "FAILED", "Failed")
          .when(col("call_result_code") === "DROPPED", "Dropped")
          .otherwise("Unknown").as("call_status"),
        (col("call_result_code") === "COMPLETED").as("is_successful"),
        (col("duration_seconds") === 0).as("is_zero_duration"),
        col("roaming"),
        col("revenue_usd").cast(DecimalType(12, 4)).as("revenue_usd"),
        col("_bronze_ingested_at"))
  }

  /** Reference silver_network_probes.sql:17-86. */
  def silverProbes(bronzeProbes: DataFrame,
                   asOfDate: java.sql.Date = null,
                   lookbackDays: Int = 3): DataFrame = {
    val lookback =
      if (asOfDate == null) lit(true)
      else col("_bronze_ingested_at") >= date_sub(lit(asOfDate), lookbackDays)
    val w = Window.partitionBy("probe_id").orderBy(col("_bronze_ingested_at").desc)
    bronzeProbes
      .filter(col("probe_id").isNotNull && col("tower_id").isNotNull)
      .filter(lookback)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(
        col("probe_id"), col("tower_id"), col("region"),
        to_timestamp(col("event_timestamp")).as("probe_ts"),
        date_trunc("hour", to_timestamp(col("event_timestamp"))).as("probe_hour"),
        col("load_pct").cast(DecimalType(6, 2)).as("load_pct"),
        col("avg_latency_ms").cast(DecimalType(8, 1)).as("avg_latency_ms"),
        col("packet_loss_pct").cast(DecimalType(6, 3)).as("packet_loss_pct"),
        col("temperature_c").cast(DecimalType(5, 1)).as("temperature_c"),
        col("connected_users").cast("int").as("connected_users"),
        when(col("load_pct") >= 90, "CRITICAL")
          .when(col("load_pct") >= 75, "DEGRADED")
          .otherwise("HEALTHY").as("load_status"),
        (col("load_pct") >= 90).as("alert_threshold_breached"),
        (col("temperature_c") > 45).as("is_overheating"),
        col("_bronze_ingested_at"))
  }

  /** Reference silver_customers.sql:16-89; dedup key customer_id,
    * survivor = latest updated_at (W2). */
  def silverCustomers(bronzeCustomers: DataFrame): DataFrame = {
    val w = Window.partitionBy("customer_id")
      .orderBy(to_timestamp(col("updated_at")).desc)
    bronzeCustomers
      .filter(col("customer_id").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(
        col("customer_id"), col("full_name"), col("email"), col("msisdn"),
        col("plan_code"),
        split(col("plan_code"), "_").getItem(0).as("plan_family"),
        col("plan_monthly_fee").cast(DecimalType(10, 2)).as("plan_monthly_fee"),
        to_date(col("activation_date")).as("activation_date"),
        to_date(col("contract_end_date")).as("contract_end_date"),
        col("is_active"),
        col("credit_score").cast("int"),
        col("nps_score").cast("int"),
        to_timestamp(col("updated_at")).as("updated_at"),
        col("_source_system"))
  }
}
