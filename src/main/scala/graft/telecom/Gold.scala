package graft.telecom

import graft.functions.Funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold star schema (reference dbt_project models/gold): SCD-style
  * dimensions, the call fact with broadcast dim joins (J1-J3), and the
  * two pre-aggregates (A1-A5, J4-J5).
  *
  * Scale: dims are bounded (customers, towers, dates) → always
  * broadcast; the fact table only ever streams through broadcast hash
  * joins, so fact-side data never shuffles for enrichment. Aggregates
  * shuffle once on their grouping keys with map-side partial agg.
  */
object Gold {

  /** Reference dim_date.sql:11-66 — date spine + calendar attributes. */
  def dimDate(spark: SparkSession, start: String = "2024-01-01",
              end: String = "2024-12-31"): DataFrame =
    spark.sql(s"SELECT explode(sequence(to_date('$start'), to_date('$end'), " +
        "interval 1 day)) AS full_date")
      .select(
        col("full_date"),
        date_format(col("full_date"), "yyyyMMdd").cast("int").as("date_key"),
        year(col("full_date")).as("year"),
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        dayofweek(col("full_date")).as("day_of_week"),
        date_format(col("full_date"), "EEEE").as("day_name"),
        dayofweek(col("full_date")).isin(1, 7).as("is_weekend"),
        concat(lit("Q"), quarter(col("full_date"))).as("quarter_label"))

  /** Reference dim_towers.sql:15-47 — surrogate key + capacity tier. */
  def dimTowers(towers: DataFrame): DataFrame =
    towers.select(
      surrogateKey(col("tower_id")).as("tower_key"),
      col("tower_id"), col("tower_name"), col("region"),
      col("latitude").cast(DecimalType(9, 6)).as("latitude"),
      col("longitude").cast(DecimalType(9, 6)).as("longitude"),
      col("capacity_gbps"),
      when(col("capacity_gbps") >= 30, "HIGH")
        .when(col("capacity_gbps") >= 20, "MEDIUM")
        .otherwise("STANDARD").as("capacity_tier"),
      col("technology"))

  /** Reference dim_customers.sql:29-91 — masking (F6/F7), tenure and
    * value segments (F2), single-version SCD2 contract
    * (is_current=TRUE, effective range open-ended — exactly the
    * reference's behavior, dim_customers.sql:84-87). */
  def dimCustomers(silverCustomers: DataFrame,
                   asOfDate: String = "2024-01-01"): DataFrame =
    silverCustomers.select(
      surrogateKey(col("customer_id")).as("customer_key"),
      col("customer_id"),
      maskName(col("full_name")).as("masked_name"),
      maskEmailStrict(col("email")).as("masked_email"),
      concat(substring(col("msisdn"), 1, 5), lit("****")).as("masked_msisdn"),
      col("plan_code"), col("plan_family"), col("plan_monthly_fee"),
      col("activation_date"), col("is_active"),
      floor(months_between(lit(asOfDate).cast("date"), col("activation_date")))
        .cast("int").as("tenure_months"),
      when(months_between(lit(asOfDate).cast("date"), col("activation_date")) >= 36, "VETERAN")
        .when(months_between(lit(asOfDate).cast("date"), col("activation_date")) >= 12, "ESTABLISHED")
        .otherwise("NEW").as("tenure_segment"),
      when(col("plan_monthly_fee") >= 60, "HIGH_VALUE")
        .when(col("plan_monthly_fee") >= 25, "MID_VALUE")
        .otherwise("LOW_VALUE").as("value_segment"),
      when(col("nps_score") >= 9, "PROMOTER")
        .when(col("nps_score") >= 7, "PASSIVE")
        .otherwise("DETRACTOR").as("nps_segment"),
      lit(true).as("is_current"),
      col("activation_date").as("effective_start_date"),
      lit(null).cast("date").as("effective_end_date"))

  /** Reference fact_calls.sql:33-98: broadcast left joins to the three
    * dims, COALESCE'd FK defaults (F3), measure counters (A3). */
  def factCalls(silverCalls: DataFrame, dimCustomers: DataFrame,
                dimTowers: DataFrame, dimDate: DataFrame): DataFrame = {
    val dimC = dimCustomers.filter(col("is_current"))
      .select("customer_key", "customer_id", "value_segment")
    val dimT = dimTowers.select("tower_key", "tower_id", "region")
    val dimD = dimDate.select(col("date_key"), col("full_date"))
    silverCalls
      .join(broadcast(dimC), Seq("customer_id"), "left")
      .join(broadcast(dimT), Seq("tower_id"), "left")
      .join(broadcast(dimD), silverCalls("call_date") === dimD("full_date"), "left")
      .select(
        col("call_id"),
        coalesce(col("customer_key"), lit("UNKNOWN")).as("customer_key"),
        coalesce(col("tower_key"), lit("UNKNOWN")).as("tower_key"),
        coalesce(col("date_key"), lit(-1)).as("date_key"),
        col("customer_id"), col("tower_id"), col("region"),
        col("value_segment"),
        col("call_start_ts"), col("call_date"),
        col("duration_seconds"), col("duration_minutes"),
        col("revenue_usd"),
        when(col("is_successful"), 1L).otherwise(0L).as("successful_call_count"),
        when(!col("is_successful"), 1L).otherwise(0L).as("failed_call_count"),
        when(col("roaming"), 1L).otherwise(0L).as("roaming_call_count"))
  }

  /** Reference agg_tower_hourly_utilization.sql:24-137: probe rollup
    * (A2) ⟕ call rollup (A1) on (tower_id, hour) (J4), worst-status
    * via max-of-rank (A4), alert counter (A3), zero-filled call
    * metrics (F3). */
  def aggTowerHourly(silverProbes: DataFrame, silverCalls: DataFrame): DataFrame = {
    val statusRank = when(col("load_status") === "CRITICAL", 3)
      .when(col("load_status") === "DEGRADED", 2).otherwise(1)
    val probeAgg = silverProbes
      .groupBy(col("tower_id"), col("probe_hour").as("hour"), col("region"))
      .agg(
        davg(col("load_pct"), 2).as("avg_load_pct"),
        max(col("load_pct")).cast("double").as("max_load_pct"),
        davg(col("avg_latency_ms"), 1).as("avg_latency_ms"),
        davg(col("packet_loss_pct"), 3).as("avg_packet_loss_pct"),
        davg(col("connected_users"), 0).as("avg_connected_users"),
        countIf(col("alert_threshold_breached")).as("alert_count"),
        max(statusRank).as("worst_status_rank"),
        count(lit(1)).as("probe_count"))
      .withColumn("worst_status",
        when(col("worst_status_rank") === 3, "CRITICAL")
          .when(col("worst_status_rank") === 2, "DEGRADED")
          .otherwise("HEALTHY"))
    val callAgg = silverCalls
      .groupBy(col("tower_id"), date_trunc("hour", col("call_start_ts")).as("hour"))
      .agg(
        count(lit(1)).as("call_count"),
        countIf(col("is_successful")).as("successful_calls"),
        dsum(col("duration_minutes")).as("total_call_minutes"),
        dsum(col("revenue_usd"), 4).as("total_revenue_usd"))
    probeAgg.join(callAgg, Seq("tower_id", "hour"), "left")
      .select(
        col("tower_id"), col("hour"), col("region"),
        col("avg_load_pct"), col("max_load_pct"), col("avg_latency_ms"),
        col("avg_packet_loss_pct"), col("avg_connected_users"),
        col("alert_count"), col("worst_status"), col("probe_count"),
        coalesce(col("call_count"), lit(0L)).as("call_count"),
        coalesce(col("successful_calls"), lit(0L)).as("successful_calls"),
        coalesce(col("total_call_minutes"), lit(0.0)).as("total_call_minutes"),
        coalesce(col("total_revenue_usd"), lit(0.0)).as("total_revenue_usd"))
      .withColumn("success_rate_pct",
        when(col("call_count") > 0,
          round(col("successful_calls") / col("call_count") * 100.0, 2))
          .otherwise(lit(null).cast("double")))
  }

  /** Reference agg_customer_monthly_summary.sql:18-104: per-customer
    * monthly usage joined to the current dim (J5), dropping customers
    * without calls (P6). */
  def aggCustomerMonthly(factCalls: DataFrame, dimCustomers: DataFrame): DataFrame = {
    val monthly = factCalls
      .groupBy(
        col("customer_key"),
        date_format(col("call_date"), "yyyy-MM").as("year_month"))
      .agg(
        count(lit(1)).as("call_count"),
        dsum(col("duration_minutes")).as("total_minutes"),
        dsum(col("revenue_usd"), 4).as("total_revenue_usd"),
        countIf(col("successful_call_count") === 1).as("successful_calls"),
        countIf(col("roaming_call_count") === 1).as("roaming_calls"))
    dimCustomers.filter(col("is_current"))
      .select("customer_key", "customer_id", "value_segment", "tenure_segment")
      .join(monthly, Seq("customer_key"), "left")
      .filter(col("year_month").isNotNull)
      .withColumn("usage_segment",
        when(col("total_minutes") >= 300, "HEAVY")
          .when(col("total_minutes") >= 60, "REGULAR")
          .otherwise("LIGHT"))
  }
}
