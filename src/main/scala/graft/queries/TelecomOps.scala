package graft.queries

import java.sql.Timestamp
import graft.telecom._
import graft.streaming.FraudDetection
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Telecom medallion-pipeline queries over the deterministic seeded
  * generators (the reference's own domain: SURVEY.md S1-S3 producers
  * → silver → gold). No SQL oracle — the inputs are generated, not
  * driver tables — so these run as rows-only checks; their component
  * operators (windows, joins, aggs, scalar fns) are oracle-checked
  * via q01-q31. Deterministic end to end: fixed seeds, fixed dates.
  */
object TelecomOps {

  type Q = (SparkSession, String) => DataFrame

  /** Scale the generated fixture with the requested sf directory so
    * Bench exercises a larger pipeline at sf0.1. */
  private def genSize(dir: String): Int =
    if (dir.contains("sf0.1")) 200000 else if (dir.contains("sf0.01")) 20000 else 2000

  /** Full bronze→silver→gold run: generated CDRs + probes → dedup →
    * conformed silver → tower-hourly utilization rollup (A1-A4, J4). */
  def q60TowerHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val silverCalls = Silver.silverCalls(
      Generators.callEvents(s, n = genSize(dir)).toDF())
    val silverProbes = Silver.silverProbes(
      Generators.probeEvents(s, hours = 24).toDF())
    Gold.aggTowerHourly(silverProbes, silverCalls)
      .orderBy("tower_id", "hour")
  }

  /** Star-schema fact build (J1-J3 broadcast joins) + monthly rollup
    * (A5, J5), returning the monthly summary. */
  def q61CustomerMonthly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val silverCalls = Silver.silverCalls(
      Generators.callEvents(s, n = genSize(dir)).toDF())
    val silverCustomers = Silver.silverCustomers(
      Generators.crmCustomers(s, n = 200).toDF())
    val dimC = Gold.dimCustomers(silverCustomers)
    val fact = Gold.factCalls(silverCalls, dimC,
      Gold.dimTowers(s.createDataFrame(Generators.towers())), Gold.dimDate(s))
    Gold.aggCustomerMonthly(fact, dimC)
      .orderBy("customer_id", "year_month")
  }

  /** Batch fraud detection (W4+W5 formulation of the streaming rules)
    * over generated calls with planted fraud patterns. */
  def q62FraudAlerts(s: SparkSession, dir: String): DataFrame = {
    val calls = Generators.callEvents(s, n = genSize(dir)).toDF()
      .select(
        col("caller_customer_id").as("customer_id"),
        col("event_id"),
        to_timestamp(col("call_start_timestamp")).as("ts"),
        col("cell_lat").as("lat"), col("cell_lon").as("lon"),
        col("tower_id"))
    FraudDetection.detectBatch(calls)
      .orderBy("alert_id")
  }

  val queries: Map[String, Q] = Map(
    "q60_tower_hourly" -> q60TowerHourly _,
    "q61_customer_monthly" -> q61CustomerMonthly _,
    "q62_fraud_alerts" -> q62FraudAlerts _,
  )
  val oracles: Map[String, String] = Map.empty
}
