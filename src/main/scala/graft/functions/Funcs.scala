package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-function library — every helper is a pure composition of
  * built-in (codegen'd) Catalyst expressions; no UDFs on hot paths.
  *
  * Mirrors the reference's custom-logic surface (SURVEY.md §2.8/§2.10):
  * surrogate keys (dbt macro generate_surrogate_key, reference
  * dbt_project/macros/generate_surrogate_key.sql:8-14), haversine
  * (streaming/flink_jobs/fraud_detection.py:64-71), PII masking
  * (dbt_project/models/gold/dimensions/dim_customers.sql:35-38), and
  * the Trino↔Spark dialect shims (SURVEY.md F11-F13).
  */
object Funcs {

  /** Exact, order-independent money aggregation.
    *
    * Double summation is order-dependent under Spark's partial/final
    * hash aggregation (partition order varies run to run), which breaks
    * hash-parity with any oracle. Summing as DECIMAL is exact and
    * deterministic; the final cast to double is a single deterministic
    * conversion. Use for every monetary / fractional measure.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average: exact decimal sum / count, as double. */
  def davg(c: Column, scale: Int = 6): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)).cast("double")

  /** dbt generate_surrogate_key parity: md5 of '|'-joined columns with
    * NULL → 'UNKNOWN' (reference generate_surrogate_key.sql:8-14).
    * Byte-for-byte compatible with the Trino/DuckDB expression
    * md5(concat_ws('|', coalesce(cast(c as varchar),'UNKNOWN'), ...)).
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit("UNKNOWN"))): _*))

  /** Great-circle distance in km (reference fraud_detection.py:64-71).
    * Pure built-ins → whole-stage-codegen'd, no UDF.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * 6371.0) * asin(sqrt(a))
  }

  /** PII masks (reference dim_customers.sql:35-38). maskEmail is
    * byte-exact reference parity — including its flaw: a local part
    * of <= 2 chars doesn't match and passes through UNMASKED. */
  def maskName(c: Column): Column = concat(substring(c, 1, 2), lit("***"))
  def maskEmail(c: Column): Column =
    regexp_replace(c, "(.{2}).+(@.+)", "$1***$2")

  /** Strict email mask with no pass-through: 1-2 char prefixes still
    * mask ('a@x.com' → 'a***@x.com'). Used by the gold dimension,
    * where an unmasked email is a PII leak, not a parity feature. */
  def maskEmailStrict(c: Column): Column =
    regexp_replace(c, "^(.{1,2})[^@]*(@.+)$", "$1***$2")

  /** Conditional counter: SUM(CASE WHEN p THEN 1 ELSE 0 END)
    * (reference agg_tower_hourly_utilization.sql:77 et al.)
    */
  def countIf(p: Column): Column = sum(when(p, 1L).otherwise(0L))

  /** Null-rate of a column as a double in [0,1]
    * (reference pipeline_observability.py:150-173).
    */
  def nullRate(c: Column): Column =
    (sum(when(c.isNull, 1L).otherwise(0L)).cast("double") / count(lit(1))).cast("double")

  /** Fraction of rows matching a predicate, with `mostly`-style gates
    * (reference great_expectations_suite.py:70-75).
    */
  def matchRate(p: Column): Column =
    (sum(when(p, 1L).otherwise(0L)).cast("double") / count(lit(1))).cast("double")

  // ---- Trino/MySQL dialect shims (SURVEY.md F11-F13) ----
  // The reference's SQL is Trino: unit-first DATE_ADD/DATE_DIFF and
  // MySQL-style DATE_FORMAT patterns. These shims centralize the
  // dialect translation so ported model logic reads 1:1.

  /** Trino DATE_ADD('unit', n, ts) (reference silver_calls.sql:34,
    * agg_tower_hourly_utilization.sql:26). Negative n subtracts. */
  def dateAddUnit(unit: String, n: Int, c: Column): Column = unit.toLowerCase match {
    case "second" => c + expr(s"INTERVAL $n SECOND")
    case "minute" => c + expr(s"INTERVAL $n MINUTE")
    case "hour"   => c + expr(s"INTERVAL $n HOUR")
    case "day"    => c + expr(s"INTERVAL $n DAY")
    case "week"   => c + expr(s"INTERVAL ${7 * n} DAY")
    case "month"  => add_months(c, n)
    case "year"   => add_months(c, 12 * n)
    case u => throw new IllegalArgumentException(s"unsupported unit $u")
  }

  /** Trino DATE_DIFF('unit', a, b) = elapsed units from a to b
    * (reference silver_customers.sql:61-64, dim_date.sql:58-60).
    * NOTE the arg order: Trino is (unit, start, end) while Spark's
    * datediff is (end, start) — this shim takes (start, end). */
  def dateDiffUnit(unit: String, a: Column, b: Column): Column = unit.toLowerCase match {
    case "second" => unix_timestamp(b) - unix_timestamp(a)
    case "minute" => ((unix_timestamp(b) - unix_timestamp(a)) / 60L).cast("bigint")
    case "hour"   => ((unix_timestamp(b) - unix_timestamp(a)) / 3600L).cast("bigint")
    case "day"    => datediff(b, a).cast("bigint")
    case "week"   => floor(datediff(b, a) / 7).cast("bigint")
    case "month"  => floor(months_between(b, a)).cast("bigint")
    case "year"   =>
      // elapsed FULL years (Trino-like, truncated toward zero): the
      // calendar-year difference minus one if the anniversary in the
      // travel direction hasn't been reached — NOT the naive
      // year(b)-year(a), which is off by one near boundaries
      val fwd = year(b) - year(a) -
        when(month(b) < month(a) ||
          (month(b) === month(a) && dayofmonth(b) < dayofmonth(a)), 1).otherwise(0)
      val bwd = -(year(a) - year(b) -
        when(month(a) < month(b) ||
          (month(a) === month(b) && dayofmonth(a) < dayofmonth(b)), 1).otherwise(0))
      when(b >= a, fwd).otherwise(bwd).cast("bigint")
    case u => throw new IllegalArgumentException(s"unsupported unit $u")
  }

  /** MySQL/Trino strftime-style patterns → Spark/Java patterns
    * (reference dim_date.sql:22-37: %Y%m%d, %A, %B, %b, %Y-%m). */
  private val mysqlPatterns = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd", "%H" -> "HH",
    "%i" -> "mm", "%s" -> "ss", "%A" -> "EEEE", "%W" -> "EEEE",
    "%a" -> "EEE", "%B" -> "MMMM", "%b" -> "MMM", "%j" -> "DDD")
  def translateDateFormat(mysqlFmt: String): String =
    mysqlPatterns.foldLeft(mysqlFmt) { case (s, (from, to)) => s.replace(from, to) }

  /** Trino DATE_FORMAT(ts, '%Y-%m-%d') with MySQL-style patterns. */
  def dateFormatMysql(c: Column, mysqlFmt: String): Column =
    date_format(c, translateDateFormat(mysqlFmt))
}
