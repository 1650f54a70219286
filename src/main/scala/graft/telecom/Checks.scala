package graft.telecom

import graft.functions.Funcs._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt generic/singular tests,
  * Great-Expectations-style gates, and observability monitors
  * (reference model schema.yml files, singular tests,
  * great_expectations_suite.py, pipeline_observability.py).
  *
  * Every check compiles to ONE distributed aggregation returning a
  * single CheckResult; no row data ever reaches the driver. Suites
  * fold into a health verdict (HEALTHY/DEGRADED/BLOCKED) exactly like
  * the reference's report gating (pipeline_observability.py:338-351).
  */
object Checks {

  case class CheckResult(
      checkName: String,
      table: String,
      passed: Boolean,
      observed: Double,
      threshold: Double,
      severity: String, // "error" blocks, "warn" degrades
      source: String = "scan") // "observed" = write-path observe counter

  private def gate(df: DataFrame, name: String, table: String, agg: Column,
                   pass: Double => Boolean, threshold: Double,
                   severity: String): CheckResult = {
    val v = df.agg(agg.cast("double")).head().getDouble(0)
    CheckResult(name, table, pass(v), v, threshold, severity)
  }

  // ---- Observed-metric variants ----
  // The same gates, fed from Dataset.observe counters collected by
  // the landing write's OWN tasks instead of a post-write scan — at
  // 100 TB the reference's write-then-check pattern
  // (pipeline_observability.py:92-173 re-reading bronze) pays a full
  // extra pass per aggregate check; these cost zero reads and cannot
  // drift from what was actually written. Only pure per-row
  // aggregates qualify (not_null / row count / range violations);
  // unique and relationship need a shuffle or a join and stay on the
  // scan path.

  /** dbt not_null from an observed null counter. */
  def notNullObserved(table: String, column: String, nulls: Long,
                      severity: String = "error"): CheckResult =
    CheckResult(s"not_null_$column", table, nulls == 0, nulls.toDouble,
      0, severity, "observed")

  /** GX min row count from an observed row counter. */
  def minRowCountObserved(table: String, minRows: Long, rows: Long,
                          severity: String = "error"): CheckResult =
    CheckResult("min_row_count", table, rows >= minRows, rows.toDouble,
      minRows.toDouble, severity, "observed")

  /** Range gate from observed (rows, violation) counters; violations
    * must count nulls as non-matches to mirror [[inRange]]'s
    * matchRate semantics exactly. */
  def inRangeObserved(table: String, column: String, rows: Long,
                      violations: Long, mostly: Double = 1.0,
                      severity: String = "error"): CheckResult = {
    val rate = if (rows == 0) 0.0 else (rows - violations).toDouble / rows
    CheckResult(s"range_$column", table, rate >= mostly, rate,
      mostly, severity, "observed")
  }

  /** dbt not_null. */
  def notNull(df: DataFrame, table: String, column: String,
              severity: String = "error"): CheckResult =
    gate(df, s"not_null_$column", table,
      sum(when(col(column).isNull, 1L).otherwise(0L)), _ == 0, 0, severity)

  /** dbt unique. */
  def unique(df: DataFrame, table: String, column: String,
             severity: String = "error"): CheckResult =
    gate(df.groupBy(col(column)).count().filter(col("count") > 1),
      s"unique_$column", table, coalesce(count(lit(1)), lit(0L)), _ == 0, 0, severity)

  /** dbt accepted_values with optional `mostly` tolerance (GX). */
  def acceptedValues(df: DataFrame, table: String, column: String,
                     values: Seq[String], mostly: Double = 1.0,
                     severity: String = "error"): CheckResult =
    gate(df, s"accepted_values_$column", table,
      matchRate(col(column).isin(values: _*)), _ >= mostly, mostly, severity)

  /** dbt relationships: every fact FK exists in the dim (anti-join). */
  def relationship(fact: DataFrame, dim: DataFrame, table: String,
                   factKey: String, dimKey: String,
                   severity: String = "warn"): CheckResult = {
    val orphans = fact.select(col(factKey).as("_fact_key"))
      .join(dim.select(col(dimKey).as("_dim_key")),
        col("_fact_key") === col("_dim_key"), "left_anti")
    gate(orphans, s"relationships_$factKey", table,
      coalesce(count(lit(1)), lit(0L)), _ == 0, 0, severity)
  }

  /** Range violation count (dbt expression_is_true / GX between). */
  def inRange(df: DataFrame, table: String, column: String,
              lo: Double, hi: Double, mostly: Double = 1.0,
              severity: String = "error"): CheckResult =
    gate(df, s"range_${column}", table,
      matchRate(col(column).between(lo, hi)), _ >= mostly, mostly, severity)

  /** GX regex match with `mostly`. */
  def matchesRegex(df: DataFrame, table: String, column: String,
                   regex: String, mostly: Double,
                   severity: String = "warn"): CheckResult =
    gate(df, s"regex_$column", table,
      matchRate(col(column).rlike(regex)), _ >= mostly, mostly, severity)

  /** GX min row count (reference great_expectations_suite.py:85-88). */
  def minRowCount(df: DataFrame, table: String, minRows: Long,
                  severity: String = "error"): CheckResult =
    gate(df, "min_row_count", table, count(lit(1)), _ >= minRows,
      minRows.toDouble, severity)

  /** Volume z-score anomaly over a daily-count history (reference
    * pipeline_observability.py:99-139) — exact integer moments, ONE
    * aggregation job: the latest day's count rides along as
    * max_by(cnt, date) and its contribution is subtracted from the
    * all-rows moments, instead of a separate latest-lookup job plus
    * a nested max-date action. `dateCol` must be unique per row (a
    * daily rollup is). */
  def volumeZscore(daily: DataFrame, table: String, dateCol: String,
                   cntCol: String, zLimit: Double = 3.0,
                   severity: String = "warn"): CheckResult = {
    // Σx and Σx² accumulate as DECIMAL(38,0): day counts at the 1e9
    // scale this monitor advertises would silently wrap a Long Σx²
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val r = daily.agg(
      count(col(cntCol)),
      max_by(col(cntCol), col(dateCol)),
      sum(col(cntCol).cast(dec)),
      sum(col(cntCol).cast(dec) * col(cntCol).cast(dec))).head()
    if (r.getLong(0) < 3 || r.isNullAt(1)) // <2 history rows or null latest → neutral pass
      return CheckResult("volume_zscore", table, passed = true, 0, zLimit, severity)
    val latest = BigDecimal(r.getLong(1))
    val n = BigDecimal(r.getLong(0) - 1)
    val sx = BigDecimal(r.getDecimal(2)) - latest
    val sx2 = BigDecimal(r.getDecimal(3)) - latest * latest
    val mean = (sx / n).toDouble
    val variance = ((n * sx2 - sx * sx) / (n * (n - 1))).toDouble
    val z = if (variance <= 0) 0.0 else (latest.toDouble - mean) / math.sqrt(variance)
    CheckResult("volume_zscore", table, math.abs(z) <= zLimit, z, zLimit, severity)
  }

  /** Null-rate drift vs a baseline rate ±tolerance (reference
    * pipeline_observability.py:150-173). */
  def nullRateDrift(df: DataFrame, table: String, column: String,
                    baseline: Double, tolerance: Double = 0.05,
                    severity: String = "warn"): CheckResult =
    gate(df, s"null_rate_$column", table, nullRate(col(column)),
      v => math.abs(v - baseline) <= tolerance, baseline, severity)

  /** Cardinality drift vs baseline ±pct (reference
    * pipeline_observability.py:175-205). approx_count_distinct — the
    * 100 TB-safe monitor (HLL, no exact-distinct shuffle). */
  def cardinalityDrift(df: DataFrame, table: String, column: String,
                       baseline: Long, tolerancePct: Double = 0.2,
                       severity: String = "warn"): CheckResult =
    gate(df, s"cardinality_$column", table, approx_count_distinct(col(column)),
      v => baseline == 0 || math.abs(v - baseline) / baseline.toDouble <= tolerancePct,
      baseline.toDouble, severity)

  /** Attach scan-free pipeline metrics to a DataFrame via Spark's
    * observe() API: row count plus a null counter per required
    * column, collected as accumulator side-output of whatever action
    * the caller runs next (the write itself at 100 TB) — the
    * reference's per-run row-count/null metrics
    * (pipeline_observability.py:120-173) WITHOUT the second scan
    * those metrics cost there. Read results from `obs.get` after the
    * action; the returned frame is the input, untouched. */
  def withObservedMetrics(df: DataFrame, obs: org.apache.spark.sql.Observation,
                          requiredCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("rows") +:
      requiredCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    df.observe(obs, aggs.head, aggs.tail: _*)
  }

  /** Schema diff vs an expected column set (reference
    * pipeline_observability.py:210-277) — driver-side, no scan. */
  def schemaDiff(df: DataFrame, expected: Set[String]): (Set[String], Set[String]) = {
    val actual = df.columns.toSet
    (expected -- actual, actual -- expected) // (removed, added)
  }

  /** Fold check results into the pipeline health verdict (reference
    * pipeline_observability.py:338-351). */
  def verdict(results: Seq[CheckResult]): String =
    if (results.exists(r => !r.passed && r.severity == "error")) "BLOCKED"
    else if (results.exists(r => !r.passed)) "DEGRADED"
    else "HEALTHY"
}
