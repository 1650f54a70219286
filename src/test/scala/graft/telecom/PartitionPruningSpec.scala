package graft.telecom

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Plan-level proof of the partition-pruning claim (SURVEY.md §4 /
  * S5): the Hive-style year=/month=/day= landing layout lets a date
  * filter skip partitions at planning time. */
class PartitionPruningSpec extends SparkSpec {

  test("bronze landing layout prunes partitions for date filters") {
    val tmp = java.nio.file.Files.createTempDirectory("prune").toString
    try {
    import spark.implicits._
    Bronze.writeLanding(
      Generators.callEvents(spark, n = 500).toDF()
        .withColumn("evt_ts", to_timestamp(col("call_start_timestamp"))),
      s"$tmp/landing", "evt_ts")
    val filtered = spark.read.parquet(s"$tmp/landing")
      .filter(col("year") === 2024 && col("month") === 1 && col("day") === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("(month") || plan.contains("month#")),
      s"expected partition filters in scan:\n${plan.take(2000)}")
    // pruned read returns exactly day 1's rows
    val all = spark.read.parquet(s"$tmp/landing")
    assert(filtered.count() ===
      all.filter(col("evt_ts").cast("date") === "2024-01-01").count())
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("SQL serving surface (S13): registered views answer spark.sql queries") {
    Tables.registerAll(spark, sfDir)
    val top = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    assert(top.count() > 0)
    val joined = spark.sql(
      """SELECT r_name, COUNT(*) AS nations FROM nation
        |JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""".stripMargin)
    assert(joined.collect().map(_.getLong(1)).sum === 25)
  }
}
