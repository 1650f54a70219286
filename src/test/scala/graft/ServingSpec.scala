package graft

import org.apache.spark.sql.functions._

class ServingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("catalog registers and serves ANSI SQL over gold views") {
    Serving.registerCatalog(spark, dir, telecomEvents = 2000)
    val top = Serving.sql(spark,
      """SELECT tower_id, SUM(call_count) AS calls
        |FROM agg_tower_hourly_utilization
        |GROUP BY tower_id ORDER BY calls DESC, tower_id LIMIT 3""".stripMargin)
      .collect()
    assert(top.length === 3 && top.head.getLong(1) > 0)
  }

  test("SQL over views matches the DataFrame API result") {
    Serving.registerCatalog(spark, dir, telecomEvents = 2000)
    val viaSql = Serving.sql(spark,
      "SELECT value_segment, COUNT(*) AS n FROM dim_customers GROUP BY 1 ORDER BY 1")
      .as[(String, Long)].collect().toSeq
    val viaApi = telecom.Gold.dimCustomers(
        telecom.Silver.silverCustomers(telecom.Generators.crmCustomers(spark, 200).toDF()))
      .groupBy("value_segment").agg(count(lit(1)).as("n"))
      .orderBy("value_segment").as[(String, Long)].collect().toSeq
    assert(viaSql === viaApi)
  }

  test("catalyst prunes through serving views: document_profile scan reads needed columns only") {
    Serving.registerCatalog(spark, dir, telecomEvents = 2000)
    val plan = Serving.sql(spark,
      "SELECT doc_id FROM document_profile WHERE lang = 'en'")
      .queryExecution.executedPlan.toString
    // projection through the view reaches the parquet scan: text-derived
    // columns are not read when only doc_id/lang are needed
    assert(plan.contains("ReadSchema") &&
      plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("doc_id"))
    assert(!plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("text"))
  }

  test("materializeWithStats records table and column statistics for CBO") {
    Serving.registerCatalog(spark, dir, telecomEvents = 2000)
    Serving.materializeWithStats(spark, "dim_customers", "dim_customers_stats",
      statCols = Seq("customer_id", "value_segment"))
    val stats = spark.sql("DESCRIBE EXTENDED dim_customers_stats")
      .filter(col("col_name") === "Statistics")
      .select("data_type").as[String].collect()
    assert(stats.nonEmpty && stats.head.contains("rows"),
      s"expected rowCount statistics, got: ${stats.mkString}")
    val colStats = spark.sql(
      "DESCRIBE EXTENDED dim_customers_stats customer_id")
      .filter(col("info_name") === "distinct_count")
      .select("info_value").as[String].collect()
    assert(colStats.nonEmpty && colStats.head.trim.toLong > 0,
      s"expected NDV column statistics, got: ${colStats.mkString}")
    // CBO sees them: with cost-based optimization on, the optimized
    // plan's row estimate comes from the ANALYZE stats, not file size
    val expected = spark.table("dim_customers_stats").count()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val est = spark.table("dim_customers_stats")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.contains(BigInt(expected)),
        s"CBO rowCount estimate $est != actual $expected")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.sql("DROP TABLE dim_customers_stats")
  }
}
