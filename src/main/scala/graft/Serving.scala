package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL serving layer (SURVEY.md S13): the spark.sql face of the
  * engine, standing in for the reference's Trino-over-dbt-models
  * endpoint (dbt_project/profiles.yml:1-20). One call registers the
  * whole catalog — raw tables, the telecom medallion (silver
  * conformed + gold star schema + aggregates), and the
  * document-analysis views — after which any ANSI SQL runs against
  * business names.
  *
  * Views are LAZY logical plans: nothing materializes at
  * registration, Catalyst optimizes through them (a query touching
  * one gold column still prunes to the columns it needs at the
  * parquet scan), and every view composes with time travel via
  * sources.SnapshotTable when the underlying path is snapshotted.
  * External JDBC/Thrift exposure is the one out-of-scope piece
  * (zero-egress container); the view catalog is the same contract a
  * Thrift server would serve.
  */
object Serving {

  /** Register the full serving catalog over a scale-factor directory
    * plus the deterministic telecom bronze generators. */
  def registerCatalog(spark: SparkSession, dir: String,
                      telecomEvents: Int = 20000): Unit = {
    import spark.implicits._
    // raw driver tables under their own names
    Tables.registerAll(spark, dir)
    spark.catalog.dropTempView("events")
    Tables.events(spark, dir).createOrReplaceTempView("events") // µs-normalized ts

    // telecom medallion: bronze (generated) → silver → gold
    val bronzeCalls = telecom.Generators.callEvents(spark, n = telecomEvents).toDF()
    val bronzeProbes = telecom.Generators.probeEvents(spark, hours = 24).toDF()
    val bronzeCrm = telecom.Generators.crmCustomers(spark, n = 200).toDF()
    bronzeCalls.createOrReplaceTempView("bronze_call_events")
    bronzeProbes.createOrReplaceTempView("bronze_network_probes")
    bronzeCrm.createOrReplaceTempView("bronze_crm_customers")
    // the other two CDR topics (60%/10% of the reference's mix)
    telecom.Generators.dataSessionEvents(spark, n = telecomEvents).toDF()
      .createOrReplaceTempView("bronze_data_session_events")
    telecom.Generators.smsEvents(spark, n = telecomEvents).toDF()
      .createOrReplaceTempView("bronze_sms_events")

    val silverCalls = telecom.Silver.silverCalls(bronzeCalls)
    val silverProbes = telecom.Silver.silverProbes(bronzeProbes)
    val silverCustomers = telecom.Silver.silverCustomers(bronzeCrm)
    silverCalls.createOrReplaceTempView("silver_calls")
    silverProbes.createOrReplaceTempView("silver_network_probes")
    silverCustomers.createOrReplaceTempView("silver_customers")

    val dimC = telecom.Gold.dimCustomers(silverCustomers)
    val dimT = telecom.Gold.dimTowers(telecom.Generators.towers().toDF())
    val dimD = telecom.Gold.dimDate(spark)
    val fact = telecom.Gold.factCalls(silverCalls, dimC, dimT, dimD)
    dimC.createOrReplaceTempView("dim_customers")
    dimT.createOrReplaceTempView("dim_towers")
    dimD.createOrReplaceTempView("dim_date")
    fact.createOrReplaceTempView("fact_calls")
    telecom.Gold.aggTowerHourly(silverProbes, silverCalls)
      .createOrReplaceTempView("agg_tower_hourly_utilization")
    telecom.Gold.aggCustomerMonthly(fact, dimC)
      .createOrReplaceTempView("agg_customer_monthly_summary")

    // document-analysis views (the LLM-curation serving surface)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        operators.TextAnalysis.tokenCount(col("text")).as("token_count"),
        operators.TextAnalysis.detectLang(col("text")).as("detected_lang"),
        operators.TextAnalysis.qualityScore(col("text")).as("quality_score"),
        operators.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .createOrReplaceTempView("document_profile")
  }

  /** The serving entry: plain ANSI SQL against the registered names. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Materialize a registered view as a managed table and collect
    * table + column statistics — the reference's dbt post-hook
    * `ANALYZE {{ this }}` (dbt_project.yml:49) on every model build.
    * With stats in the catalog, Catalyst's CBO has real rowCount /
    * sizeInBytes / per-column NDV+min/max for join reordering and
    * broadcast decisions instead of file-size guesses; at 100 TB the
    * difference is picking the right build side BEFORE a shuffle is
    * committed, not after AQE observes a bad one. */
  def materializeWithStats(spark: SparkSession, view: String, table: String,
                           statCols: Seq[String] = Nil): Unit = {
    // idempotent across JVMs: the in-memory catalog forgets managed
    // tables on restart but their warehouse location persists, and
    // saveAsTable refuses to adopt an orphaned location. Resolve the
    // location through the session catalog (handles database-
    // qualified names) and delete via the Hadoop FileSystem API
    // (works for DFS warehouses, not just local paths).
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = spark.sessionState.catalog.defaultTablePath(ident)
    val hpath = new org.apache.hadoop.fs.Path(loc)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hpath)) fs.delete(hpath, true)
    spark.table(view).write.mode("overwrite").saveAsTable(table)
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (statCols.nonEmpty)
      spark.sql(
        s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${statCols.mkString(", ")}")
  }
}
