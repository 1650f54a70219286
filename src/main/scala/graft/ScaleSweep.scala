package graft

import org.apache.spark.sql.SparkSession

/** Growth-exponent sweep over the heavy-tail queries (round-5
  * verdict item 3): time each target query at sf0.1 (driver data)
  * and sf1 (ScaleUp-derived, 10x the scanned tables), and report the
  * measured growth exponent e = log10(t_sf1 / t_sf0.1) — e ~ 1 is
  * linear in data, e ~ 2 quadratic. One JSON line per query plus a
  * summary line, mirroring the Bench min-of-reps protocol (min
  * rescues a rep from noisy-neighbor windows; both scale points run
  * in the SAME session back to back so host drift cancels out of the
  * ratio).
  *
  * Default targets are the five queries the round-5 verdict called
  * most load-bearing for the 100x claim: q151 (exact similarity
  * self-join), q203 (k-core peel), q205 (HITS), q105 (end-to-end
  * curation), q174 (item-cosine).
  */
object ScaleSweep {
  val DefaultTargets = Seq(
    "q151_similarity_join", "q203_kcore", "q205_hits",
    "q105_curation_pipeline", "q174_item_cosine",
    // the ANN ladder: exact brute force (quadratic by construction —
    // queries AND corpus both 10x) vs the bucketed variants that
    // exist precisely to break that quadratic
    "q49_cosine_topk", "q75_ivf_ann", "q80_multiprobe_ann",
    "q215_ann_auto", "q119_ivfpq_ann",
    // near-dup at 10x: banded LSH and SimHash candidate generation
    "q46_minhash_neardup", "q47_simhash_fingerprint",
    // round-6 composites: community structure + the decision-layer
    // curation chain + LM-score bucketing
    "q213_label_prop", "q214_curation_v2", "q217_perplexity_buckets",
    // round-6 part 2: scan-speed classifier, source-keyed adaptive
    // threshold window, cluster-survivor composite
    "q218_hash_classifier", "q219_adaptive_threshold",
    "q220_quality_survivor",
    // relational core on the 10x lineitem/orders replicas (dims
    // fixed): scan-agg, broadcast star join, window rollup, RFM
    // quantile segmentation
    "q01_pricing_summary", "q03_star_join", "q19_monthly_rollup",
    "q163_rfm")

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key the skip on writeAll's completion marker, not table
    // existence: a crash mid-generation leaves a mixed-scale
    // directory that would silently produce bogus exponents
    if (!ScaleUp.isComplete(sf1, sf01, replicas = 10)) {
      System.err.println(s"[sweep] generating $sf1 from $sf01 ...")
      ScaleUp.writeAll(spark, sf01, sf1, replicas = 10)
    }

    val targets =
      if (args.nonEmpty) args.toSeq.flatMap(a =>
        SparkEntry.queries.keys.filter(k => k == a || k.takeWhile(_ != '_') == a))
      else DefaultTargets

    def sweep(dir: String, name: String): Double = {
      val fn = SparkEntry.queries(name)
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        try {
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.valuesIterator
            .foreach(_.unpersist(blocking = false))
        } catch { case _: Throwable => () }
        dt
      }
      samples.min
    }

    // warm-up (codegen + parquet footers) outside the timers
    try targets.headOption.foreach(n => SparkEntry.queries(n)(spark, sf01).count())
    catch { case t: Throwable => System.err.println(s"[sweep] warm-up failed: $t") }

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rows = targets.map { name =>
      val t01 = sweep(sf01, name)
      val t1 = sweep(sf1, name)
      val e = math.log10(t1 / t01)
      val line = s"""{"query":"$name","t_sf01":${fmt(t01)},"t_sf1":${fmt(t1)},"exponent":${fmt(e)}}"""
      println(line)
      line
    }
    val utc = java.time.Instant.now().toString
    val out =
      s"""{"sweep":"sf0.1->sf1","reps":$reps,"cpus":$cpus,"generated_utc":"$utc","rows":[${rows.mkString(",")}]}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALESWEEP.json"), out + "\n")
    catch { case t: Throwable => System.err.println(s"[sweep] write failed: $t") }
    try spark.stop() catch { case _: Throwable => () }
    println(out)
  }
}
