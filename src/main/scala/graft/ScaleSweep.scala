package graft

import org.apache.spark.sql.SparkSession

/** Growth-exponent sweep over the heavy-tail queries (round-5
  * verdict item 3; round-6 item 4 added the second decade): time each
  * target query at sf0.1 (driver data), sf1 and sf10 (ScaleUp-derived
  * 10x / 100x of the scanned tables), and report the measured growth
  * exponent e = log10(t_hi / t_lo) per decade — e ~ 1 is linear in
  * data, e ~ 2 quadratic. One decade is suggestive; two decades
  * separate a real asymptote from job-floor amortization (a query
  * whose sf0.1 time is dominated by fixed overhead shows a LOW first
  * exponent and its true one in the second decade). One JSON line per
  * query plus a combined artifact, mirroring the Bench min-of-reps
  * protocol; all scale points run in the SAME session back to back so
  * host drift cancels out of the ratio.
  *
  * Default targets are the queries the round-5/6 verdicts called most
  * load-bearing for the 100x claim: the exact similarity join, graph
  * ops, curation composites, the ANN ladder, near-dup, and the
  * relational core.
  */
object ScaleSweep {
  val DefaultTargets = Seq(
    "q151_similarity_join", "q203_kcore", "q205_hits",
    "q105_curation_pipeline", "q174_item_cosine",
    // the ANN ladder: exact brute force (now budget-capped — linear
    // scan by construction) vs the bucketed variants
    "q49_cosine_topk", "q75_ivf_ann", "q80_multiprobe_ann",
    "q215_ann_auto", "q216_ivf_index", "q119_ivfpq_ann",
    // near-dup at 10x: banded LSH and SimHash candidate generation
    "q46_minhash_neardup", "q47_simhash_fingerprint",
    // round-6 composites: community structure + the decision-layer
    // curation chain + LM-score bucketing
    "q213_label_prop", "q214_curation_v2", "q217_perplexity_buckets",
    // round-6 part 2: scan-speed classifier, source-keyed adaptive
    // threshold window, cluster-survivor composites (v2 min-id,
    // v3 quality-argmax)
    "q218_hash_classifier", "q219_adaptive_threshold",
    "q220_quality_survivor", "q225_curation_v3", "q228_ivf_auto",
    "q229_ivfadc_auto", "q230_ivf_lloyd_auto", "q235_retrieval_eval_auto",
    // relational core on the 10x lineitem/orders replicas (dims
    // fixed): scan-agg, broadcast star join, window rollup, RFM
    // quantile segmentation
    "q01_pricing_summary", "q03_star_join", "q19_monthly_rollup",
    "q163_rfm",
    // round-7 part 2: span surgery (gram + (doc,pos) shuffles),
    // trained classifier (per-round scan + 1024-group agg), and the
    // bloom-prefiltered vs exact decontamination CONTRAST PAIR (the
    // artifact is q239's shuffle bytes staying below q209's)
    "q237_dup_span_removal", "q238_trained_classifier",
    "q209_decontamination", "q239_bloom_decontam",
    // round-7 part 3: scan-speed scrub, prefix-sum packing, and the
    // pair-shaped attribution audit
    "q236_pii_scrub", "q240_context_packing", "q241_contamination_pairs",
    "q242_release_pipeline",
    // round-7 part 4: the mergeable quantile sketch (bounded-state
    // scan+agg), the release-diff changelog (PK-keyed full-outer
    // join + constant-state set checksums), and the tokenizer-fit
    // audit (vocab-bounded encode + broadcast join). Not swept:
    // q244 (fixture-backed, like the telecom queries) and q246/q247
    // (events is byte-copied by ScaleUp, so their "scale points"
    // would all scan the same data).
    "q243_hdr_quantiles", "q245_release_diff", "q248_tokenizer_fit",
    // round-7 part 5: bucketed co-located join (orders grows, the
    // exchange-free join must hold), scan-speed rule panels
    // (Gopher, blocklist, URL parse), the native grouped top-k
    // aggregate, and the bloom point-lookup index (build + probe).
    // Not swept: q257 (events is byte-copied by ScaleUp), q260/q261
    // (fixture-backed like q244).
    "q255_bucketed_join", "q256_gopher_rules", "q258_blocklist_filter",
    "q259_grouped_topk", "q262_url_panel", "q263_bloom_point_lookup",
    "q264_compaction_plan",
    // SQ8 ADC: budgeted like q49 (fixed query slice x corpus — one
    // broadcast scan, linear in corpus)
    "q265_sq8_ann",
    // star-contraction CC (the O(log n) deep-graph engine) and the
    // nested scaling ladder (one scan + bounded explode). q268 is
    // events-based (byte-copied by ScaleUp) — excluded like q246.
    "q266_starcc_clusters", "q267_scaling_ladder",
    // retention sweep: rebuilds its scratch index every run BY
    // CONTRACT (a sweep is destructive), so the measured time is
    // build + candidate-pruned rewrite — both linear
    "q269_retention_sweep",
    // contrastive mining: q49's budgeted broadcast scan shape
    "q270_contrastive_mining",
    // one-pass rollup top-k panel; LSH tuner (linear adjacent-pair
    // kernel + constant config math)
    "q271_topk_panel", "q272_lsh_tuner",
    // release novelty (gram-keyed left join, q209's shuffle class)
    // and the class-scatter moment cells (|labels|·d aggregate)
    "q275_release_novelty", "q276_class_scatter",
    // round-8: the previously-unswept heavy tail (verdict item 1) —
    // the suffix-rank panel (heaviest query in the suite), the exact
    // percentile reducer, prefix-candidate decontamination, integer
    // PageRank, density outliers, the rule-gate report, and the PCA
    // family's two distributed faces (moment pass q187, memoized-
    // direction projection q189; q188's eigen loop is driver-side
    // constant — see NotSwept)
    "q250_suffix_panel", "q85_sample_quantiles", "q63_contamination",
    "q135_pagerank", "q185_density_outliers", "q212_filter_report",
    "q187_embedding_cov", "q189_pca_project",
    // round-8 new queries: gram-keyed vocab curve, unpivoted stats
    // scan (both measured sublinear, zero spill)
    "q277_shard_vocab_curve", "q278_column_stats",
    // round-12: tier-1 SRP retrieval (18-bit bands pinned via
    // forceBits — hyper-sparse buckets at every committed scale, so
    // candidates are genuine near-neighbors) and the SERVED auto-IVF
    // (persisted ⌈√n⌉ index + budgeted query batch — the production
    // serving shape whose flatness q228's inline e≈1.46 is contrasted
    // against)
    "q279_ann_tier1", "q280_ivf_auto_served")

  /** Queries excluded from the sf1→sf10 decade, each with its
    * documented ceiling — these are superlinear BY CONSTRUCTION, so
    * timing them at 100x measures the documented property (and ~an
    * hour of wall clock), not plan quality:
    *  - q151 exact similarity self-join is Ω(output) for ANY
    *    algorithm and its PAIR COUNT grows at a measured exponent of
    *    ~2.0 per decade (self-similar corpus); the sub-output path is
    *    the LSH family (q46), which IS swept.
    *  - q80 fixed-resolution SRP-LSH is the documented contrast
    *    baseline for q215's auto-scaled variant (bucket occupancy
    *    grows linearly at fixed band bits).
    */
  val Decade2Excluded: Map[String, String] = Map(
    "q151_similarity_join" ->
      "output-bound: pair count grows ~quadratically by construction; LSH family is the scale path",
    "q80_multiprobe_ann" ->
      "fixed-resolution contrast baseline for q215 (documented e~1.1)",
    // r8 decade-1 measurements on the self-similar replica corpus:
    // both are candidate-pair kernels whose PAIR COUNT is the output
    // of interest — replicating every doc ~100x multiplies both join
    // sides of every shared token/grid cell, so candidates grow
    // ~quadratically BY CORPUS CONSTRUCTION (q151's class, not a plan
    // defect; shuffle at sf10 projected ~400 GB, aborted at 34 GB).
    "q63_contamination" ->
      "prefix-candidate generation is output-bound on the replica corpus: d1 measured e_sh=2.016 (pair count ~quadratic under 10x replication); the bloom-prefiltered q239 and banded q46 are the swept scale paths",
    "q185_density_outliers" ->
      "grid-cell neighbor pairs are output-bound on the replica corpus: d1 measured e_sh=1.918 (replicas co-locate in cells); the banded/bucketed similarity family is the swept scale path")
    // the fixed-16 IVF family (q75/q216/q119) measured e=2.10/2.03/
    // 1.85 with 8-13 GB spill at sf10 in r7 under corpus-proportional
    // query load; round 8 applied the q49 sampled contract
    // (FixedIvfQueryBudget md5 slice), so all three re-entered the
    // second decade — the linear fixed-occupancy growth is now the
    // measured contrast to q228/q229's auto codebooks.

  /** Heavy-tail bench queries (≥3 s in BENCH_DETAIL) deliberately NOT
    * swept, each with its measured-evidence substitute — emitted into
    * the artifact so "every expensive query has an exponent or a
    * named reason" is machine-checkable. */
  val NotSwept: Map[String, String] = Map(
    "q165_bootstrap_ci" ->
      "events table is byte-copied by ScaleUp (no scaled decades exist); plan is one fixed 40-way replicate fan-out + groupBy — linear in events by construction",
    "q261_stream_join_face" ->
      "fixture-backed probe stream (fixed 24h synthetic probes at every scale dir), so scale points rescan identical fixture data; state boundedness is evidenced by StreamEnrichSpec's eviction plateau and the stream_state soak instead",
    "q188_pca_power" ->
      "driver-side d x d eigen solve over the collected moment cells (2080 rows, constant in corpus size) behind the session direction memo; the data-sized moment pass is swept as q187, the projection as q189")

  /** Queries worth a third measured decade, two groups. FLAT claims
    * (round-8 verdict item 6): q255's exchange-free bucketed join
    * (shuffle bytes must stay flat at 1000×) and the byte-bounded
    * top-k heap aggregates. HEADLINE COMPOSITES (round-9 verdict
    * item 1): the end-to-end curation/release pipelines and banded
    * LSH near-dup — the operators a 100 TB corpus actually runs, so
    * "survives 100×" needs a measured sf10→sf100 row, not an
    * extrapolation from two decades. Opt-in via SPARK_GRAFT_SF100=1 —
    * the sf100 derivation writes ~13 GB under target/ (measured),
    * well inside the sandbox disk budget. */
  val ThirdDecadeTargets = Seq(
    "q255_bucketed_join", "q259_grouped_topk", "q271_topk_panel",
    "q105_curation_pipeline", "q225_curation_v3",
    "q242_release_pipeline", "q46_minhash_neardup",
    // round-10 item 2: the REGISTERED SCALE PATHS themselves — each
    // is named as "the path X takes at corpus scale" for an exact
    // counterpart proven superlinear (q228/q229 for the fixed-16 IVF
    // family, q243/q249 for the exact percentile reducers, q239 for
    // exact decontamination q63/q209), so the recommendation needs a
    // measured sf10→sf100 row, not a two-decade extrapolation
    "q228_ivf_auto", "q229_ivfadc_auto", "q243_hdr_quantiles",
    "q249_length_panel", "q239_bloom_decontam",
    // round-11 item 3: the last two registered scale paths without a
    // committed d3 row — q230 (Lloyd-refined auto-IVF; its sf100
    // zero-spill audit existed only as a PLANS.md addendum) and q215
    // (corpus-scaled SRP, the recommended ANN serving path whose d3
    // behavior was inferred from q228's)
    "q230_ivf_lloyd_auto", "q215_ann_auto",
    // round-12 (r11 verdict item 2): the suite's two heaviest
    // NON-excluded queries get measured d3 rows instead of
    // sf100-narrative-only evidence; q250 is Decade3Excluded (disk)
    "q237_dup_span_removal", "q241_contamination_pairs",
    // round-12 (r11 verdict item 4): the served auto-IVF path — the
    // production serving shape whose d3 row is the amortization claim
    "q280_ivf_auto_served",
    // round-12: tier-1 SRP retrieval over the bounded md5 query
    // batch — sf100's 2M vectors at pinned bits=18 give real bucket
    // collisions (occupancy ≈ 7.6 per band), the first committed
    // scale where tier-1 keys retrieve from non-singleton buckets
    "q279_ann_tier1")

  /** Queries excluded from the sf10→sf100 decade, with the measured
    * budget that excludes them — the artifact is the contract (r11
    * verdict item 2), so "too big to run here" must be machine-
    * readable, not narrative. */
  val Decade3Excluded: Map[String, String] = Map(
    "q250_suffix_panel" ->
      ("disk budget: the sf10 point measures 41 GB shuffle write + 140 GB scan " +
        "(BENCH_LOWMEM sf10 profile); at measured e_shuffle 0.982 the sf100 run " +
        "projects ~400 GB of shuffle against ~65 GB free sandbox disk. Its d2 row " +
        "(e=0.829, e_shuffle=0.982) and the 8 GiB/sf10 bounded-spill bit-identical " +
        "run are the committed scale evidence"))

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val sf10 = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "target/sf10")
    val sf100 = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "target/sf100")
    // second decade on by default; SPARK_GRAFT_SF10=0 skips it (fast
    // dev loop on the first decade only)
    val runDecade2 = sys.env.getOrElse("SPARK_GRAFT_SF10", "1") != "0"
    // third decade is opt-in (SPARK_GRAFT_SF100=1): ~14 GB on disk +
    // minutes-long points, for the ThirdDecadeTargets flat-claims only
    val runDecade3 = sys.env.getOrElse("SPARK_GRAFT_SF100", "0") == "1"
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
    // sf10 compounds the derivation: 10 replicas OF sf1 (texts pick up
    // a second perturbation pass — still self-similar, which is the
    // stress the sweep wants)
    if (runDecade2 && !ScaleUp.isComplete(sf10, sf1, replicas = 10)) {
      System.err.println(s"[sweep] generating $sf10 from $sf1 ...")
      ScaleUp.writeAll(spark, sf1, sf10, replicas = 10)
    }
    val targets =
      if (args.nonEmpty) args.toSeq.flatMap(a =>
        SparkEntry.queries.keys.filter(k => k == a || k.takeWhile(_ != '_') == a))
      else DefaultTargets

    // sf100 generation only when a requested target will actually
    // sweep it — SPARK_GRAFT_SF100=1 plus a targeted non-d3 query
    // list would otherwise derive ~13 GB the run never reads
    // (mirrors the d3 decade guard below; round-8 advice)
    if (runDecade3 && targets.exists(ThirdDecadeTargets.contains) &&
        !ScaleUp.isComplete(sf100, sf10, replicas = 10)) {
      System.err.println(s"[sweep] generating $sf100 from $sf10 ...")
      ScaleUp.writeAll(spark, sf10, sf100, replicas = 10)
    }

    // Profiled alongside the timers: shuffle BYTES are deterministic
    // (same plan + same data = same bytes, rep after rep), so the
    // byte exponents are the noise-free companion to the wall-clock
    // ones — a time exponent inflated by host drift shows flat bytes,
    // and a plan whose data movement secretly grows superlinearly is
    // caught even on a quiet host. Profile covers the FIRST rep only.
    val profiler = TaskMetricsProfiler.install(spark)
    // noop-sink forcing, matching Bench: count() lets the optimizer
    // prune result expressions and even whole unique-keyed left
    // joins (see Bench.force scaladoc — the round-7 q237 finding)
    def sweep(dir: String, name: String): (Double, TaskMetricsProfiler.Profile) = {
      val fn = SparkEntry.queries(name)
      var profile: TaskMetricsProfiler.Profile = null
      val samples = (1 to reps).map { r =>
        if (r == 1) profiler.reset()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (r == 1) profile = profiler.snapshot(spark)
        try {
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.valuesIterator
            .foreach(_.unpersist(blocking = false))
        } catch { case _: Throwable => () }
        dt
      }
      (samples.min, profile)
    }

    // warm-up (codegen + parquet footers) outside the timers
    try targets.headOption.foreach(n => SparkEntry.queries(n)(spark, sf01)
      .write.format("noop").mode("overwrite").save())
    catch { case t: Throwable => System.err.println(s"[sweep] warm-up failed: $t") }

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def decade(label: String, lo: String, hi: String,
               names: Seq[String]): String = {
      val rows = names.map { name =>
        val (tLo, pLo) = sweep(lo, name)
        val (tHi, pHi) = sweep(hi, name)
        val e = math.log10(tHi / tLo)
        // byte exponents: shuffle write (data movement) and scan input;
        // null when a side is zero (scan-only plans don't shuffle)
        def bexp(a: Long, b: Long): String =
          if (a > 0 && b > 0) fmt(math.log10(b.toDouble / a.toDouble)) else "null"
        val fields =
          s""""query":"$name","t_lo":${fmt(tLo)},"t_hi":${fmt(tHi)},"exponent":${fmt(e)},""" +
            s""""shuffle_lo":${pLo.shuffleWriteBytes},"shuffle_hi":${pHi.shuffleWriteBytes},""" +
            s""""e_shuffle":${bexp(pLo.shuffleWriteBytes, pHi.shuffleWriteBytes)},""" +
            s""""input_lo":${pLo.inputBytes},"input_hi":${pHi.inputBytes},""" +
            s""""e_input":${bexp(pLo.inputBytes, pHi.inputBytes)},""" +
            s""""spill_hi":${pHi.diskSpillBytes}"""
        println(s"""{"decade":"$label",$fields}""") // one object per line: greppable progress log
        s"{$fields}"
      }
      s"""{"decade":"$label","rows":[${rows.mkString(",")}]}"""
    }

    val d1 = decade("sf0.1->sf1", sf01, sf1, targets)
    val d2 =
      if (runDecade2)
        Seq(decade("sf1->sf10", sf1, sf10,
          targets.filterNot(Decade2Excluded.contains)))
      else Nil
    val d3 =
      if (runDecade3 && targets.exists(ThirdDecadeTargets.contains))
        Seq(decade("sf10->sf100", sf10, sf100,
          targets.filter(ThirdDecadeTargets.contains)))
      else Nil
    val excluded = Decade2Excluded
      .map { case (q, why) => s"""{"query":"$q","reason":"$why"}""" }
      .mkString("[", ",", "]")
    val excluded3 = Decade3Excluded
      .map { case (q, why) => s"""{"query":"$q","reason":"$why"}""" }
      .mkString("[", ",", "]")
    val notSwept = NotSwept
      .map { case (q, why) => s"""{"query":"$q","reason":"$why"}""" }
      .mkString("[", ",", "]")
    val utc = java.time.Instant.now().toString
    val out =
      s"""{"reps":$reps,"cpus":$cpus,"generated_utc":"$utc","decade2_excluded":$excluded,"decade3_excluded":$excluded3,"not_swept":$notSwept,"sweeps":[${((d1 +: d2) ++ d3).mkString(",")}]}"""
    // Runs MERGE into the artifact by (decade, query): a targeted run
    // (query args — the fix-one-query dev loop) never clobbers the
    // other rows of evidence, and a full run keeps decades it did not
    // re-measure (the opt-in sf10->sf100 rows would otherwise vanish
    // on every default run). A methodology change that invalidates
    // ALL prior rows (like r7's count()->noop forcing) sets
    // SPARK_GRAFT_SWEEP_OVERWRITE=1 to start the artifact fresh.
    val overwrite = sys.env.getOrElse("SPARK_GRAFT_SWEEP_OVERWRITE", "0") == "1"
    val merged =
      if (overwrite) out
      else try mergeArtifact(java.nio.file.Paths.get("SCALESWEEP.json"), out)
      catch { case t: Throwable =>
        System.err.println(s"[sweep] merge failed, writing this run alone: $t"); out }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALESWEEP.json"), merged + "\n")
    catch { case t: Throwable => System.err.println(s"[sweep] write failed: $t") }
    try spark.stop() catch { case _: Throwable => () }
    println(merged)
  }

  /** Merge `runJson` (this run) into the artifact at `path`: rows
    * replace same-(decade, query) rows, new queries append, untouched
    * decades/rows survive; reps/cpus/timestamp come from this run.
    * Jackson (Spark's bundled JSON stack) both parses and re-emits,
    * so the merged file is valid by construction. */
  private[graft] def mergeArtifact(path: java.nio.file.Path, runJson: String): String = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
    val run = mapper.readTree(runJson).asInstanceOf[ObjectNode]
    if (!java.nio.file.Files.exists(path)) return runJson
    val base = mapper.readTree(java.nio.file.Files.readString(path)).asInstanceOf[ObjectNode]
    val baseSweeps = base.withArray[ArrayNode]("sweeps")
    run.withArray[ArrayNode]("sweeps").elements().asScala.foreach { runDec =>
      val label = runDec.get("decade").asText()
      baseSweeps.elements().asScala.find(_.get("decade").asText() == label) match {
        case None => baseSweeps.add(runDec)
        case Some(baseDec) =>
          val rows = baseDec.asInstanceOf[ObjectNode].withArray[ArrayNode]("rows")
          runDec.get("rows").elements().asScala.foreach { runRow =>
            val q = runRow.get("query").asText()
            val idx = rows.elements().asScala.indexWhere(_.get("query").asText() == q)
            if (idx >= 0) rows.set(idx, runRow) else rows.add(runRow)
          }
      }
    }
    Seq("reps", "cpus", "generated_utc", "decade2_excluded",
        "decade3_excluded", "not_swept")
      .filter(run.has)
      .foreach(f => base.set[ObjectNode](f, run.get(f)))
    mapper.writeValueAsString(base)
  }
}
