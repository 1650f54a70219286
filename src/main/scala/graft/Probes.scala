package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence-gathering harnesses behind the scale-sweep attributions
  * (round-9 verdict items 2 and 6). These are not queries — they
  * print the per-round / per-bucket numbers that turn a measured
  * growth exponent into an explained one, and PLANS.md cites their
  * output. Both mirror ScaleSweep's session shape (local[cpus],
  * shuffle.partitions = cpus) so the numbers live in the same regime
  * as the sweep rows they explain.
  */
object Probes {
  private[graft] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private[graft] def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)
}

/** Per-round timing of q250's prefix-doubling loop at each given
  * scale dir — separates the two candidate causes of the measured
  * d2 residual time exponent (e=1.175 vs e_shuffle=1.015): more
  * per-row work per round (would show a uniform per-round exponent
  * >1) vs more rounds (would show a changed round count). One JSON
  * line per round with the dense-rank stats leg and the rank-apply
  * leg timed separately, plus a summary line per dir. */
object SuffixRankProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("target/sf1", "target/sf10")
    val spark = Probes.session()
    import Probes.fmt
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val t0 = System.nanoTime()
      val rounds = scala.collection.mutable.ArrayBuffer
        .empty[graft.operators.SuffixRank.RoundProbe]
      val r = graft.operators.SuffixRank.ranks(
        docs, "doc_id", "text", maxLen = 240, onRound = rounds += _)
      val n = r.count() // already materialized by the last round's cut
      val total = (System.nanoTime() - t0) / 1e9
      rounds.foreach { p =>
        println(s"""{"probe":"suffix_round","dir":"$dir","shift":${p.shift},""" +
          s""""distinct":${p.distinct},"stats_secs":${fmt(p.statsSecs)},""" +
          s""""apply_secs":${fmt(p.applySecs)}}""")
      }
      println(s"""{"probe":"suffix_summary","dir":"$dir","rows":$n,""" +
        s""""rounds":${rounds.size},"total_secs":${fmt(total)},""" +
        s""""stats_secs":${fmt(rounds.map(_.statsSecs).sum)},""" +
        s""""apply_secs":${fmt(rounds.map(_.applySecs).sum)}}""")
      System.out.flush()
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}

/** Per-STAGE task-metrics audit for one query at one scale dir: the
  * suite profiler aggregates per QUERY, which locates a regression
  * but not the operator — this prints one JSON line per completed
  * stage (name, tasks, input/shuffle/spill bytes) so a deterministic
  * spill can be pinned to the exchange/sort/aggregate that paid it
  * (used to attribute q225's sf100 spill, round 9). */
object SpillAudit {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "target/sf100"
    val spark = Probes.session()
    import Probes.fmt
    val sc = spark.sparkContext
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null) {
          val j = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
          rows.add(s"""{"stage":${si.stageId},"name":${
            j.writeValueAsString(si.name.take(160))},"tasks":${si.numTasks},""" +
            s""""input":${m.inputMetrics.bytesRead},""" +
            s""""shuffle_read":${m.shuffleReadMetrics.totalBytesRead},""" +
            s""""shuffle_write":${m.shuffleWriteMetrics.bytesWritten},""" +
            s""""mem_spill":${m.memoryBytesSpilled},"disk_spill":${m.diskBytesSpilled},""" +
            s""""site":${j.writeValueAsString(
              si.details.linesIterator.take(6).mkString(" | ").take(500))}}""")
        }
      }
    })
    val df = SparkEntry.queries(name)(spark, dir)
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      System.err.println(df.queryExecution.executedPlan.toString)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    // stop() drains the async listener bus BEFORE the rows are read:
    // onStageCompleted events are delivered off-thread, so printing
    // right after the action returns can miss trailing stages and
    // under-report spill (round-9 advice).
    try spark.stop() catch { case _: Throwable => () }
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq.foreach(println)
    println(s"""{"query":"$name","dir":"$dir","secs":${fmt(dt)}}""")
  }
}

/** Bucket-occupancy census of q215's auto-SRP configuration at each
  * given scale dir: the corpus count picks bits-per-band via
  * [[graft.operators.Similarity.autoBits]] (target occupancy 40,
  * capped at 32 by the two-tier 256-plane pool — the round-11 lift.
  * The lift is FORWARD-LOOKING: sf100's 2M-vector corpus sits BELOW
  * the old 16-bit cap — bits=16 chosen naturally, occupancy ~30.5,
  * 77% of the 40·2^16 ≈ 2.6M saturation point — and its 14.3 GB
  * spill came from the three since-fixed plan defects (broadcast
  * bucket join, default-partition candidate exchanges, wide window
  * sort), not from occupancy growth; the cap would have bound one
  * decade later), and this prints the REALIZED occupancy — bucket
  * count, mean/p95/max bucket size, and mean primary-probe
  * candidates per query. With the lifted cap, occupancy should sit
  * near the target at EVERY sweep decade. */
object SrpOccupancyProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("target/sf1", "target/sf10")
    val spark = Probes.session()
    import Probes.fmt
    import graft.operators.Similarity
    val bands = 8
    val blockBits = 16
    val pool = Similarity.planes(256, 64)
    val tiers = pool.length / (bands * blockBits)
    dirs.foreach { dir =>
      val c = Tables.embeddings(spark, dir)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("query_vec"))
      val n = c.count()
      val bits = Similarity.autoBits(n, targetBucket = 40L,
        maxBits = tiers * blockBits)
      val psUsed = Similarity.srpPoolSlice(pool, bands, blockBits, bits)
      val keyed = c.select(col("vec_id"),
          posexplode(Similarity.srpBandKeys(col("query_vec"), psUsed, bands, bits))
            .as(Seq("band", "key")))
      val occ = keyed.groupBy("band", "key").count().persist()
      val stats = occ.agg(
        count(lit(1)).as("buckets"),
        avg(col("count")).as("mean"),
        expr("percentile_approx(count, 0.95)").as("p95"),
        max(col("count")).as("max")).head()
      // primary-probe candidate volume: each query scans its own
      // bucket in every band (multi-probe adds 2 one-bit flips of the
      // same expected size — a constant factor, omitted here)
      val queries = keyed.filter(col("vec_id") % 10 === 0)
      val cand = queries.join(occ, Seq("band", "key"))
        .agg(sum(col("count")).as("cand"),
          countDistinct(col("vec_id")).as("nq")).head()
      occ.unpersist(blocking = false)
      println(s"""{"probe":"srp_occupancy","dir":"$dir","n":$n,"bits":$bits,""" +
        s""""bands":$bands,"target_bucket":40,""" +
        s""""buckets_used":${stats.getLong(0)},""" +
        s""""mean_occ":${fmt(stats.getDouble(1))},""" +
        s""""p95_occ":${stats.getLong(2)},"max_occ":${stats.getLong(3)},""" +
        s""""queries":${cand.getLong(1)},""" +
        s""""mean_candidates_per_query":${fmt(
          cand.getLong(0).toDouble / math.max(1L, cand.getLong(1)))}}""")
      System.out.flush()
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}
