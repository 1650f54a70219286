package graft.queries

import java.sql.Timestamp
import graft.telecom._
import graft.streaming.FraudDetection
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Telecom medallion-pipeline queries over the deterministic seeded
  * generators (the reference's own domain: SURVEY.md S1-S3 producers
  * → silver → gold). The generated bronze inputs are materialized to
  * a fixed parquet fixture path and read back, so the pipeline and
  * the DuckDB oracle consume byte-identical input — the full
  * silver→gold SQL (dedup windows, star joins, rollups, fraud
  * windows) is then hash-checked end to end, not just component-wise.
  * Output timestamps are emitted as formatted strings (the driver's
  * canonicalizer compares tz-aware vs naive timestamps unreliably).
  */
object TelecomOps {

  type Q = (SparkSession, String) => DataFrame

  /** Fixed absolute fixture path — it must appear verbatim inside the
    * oracle SQL text, which the driver's DuckDB executes from an
    * unknown working directory. */
  private[graft] val FixtureDir = "/root/repo/target/telecom_fixture"

  /** Scale the generated fixture with the requested sf directory so
    * Bench exercises a larger pipeline at sf0.1. */
  private def genSize(dir: String): Int =
    if (dir.contains("sf0.1")) 200000 else if (dir.contains("sf0.01")) 20000 else 2000

  /** Bump when a generator or its schema changes — stale fixtures
    * must never satisfy the marker check. */
  private val FixtureVersion = "v3" // v3: corrupt-record injection

  /** Materialize a generated bronze input and read it back, so the
    * Spark pipeline and the DuckDB oracle see the same bytes. Content
    * is deterministic in (version, size); each size gets its own
    * directory so runs at different scale factors never clobber each
    * other — in particular, a sf0.1 Bench run can never rewrite the
    * sf0.01 fixture the correctness oracle reads (the driver's gate
    * runs at sf0.01 per contract, so oracle SQL hardcodes those
    * paths). A marker file lets repeat runs (q60/q61/q62 share the
    * calls fixture) skip the rewrite. */
  private def fixture(s: SparkSession, df: => DataFrame, name: String,
                      size: Int): DataFrame = {
    val path = s"$FixtureDir/${name}_n$size"
    val marker = new java.io.File(s"$path/_graft_$FixtureVersion")
    if (!marker.exists()) {
      df.write.mode("overwrite").parquet(path) // oracle globs *.parquet
      marker.createNewFile()
    }
    s.read.parquet(path)
  }

  /** Pre-materialize every fixture this module's queries read, so
    * Bench can exclude input materialization from per-query timers —
    * fixtures are the stand-in for the driver's parquet tables, not
    * pipeline work (the timed queries still scan them from disk). */
  private[graft] def warmFixtures(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    bronzeCalls(s, dir)
    bronzeDataSessions(s, dir)
    bronzeSms(s, dir)
    fixture(s, Generators.probeEvents(s, hours = 24).toDF(), "probes", 24)
    fixture(s, Generators.crmCustomers(s, n = 200).toDF(), "customers", 200)
  }

  /** One sf-scaled bronze fixture per CDR topic — the generator and
    * fixture name are the only variation points. */
  private def sizedFixture(s: SparkSession, dir: String, name: String)
                          (gen: Int => DataFrame): DataFrame = {
    val n = genSize(dir)
    fixture(s, gen(n), name, n)
  }

  private def bronzeCalls(s: SparkSession, dir: String): DataFrame =
    sizedFixture(s, dir, "calls")(n => Generators.callEvents(s, n = n).toDF())

  private def bronzeDataSessions(s: SparkSession, dir: String): DataFrame =
    sizedFixture(s, dir, "data_sessions")(n =>
      Generators.dataSessionEvents(s, n = n).toDF())

  private def bronzeSms(s: SparkSession, dir: String): DataFrame =
    sizedFixture(s, dir, "sms")(n => Generators.smsEvents(s, n = n).toDF())

  /** Full bronze→silver→gold run: generated CDRs + probes → dedup →
    * conformed silver → tower-hourly utilization rollup (A1-A4, J4). */
  def q60TowerHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val silverCalls = Silver.silverCalls(bronzeCalls(s, dir))
    val silverProbes = Silver.silverProbes(
      fixture(s, Generators.probeEvents(s, hours = 24).toDF(), "probes", 24))
    Gold.aggTowerHourly(silverProbes, silverCalls)
      .withColumn("hour", date_format(col("hour"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("tower_id", "hour")
  }

  /** Hourly per-tower rollup over the 60%-weighted DATA topic — the
    * reference's A1/A3 rollup shape applied to data sessions: session
    * counts, exact byte sums, 5G share, decimal-exact latency mean
    * and revenue. One keyed aggregation; bytes are long sums (exact),
    * money/fractions go through DECIMAL (Funcs.dsum/davg). */
  def q107DataSessionRollup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Funcs
    bronzeDataSessions(s, dir)
      .withColumn("hour",
        date_trunc("hour", to_timestamp(col("session_start_timestamp"))))
      .groupBy("tower_id", "hour")
      .agg(
        count(lit(1)).as("session_count"),
        sum(col("total_bytes")).as("total_bytes"),
        Funcs.countIf(col("radio_technology").startsWith("5G")).as("sessions_5g"),
        Funcs.davg(col("latency_ms")).as("avg_latency_ms"),
        Funcs.dsum(col("revenue_usd"), 6).as("revenue_usd"))
      .withColumn("hour", date_format(col("hour"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("tower_id", "hour")
  }

  /** SMS delivery quality per (tower, sms_type) — the reference's A3
    * conditional-counter shape on the 10%-weighted topic: status
    * counts plus a decimal-exact delivery rate (the GX-style
    * `mostly`-gate numerator/denominator, materialized per tower). */
  def q108SmsDelivery(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Funcs
    bronzeSms(s, dir)
      .groupBy("tower_id", "sms_type")
      .agg(
        count(lit(1)).as("sms_count"),
        Funcs.countIf(col("delivery_status") === "DELIVERED").as("delivered"),
        Funcs.countIf(col("delivery_status") === "FAILED").as("failed"),
        Funcs.countIf(col("delivery_status") === "PENDING").as("pending"),
        sum(col("message_size_bytes").cast("long")).as("total_bytes"),
        Funcs.matchRate(col("delivery_status") === "DELIVERED").as("delivery_rate"))
      .orderBy("tower_id", "sms_type")
  }

  /** Star-schema fact build (J1-J3 broadcast joins) + monthly rollup
    * (A5, J5), returning the monthly summary. */
  def q61CustomerMonthly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val silverCalls = Silver.silverCalls(bronzeCalls(s, dir))
    val silverCustomers = Silver.silverCustomers(
      fixture(s, Generators.crmCustomers(s, n = 200).toDF(), "customers", 200))
    val dimC = Gold.dimCustomers(silverCustomers)
    val fact = Gold.factCalls(silverCalls, dimC,
      Gold.dimTowers(s.createDataFrame(Generators.towers())), Gold.dimDate(s))
    Gold.aggCustomerMonthly(fact, dimC)
      .orderBy("customer_id", "year_month")
  }

  /** Batch fraud detection (W4+W5 formulation of the streaming rules)
    * over generated calls with planted fraud patterns. */
  def q62FraudAlerts(s: SparkSession, dir: String): DataFrame = {
    val calls = bronzeCalls(s, dir)
      .select(
        col("caller_customer_id").as("customer_id"),
        col("event_id"),
        to_timestamp(col("call_start_timestamp")).as("ts"),
        col("cell_lat").as("lat"), col("cell_lon").as("lon"),
        col("tower_id"))
    FraudDetection.detectBatch(calls)
      .withColumn("event_ts", date_format(col("event_ts"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("alert_id")
  }

  /** Quarantine audit (P2's complement): the corrupt bronze rows the
    * silver hard filter rejects, reason-coded for triage. */
  def q81Quarantine(s: SparkSession, dir: String): DataFrame =
    Silver.quarantineCalls(bronzeCalls(s, dir))
      .orderBy("_kafka_offset")

  /** Erlang-B blocking probability per tower — THE telecom capacity
    * metric (the reference monitors load%; a capacity planner wants
    * blocked-call probability). Busy-hour offered load E = max over
    * hours of Σ duration/3600; B(E, m) comes from the standard
    * recurrence B_k = E·B_{k−1}/(k + E·B_{k−1}), B₀ = 1, folded over
    * k = 1..8 channels — both engines run the identical 8-step
    * sequential fold (aggregate ↔ list_reduce), so the doubles agree
    * bit-for-bit (q164's argument). Shapes: the hourly rollup and
    * per-tower max are keyed aggs; the fold is scan-speed. */
  def q169ErlangBlocking(s: SparkSession, dir: String): DataFrame = {
    val sc = Silver.silverCalls(bronzeCalls(s, dir))
    val hourly = sc
      .groupBy(col("tower_id"), date_trunc("hour", col("call_start_ts")).as("hour"))
      .agg(sum(col("duration_seconds")).as("secs"))
      .withColumn("erlangs", col("secs").cast("double") / 3600.0)
    val busy = hourly.groupBy("tower_id")
      .agg(max(col("erlangs")).as("busy_hour_erlangs"),
        sum(col("secs")).as("total_secs"))
    val e = col("busy_hour_erlangs")
    val b = aggregate(sequence(lit(1), lit(8)), lit(1.0),
      (acc, k) => e * acc / (k.cast("double") + e * acc))
    busy.withColumn("channels", lit(8))
      .withColumn("blocking_prob", b.cast("double"))
      .withColumn("meets_2pct_gate", col("blocking_prob") <= 0.02)
      .select("tower_id", "busy_hour_erlangs", "total_secs", "channels",
        "blocking_prob", "meets_2pct_gate")
      .orderBy("tower_id")
  }

  /** Peak concurrent calls per tower (max simultaneous channel
    * occupancy) by the sweep-line idiom: ±1 deltas at call start/end,
    * NETTED per (tower, instant) first — so the running sum orders by
    * strictly unique timestamps and window-tie nondeterminism cannot
    * exist — then a keyed running sum and its max. A call ending at t
    * and one starting at t net to zero (no overlap at boundaries),
    * which nets the same running max as end-before-start. All keyed
    * windows; nothing global. */
  def q170PeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val sc = Silver.silverCalls(bronzeCalls(s, dir))
      .select(col("tower_id"),
        unix_micros(col("call_start_ts")).as("s_us"),
        (unix_micros(col("call_start_ts")) +
          col("duration_seconds") * 1000000L).as("e_us"))
    val deltas = sc.select(col("tower_id"), col("s_us").as("ts_us"), lit(1L).as("d"))
      .unionAll(sc.select(col("tower_id"), col("e_us").as("ts_us"), lit(-1L).as("d")))
      .groupBy("tower_id", "ts_us").agg(sum(col("d")).as("net"))
    val w = Window.partitionBy("tower_id").orderBy("ts_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = deltas.withColumn("conc", sum(col("net")).over(w))
      .withColumn("pk", max(col("conc")).over(Window.partitionBy("tower_id")))
    val peaks = run.filter(col("conc") === col("pk"))
      .groupBy("tower_id")
      .agg(max(col("pk")).as("peak_concurrent"), min(col("ts_us")).as("peak_us"))
    val counts = sc.groupBy("tower_id").agg(count(lit(1)).as("n_calls"))
    counts.join(peaks, "tower_id")
      .select(col("tower_id"), col("n_calls"), col("peak_concurrent"),
        date_format(timestamp_micros(col("peak_us")), "yyyy-MM-dd HH:mm:ss")
          .as("peak_at"))
      .orderBy("tower_id")
  }

  /** ST7's tumbling-window aggregate, oracle-checked through its
    * BATCH formulation: WindowedAggs.towerLoadWindows is the exact
    * code the streaming job runs (Spark's unified semantics — the
    * watermark node is eliminated on a batch frame), applied to the
    * driver's events table recast as a probe stream. The DuckDB
    * oracle recomputes the epoch-aligned hourly windows as
    * date_trunc; hash equality certifies the streaming operator's
    * window/agg semantics, shrinking the spec-only streaming set
    * (round-6 verdict item 7). Loads are rounded to integer units so
    * every aggregate is exact cross-engine (sums < 2^53). */
  def q226WindowedRollup(s: SparkSession, dir: String): DataFrame = {
    val probes = graft.Tables.events(s, dir).select(
      col("ts").as("probe_ts"),
      concat(lit("T"), (col("user_id") % 16).cast("string")).as("tower_id"),
      round(col("value")).cast("long").as("load_pct"))
    graft.streaming.WindowedAggs.towerLoadWindows(probes)
      .withColumn("window_start",
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("window_end",
        date_format(col("window_end"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("window_start", "tower_id")
  }

  /** ST4/S5's partitioned landing layout, oracle-checked: land the
    * events table through Bronze.writeLanding (Hive year/month/day
    * layout, the micro-batch sink's exact write path), read it back
    * through partition discovery, and emit per-partition row counts
    * + id checksums. The DuckDB oracle derives the same figures from
    * the RAW table, so a hash match certifies the landing round-trip
    * (partition derivation, write, discovery) is lossless — the
    * batch-expressible core of the streaming sink. The landing dir
    * is rebuilt from scratch each run (writeLanding appends by
    * contract, as a sink must). */
  def q227LandingLayout(s: SparkSession, dir: String): DataFrame = {
    val path = "target/graft_landing/" + dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(path), true)
    Bronze.writeLanding(graft.Tables.events(s, dir), path, "ts")
    s.read.parquet(path)
      .groupBy(col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        col("day").cast("int").as("day"))
      .agg(
        count(lit(1)).as("row_count"),
        sum(col("event_id")).as("id_sum"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy("year", "month", "day")
  }

  /** Repo-committed seed path — seeds are version-controlled inputs
    * (the dbt seed model, reference dbt_project/seeds/
    * towers_seed.csv:1); the oracle reads the same file. */
  private[graft] val TowersSeedPath = "/root/repo/seeds/towers_seed.csv"

  private val towersSeedSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("tower_id", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("city", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("state", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("latitude", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("longitude", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("tower_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("capacity_erlangs", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("radio_technology", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("install_date", org.apache.spark.sql.types.DateType),
    org.apache.spark.sql.types.StructField("last_maintenance_date", org.apache.spark.sql.types.DateType),
    org.apache.spark.sql.types.StructField("is_active", org.apache.spark.sql.types.BooleanType)))

  /** S9 as an oracle row: the committed towers seed through
    * Seeds.loadCsv's explicit-schema contract (no inference) — typed
    * doubles/dates/booleans land as declared, plus one derived date
    * arithmetic column both engines compute on DATE values. Constant
    * in `dir` by design: a seed is the same at every scale factor. */
  def q231SeedTowers(s: SparkSession, dir: String): DataFrame =
    graft.sources.Seeds.loadCsv(s, TowersSeedPath, towersSeedSchema)
      .filter(col("is_active"))
      .withColumn("maintained_after_days",
        datediff(col("last_maintenance_date"), col("install_date")))
      .orderBy("tower_id")

  /** U2 as an oracle row: Checks.schemaDiff of the documents table
    * against a drifted contract (expects `quality`, does not expect
    * `n_chars`) rendered as (column_name, status) rows — the
    * schema-drift report a contract gate publishes. The oracle
    * recomputes it from DESCRIBE against the same view. */
  def q232SchemaDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val expected = Seq("doc_id", "text", "lang", "source", "quality")
    val df = graft.Tables.documents(s, dir)
    val (missing, unexpected) = graft.telecom.Checks.schemaDiff(df, expected.toSet)
    val rows =
      expected.filterNot(missing).map(c => (c, "ok")) ++
        missing.toSeq.map(c => (c, "missing")) ++
        unexpected.toSeq.map(c => (c, "unexpected"))
    rows.toDF("column_name", "status").orderBy("column_name")
  }

  /** O4 as an oracle row: the Morton interleave itself. Two bounded
    * 10-bit keys per document, their z-value from Zorder.zvalue's
    * bitwise expression, rows in z-cluster order — the exact layout
    * order the compaction rewrite sorts files by, recomputed
    * arithmetically by the oracle (bit b of column i lands at
    * position b·k+i). Pruning behavior stays spec'd in ZorderSpec;
    * this row pins the bit math cross-engine. */
  def q233ZorderValues(s: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(1024L)).as("zx"),
        pmod(col("n_chars"), lit(1024L)).as("zy"))
    d.withColumn("zvalue",
        graft.operators.Zorder.zvalue(Seq(col("zx"), col("zy")), bits = 10))
      .orderBy("zvalue", "doc_id")
  }

  /** q254 — O4's LOCALITY UPGRADE as an oracle row: the Hilbert-curve
    * index over the same two bounded 10-bit keys q233 Morton-
    * interleaves. Unlike the Z-curve, consecutive Hilbert positions
    * are always grid-adjacent (HilbertSpec proves it exhaustively),
    * so a layout sorted by this value keeps 2-D range scans inside
    * contiguous file runs with no power-of-two jumps — the clustering
    * order modern lakehouses (Delta liquid clustering) moved to. The
    * index is the native codegen'd `graft_hilbert`
    * (plans/HilbertIndex); the oracle replays the per-level
    * rotate-and-fold with a recursive CTE, bit-identical integer
    * arithmetic. */
  def q254HilbertValues(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(1024L)).as("zx"),
        pmod(col("n_chars"), lit(1024L)).as("zy"))
      .withColumn("hvalue",
        call_function("graft_hilbert", col("zx"), col("zy"), lit(10)))
      .orderBy("hvalue", "doc_id")
  }

  /** S10/S13 as an oracle row: the query goes THROUGH the serving
    * layer — Serving.registerCatalog's view catalog + Serving.sql's
    * ANSI entry — not through DataFrame calls, certifying that a SQL
    * client sees the same rows the API computes (the reference's
    * dbt-model-over-Trino contract). The statement aggregates the
    * document_profile serving view (lang-ID agreement x token mass);
    * the oracle recomputes it from the raw documents table with the
    * proven q41/q56 SQL replicas of the kernels. */
  def q234ServingSql(s: SparkSession, dir: String): DataFrame = {
    graft.Serving.registerCatalog(s, dir, telecomEvents = 2000)
    graft.Serving.sql(s,
      """SELECT detected_lang, lang,
        |  COUNT(*) AS n_docs, SUM(token_count) AS total_tokens
        |FROM document_profile
        |GROUP BY detected_lang, lang
        |ORDER BY detected_lang, lang""".stripMargin)
  }

  /** q255 — O-layout family, the CO-LOCATED JOIN: orders and customer
    * written as bucketed tables hashed on the join key into the same
    * bucket count ([[graft.operators.Bucketing]]), then joined with
    * the strategy pinned to sort-merge — the plan reads both sides'
    * `HashPartitioning` straight off the bucketed scans and carries
    * ZERO shuffle exchanges (BucketingSpec asserts it on the physical
    * plan). At 100 TB this is the recurring-join amortization: the
    * fact-side exchange every nightly join would pay is paid once at
    * write time. The merge hint pins at test scale what the planner
    * picks unaided at fact×fact scale (a broadcast would hide the
    * co-location being certified). Money is summed in integer cents
    * (floor of the same IEEE double is identical cross-engine); the
    * bucketed copies hold byte-identical rows to the raw parquet, so
    * the oracle certifies the bucketed layout round-trip too. */
  def q255BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val o = graft.operators.Bucketing.ensureBucketed(s,
      graft.Tables.orders(s, dir), s"graft_b_orders_$tag", "o_custkey", 8)
    val c = graft.operators.Bucketing.ensureBucketed(s,
      graft.Tables.customer(s, dir), s"graft_b_customer_$tag", "c_custkey", 8)
    s.table(o).hint("merge")
      .join(s.table(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("revenue_cents"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** q261 — the STREAM-STREAM interval join's batch face as an
    * oracle row (J9's missing corner: FraudDetection covers the
    * stateful self-join, this is the two-stream enrichment).
    * [[graft.streaming.StreamEnrich.callsWithTowerLoad]] — watermarks
    * on BOTH sides plus the bounded probe_ts ∈ [call_ts−10min,
    * call_ts] range give Spark eviction horizons for both state
    * stores (StreamEnrichSpec pins stream ≡ batch) — executed in
    * batch over the telecom fixtures and rolled up per call: probes
    * seen, max and sum of tower load in the lead-up window. Decimal
    * load keeps the sum order-independent; the oracle replays the
    * silver dedups and the interval join in plain SQL. */
  def q261StreamJoinFace(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val calls = Silver.silverCalls(bronzeCalls(s, dir))
      .select(col("call_id").as("event_id"), col("tower_id"),
        col("call_start_ts").as("call_ts"))
    val probes = Silver.silverProbes(
        fixture(s, Generators.probeEvents(s, hours = 24).toDF(), "probes", 24))
      .select(col("tower_id"), col("probe_ts"), col("load_pct"))
    // binned equi-join batch face (round 13, guide §3.3): identical
    // rows to callsWithTowerLoad's interval join — StreamEnrichSpec
    // pins the parity, the oracle replays the raw interval join —
    // without the per-tower |calls|×|probes| pair generation
    graft.streaming.StreamEnrich.callsWithTowerLoadBinned(calls, probes,
        toleranceSecs = 600L)
      .groupBy(col("event_id"), col("tower_id"), col("call_ts"))
      .agg(
        count(lit(1)).as("probes_seen"),
        max(col("load_pct")).cast("double").as("max_load_pct"),
        sum(col("load_pct")).cast("double").as("sum_load_pct"))
      .select(col("event_id"), col("tower_id"),
        date_format(col("call_ts"), "yyyy-MM-dd HH:mm:ss").as("call_ts"),
        col("probes_seen"), col("max_load_pct"), col("sum_load_pct"))
      .orderBy("event_id")
  }

  /** q264 — small-file COMPACTION PLANNER (S6's decision layer as an
    * oracle row: Iceberg `rewrite_data_files(strategy => 'binpack')`,
    * the reference's bronze maintenance loop): a file inventory
    * (derived from the documents table at 50 docs/file — at 100 TB
    * this is the metastore listing, metadata-scale but potentially
    * millions of rows) is packed in file-id order into target-sized
    * rewrite bins by the two-phase distributed prefix sum — a file
    * lands wholly in the bin where its byte offset starts, no global
    * window at any size. Output: per-file bin assignment plus the
    * per-bin file/byte totals a rewrite job would be sized from.
    * Pure integer arithmetic (DIV), replayed exactly by the oracle's
    * window formulation. */
  def q264CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    val inv = graft.Tables.documents(s, dir)
      .groupBy(expr("doc_id DIV 50").as("file_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("file_bytes"))
    val cum = graft.operators.PrefixSum.withRunningSum(
      inv, "file_id", "file_bytes", "cum_bytes")
    val planned = cum.withColumn("bin",
      expr("(cum_bytes - file_bytes) DIV 16384"))
    val bins = planned.groupBy("bin")
      .agg(count(lit(1)).as("bin_files"),
        sum(col("file_bytes")).as("bin_bytes"))
    planned.join(bins, "bin")
      .select(col("file_id"), col("n_docs"), col("file_bytes"),
        col("bin"), col("bin_files"), col("bin_bytes"))
      .orderBy("file_id")
  }

  val queries: Map[String, Q] = Map(
    "q255_bucketed_join" -> q255BucketedJoin _,
    "q264_compaction_plan" -> q264CompactionPlan _,
    "q261_stream_join_face" -> q261StreamJoinFace _,
    "q231_seed_towers" -> q231SeedTowers _,
    "q232_schema_drift" -> q232SchemaDrift _,
    "q233_zorder_values" -> q233ZorderValues _,
    "q254_hilbert_values" -> q254HilbertValues _,
    "q234_serving_sql" -> q234ServingSql _,
    "q226_windowed_rollup" -> q226WindowedRollup _,
    "q227_landing_layout" -> q227LandingLayout _,
    "q169_erlang_blocking" -> q169ErlangBlocking _,
    "q170_peak_concurrency" -> q170PeakConcurrency _,
    "q60_tower_hourly" -> q60TowerHourly _,
    "q61_customer_monthly" -> q61CustomerMonthly _,
    "q62_fraud_alerts" -> q62FraudAlerts _,
    "q81_quarantine" -> q81Quarantine _,
    "q107_data_session_rollup" -> q107DataSessionRollup _,
    "q108_sms_delivery" -> q108SmsDelivery _,
  )

  // ---- DuckDB oracle SQL over the materialized bronze fixtures ----
  // Each SQL re-implements the full silver→gold path (reference
  // agg_tower_hourly_utilization.sql / agg_customer_monthly_summary
  // .sql / fraud_detection.py semantics) from the same parquet bytes
  // the Spark pipeline consumed. Validated hash-exact at sf0.01
  // (scripts/proto/q6{0,1,2}_sql.py). dsum/davg parity: decimal-sum
  // then cast double, mirroring graft.functions.Funcs.

  /** Shared silver_calls SQL: corrupt filter + keep-latest dedup +
    * conforming casts (mirrors Silver.silverCalls). */
  private def silverCallsSql(cols: String): String =
    s"""sc AS (
       |  SELECT $cols
       |  FROM (SELECT *, row_number() OVER (PARTITION BY event_id
       |          ORDER BY _bronze_ingested_at DESC, _kafka_offset DESC) AS _rn
       |        FROM bc
       |        WHERE event_id IS NOT NULL AND caller_msisdn IS NOT NULL
       |          AND tower_id IS NOT NULL AND duration_seconds >= 0)
       |  WHERE _rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q255_bucketed_join" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents,
        |  COUNT(DISTINCT c_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q264_compaction_plan" ->
      """WITH inv AS (
        |  SELECT doc_id // 50 AS file_id, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS file_bytes
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT *, SUM(file_bytes) OVER (ORDER BY file_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM inv),
        |b AS (
        |  SELECT file_id, n_docs, file_bytes,
        |    CAST((cum - file_bytes) // 16384 AS BIGINT) AS bin
        |  FROM c),
        |g AS (
        |  SELECT bin, COUNT(*) AS bin_files,
        |    CAST(SUM(file_bytes) AS BIGINT) AS bin_bytes
        |  FROM b GROUP BY 1)
        |SELECT file_id, n_docs, file_bytes, bin, bin_files, bin_bytes
        |FROM b JOIN g USING (bin)
        |ORDER BY file_id""".stripMargin,
    "q261_stream_join_face" ->
      s"""WITH bc AS (SELECT * FROM read_parquet('$FixtureDir/calls_n20000/*.parquet')),
         |bp AS (SELECT * FROM read_parquet('$FixtureDir/probes_n24/*.parquet')),
         |${silverCallsSql(
             """event_id AS call_id, tower_id,
               |    CAST(call_start_timestamp AS TIMESTAMP) AS call_start_ts""".stripMargin)},
         |sp AS (
         |  SELECT tower_id,
         |    CAST(event_timestamp AS TIMESTAMP) AS probe_ts,
         |    CAST(load_pct AS DECIMAL(6,2)) AS load_pct
         |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |          ORDER BY _bronze_ingested_at DESC) AS _rn
         |        FROM bp WHERE probe_id IS NOT NULL AND tower_id IS NOT NULL)
         |  WHERE _rn = 1),
         |j AS (
         |  SELECT sc.call_id AS event_id, sc.tower_id,
         |    sc.call_start_ts AS call_ts, sp.load_pct
         |  FROM sc JOIN sp ON sc.tower_id = sp.tower_id
         |    AND sp.probe_ts >= sc.call_start_ts - INTERVAL 10 MINUTE
         |    AND sp.probe_ts <= sc.call_start_ts)
         |SELECT event_id, tower_id,
         |  strftime(call_ts, '%Y-%m-%d %H:%M:%S') AS call_ts,
         |  CAST(COUNT(*) AS BIGINT) AS probes_seen,
         |  CAST(MAX(load_pct) AS DOUBLE) AS max_load_pct,
         |  CAST(SUM(CAST(load_pct AS DECIMAL(18,2))) AS DOUBLE) AS sum_load_pct
         |FROM j GROUP BY 1, 2, 3
         |ORDER BY event_id""".stripMargin,
    "q231_seed_towers" ->
      s"""SELECT tower_id, city, state, latitude, longitude, tower_type,
         |  capacity_erlangs, radio_technology, install_date,
         |  last_maintenance_date, is_active,
         |  CAST(last_maintenance_date - install_date AS INTEGER)
         |    AS maintained_after_days
         |FROM read_csv('$TowersSeedPath', header=true, columns={
         |  'tower_id':'VARCHAR','city':'VARCHAR','state':'VARCHAR',
         |  'latitude':'DOUBLE','longitude':'DOUBLE','tower_type':'VARCHAR',
         |  'capacity_erlangs':'BIGINT','radio_technology':'VARCHAR',
         |  'install_date':'DATE','last_maintenance_date':'DATE',
         |  'is_active':'BOOLEAN'})
         |WHERE is_active
         |ORDER BY tower_id""".stripMargin,
    "q232_schema_drift" ->
      """WITH actual AS (
        |  SELECT column_name FROM (DESCRIBE SELECT * FROM documents)),
        |expected AS (SELECT * FROM (VALUES
        |  ('doc_id'),('text'),('lang'),('source'),('quality')) e(column_name))
        |SELECT column_name,
        |  CASE WHEN a.column_name IS NULL THEN 'missing'
        |       WHEN e.column_name IS NULL THEN 'unexpected'
        |       ELSE 'ok' END AS status
        |FROM expected e FULL OUTER JOIN actual a USING (column_name)
        |ORDER BY column_name""".stripMargin,
    "q233_zorder_values" ->
      """WITH base AS (
        |  SELECT doc_id, doc_id % 1024 AS zx, n_chars % 1024 AS zy
        |  FROM documents),
        |z AS (
        |  SELECT doc_id, zx, zy,
        |    SUM(((zx >> b) & 1) * (CAST(1 AS BIGINT) << (2 * b)) +
        |        ((zy >> b) & 1) * (CAST(1 AS BIGINT) << (2 * b + 1))) AS zvalue
        |  FROM base, generate_series(0, 9) g(b)
        |  GROUP BY doc_id, zx, zy)
        |SELECT doc_id, zx, zy, CAST(zvalue AS BIGINT) AS zvalue
        |FROM z ORDER BY zvalue, doc_id""".stripMargin,
    // Per-level Hilbert rotate-and-fold replayed as a recursive CTE:
    // each recursion step consumes one bit plane (s halves), exactly
    // the loop in plans/HilbertIndex.nullSafeEval.
    "q254_hilbert_values" -> {
      val rx = "(CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END)"
      val ry = "(CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)"
      val fx = s"(CASE WHEN $ry = 0 AND $rx = 1 THEN s - 1 - x ELSE x END)"
      val fy = s"(CASE WHEN $ry = 0 AND $rx = 1 THEN s - 1 - y ELSE y END)"
      s"""WITH RECURSIVE hc AS (
         |  SELECT doc_id,
         |    CAST(doc_id % 1024 AS BIGINT) AS zx,
         |    CAST(n_chars % 1024 AS BIGINT) AS zy,
         |    CAST(doc_id % 1024 AS BIGINT) AS x,
         |    CAST(n_chars % 1024 AS BIGINT) AS y,
         |    CAST(512 AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id, zx, zy,
         |    CASE WHEN $ry = 0 THEN $fy ELSE $fx END AS x,
         |    CASE WHEN $ry = 0 THEN $fx ELSE $fy END AS y,
         |    s // 2 AS s,
         |    d + s * s * xor(3 * $rx, $ry) AS d
         |  FROM hc WHERE s >= 1)
         |SELECT doc_id, zx, zy, CAST(d AS BIGINT) AS hvalue
         |FROM hc WHERE s = 0
         |ORDER BY hvalue, doc_id""".stripMargin
    },
    "q234_serving_sql" -> {
      import TextOps.{reCount, tokensSql}
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    CAST(len($tokensSql) AS BIGINT) AS token_count,
         |    CAST(${reCount("lower(text)", "\\b(der|die|das|und|ist)\\b")} AS INTEGER) AS score_de,
         |    CAST(${reCount("lower(text)", "\\b(the|and|is|of|to)\\b")} AS INTEGER) AS score_en,
         |    CAST(${reCount("lower(text)", "\\b(el|la|los|y|es)\\b")} AS INTEGER) AS score_es,
         |    CAST(${reCount("lower(text)", "\\b(le|la|les|et|est)\\b")} AS INTEGER) AS score_fr,
         |    CAST(${reCount("lower(text)", "\\b(de|shi|le|he|zai)\\b")} AS INTEGER) AS score_zh
         |  FROM documents),
         |profiled AS (
         |  SELECT doc_id, lang, token_count,
         |    CASE WHEN score_de >= score_en AND score_de >= score_es
         |           AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
         |         WHEN score_en >= score_es AND score_en >= score_fr
         |           AND score_en >= score_zh THEN 'en'
         |         WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
         |         WHEN score_fr >= score_zh THEN 'fr'
         |         ELSE 'zh' END AS detected_lang
         |  FROM scored)
         |SELECT detected_lang, lang,
         |  COUNT(*) AS n_docs, CAST(SUM(token_count) AS BIGINT) AS total_tokens
         |FROM profiled
         |GROUP BY detected_lang, lang
         |ORDER BY detected_lang, lang""".stripMargin
    },
    "q226_windowed_rollup" ->
      s"""WITH p AS (
         |  SELECT ts, 'T' || CAST(user_id % 16 AS VARCHAR) AS tower_id,
         |    CAST(round(value) AS BIGINT) AS load_pct
         |  FROM events),
         |w AS (
         |  SELECT date_trunc('hour', ts) AS ws, tower_id,
         |    CAST(CAST(SUM(load_pct) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_load_pct,
         |    MAX(load_pct) AS max_load_pct,
         |    CAST(SUM(CASE WHEN load_pct >= 90 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS critical_count,
         |    COUNT(*) AS probe_count
         |  FROM p GROUP BY 1, 2)
         |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
         |  strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
         |  tower_id, avg_load_pct, max_load_pct, critical_count, probe_count
         |FROM w ORDER BY window_start, tower_id""".stripMargin,
    "q227_landing_layout" ->
      s"""SELECT CAST(year(ts) AS INTEGER) AS year,
         |  CAST(month(ts) AS INTEGER) AS month,
         |  CAST(day(ts) AS INTEGER) AS day,
         |  COUNT(*) AS row_count,
         |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
         |  CAST(MIN(event_id) AS BIGINT) AS min_id,
         |  CAST(MAX(event_id) AS BIGINT) AS max_id
         |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q169_erlang_blocking" ->
      s"""WITH bc AS (SELECT * FROM read_parquet('$FixtureDir/calls_n20000/*.parquet')),
         |${silverCallsSql(
             """tower_id,
               |    CAST(call_start_timestamp AS TIMESTAMP) AS call_start_ts,
               |    duration_seconds""".stripMargin)},
         |h AS (
         |  SELECT tower_id, date_trunc('hour', call_start_ts) AS hour,
         |    CAST(SUM(duration_seconds) AS BIGINT) AS secs
         |  FROM sc GROUP BY 1, 2),
         |b AS (
         |  SELECT tower_id,
         |    MAX(CAST(secs AS DOUBLE) / 3600.0) AS busy_hour_erlangs,
         |    CAST(SUM(secs) AS BIGINT) AS total_secs
         |  FROM h GROUP BY 1),
         |f AS (
         |  SELECT *, list_reduce(
         |    list_prepend(CAST(1.0 AS DOUBLE),
         |      list_transform(range(1, 9), k -> CAST(k AS DOUBLE))),
         |    (acc, k) -> busy_hour_erlangs * acc
         |      / (k + busy_hour_erlangs * acc)) AS bp
         |  FROM b)
         |SELECT tower_id, busy_hour_erlangs, total_secs,
         |  CAST(8 AS INTEGER) AS channels,
         |  CAST(bp AS DOUBLE) AS blocking_prob,
         |  bp <= 0.02 AS meets_2pct_gate
         |FROM f ORDER BY tower_id""".stripMargin,
    "q170_peak_concurrency" ->
      s"""WITH bc AS (SELECT * FROM read_parquet('$FixtureDir/calls_n20000/*.parquet')),
         |${silverCallsSql(
             """tower_id,
               |    CAST(call_start_timestamp AS TIMESTAMP) AS call_start_ts,
               |    duration_seconds""".stripMargin)},
         |iv AS (
         |  SELECT tower_id, epoch_us(call_start_ts) AS s_us,
         |    epoch_us(call_start_ts) + duration_seconds * 1000000 AS e_us
         |  FROM sc),
         |deltas AS (
         |  SELECT tower_id, ts_us, CAST(SUM(d) AS BIGINT) AS net FROM (
         |    SELECT tower_id, s_us AS ts_us, 1 AS d FROM iv
         |    UNION ALL SELECT tower_id, e_us, -1 FROM iv)
         |  GROUP BY 1, 2),
         |run AS (
         |  SELECT tower_id, ts_us,
         |    SUM(net) OVER (PARTITION BY tower_id ORDER BY ts_us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
         |  FROM deltas),
         |pk AS (
         |  SELECT tower_id, ts_us, conc,
         |    MAX(conc) OVER (PARTITION BY tower_id) AS pk
         |  FROM run),
         |peaks AS (
         |  SELECT tower_id, CAST(MAX(pk) AS BIGINT) AS peak_concurrent,
         |    MIN(ts_us) AS peak_us
         |  FROM pk WHERE conc = pk GROUP BY 1),
         |cn AS (SELECT tower_id, COUNT(*) AS n_calls FROM iv GROUP BY 1)
         |SELECT cn.tower_id, n_calls, peak_concurrent,
         |  strftime(make_timestamp(peak_us), '%Y-%m-%d %H:%M:%S') AS peak_at
         |FROM cn JOIN peaks ON peaks.tower_id = cn.tower_id
         |ORDER BY cn.tower_id""".stripMargin,
    "q81_quarantine" ->
      s"""WITH bc AS (SELECT * FROM read_parquet('$FixtureDir/calls_n20000/*.parquet'))
         |SELECT event_id, caller_msisdn, tower_id, duration_seconds, _kafka_offset,
         |  concat_ws(',',
         |    CASE WHEN event_id IS NULL THEN 'null_event_id' END,
         |    CASE WHEN caller_msisdn IS NULL THEN 'null_caller_msisdn' END,
         |    CASE WHEN tower_id IS NULL THEN 'null_tower_id' END,
         |    CASE WHEN duration_seconds IS NULL OR duration_seconds < 0
         |         THEN 'bad_duration' END) AS reasons
         |FROM bc
         |WHERE event_id IS NULL OR caller_msisdn IS NULL OR tower_id IS NULL
         |   OR duration_seconds IS NULL OR duration_seconds < 0
         |ORDER BY _kafka_offset""".stripMargin,
    "q108_sms_delivery" ->
      s"""WITH b AS (SELECT * FROM read_parquet('$FixtureDir/sms_n20000/*.parquet'))
         |SELECT tower_id, sms_type,
         |  COUNT(*) AS sms_count,
         |  CAST(SUM(CASE WHEN delivery_status = 'DELIVERED' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS delivered,
         |  CAST(SUM(CASE WHEN delivery_status = 'FAILED' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS failed,
         |  CAST(SUM(CASE WHEN delivery_status = 'PENDING' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS pending,
         |  CAST(SUM(message_size_bytes) AS BIGINT) AS total_bytes,
         |  CAST(CAST(SUM(CASE WHEN delivery_status = 'DELIVERED' THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS DOUBLE) AS delivery_rate
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q107_data_session_rollup" ->
      s"""WITH b AS (SELECT * FROM read_parquet('$FixtureDir/data_sessions_n20000/*.parquet'))
         |SELECT tower_id,
         |  strftime(date_trunc('hour', CAST(session_start_timestamp AS TIMESTAMP)),
         |    '%Y-%m-%d %H:%M:%S') AS hour,
         |  COUNT(*) AS session_count,
         |  CAST(SUM(total_bytes) AS BIGINT) AS total_bytes,
         |  CAST(SUM(CASE WHEN radio_technology LIKE '5G%' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS sessions_5g,
         |  CAST(CAST(SUM(CAST(latency_ms AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(latency_ms) AS DOUBLE) AS avg_latency_ms,
         |  CAST(SUM(CAST(revenue_usd AS DECIMAL(18,6))) AS DOUBLE) AS revenue_usd
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q60_tower_hourly" ->
      s"""WITH bc AS (SELECT * FROM read_parquet('$FixtureDir/calls_n20000/*.parquet')),
         |bp AS (SELECT * FROM read_parquet('$FixtureDir/probes_n24/*.parquet')),
         |${silverCallsSql(
             """event_id AS call_id, tower_id,
               |    CAST(call_start_timestamp AS TIMESTAMP) AS call_start_ts,
               |    round(duration_seconds / 60.0, 2) AS duration_minutes,
               |    call_result_code = 'COMPLETED' AS is_successful,
               |    CAST(revenue_usd AS DECIMAL(12,4)) AS revenue_usd""".stripMargin)},
         |sp AS (
         |  SELECT probe_id, tower_id, region,
         |    date_trunc('hour', CAST(event_timestamp AS TIMESTAMP)) AS probe_hour,
         |    CAST(load_pct AS DECIMAL(6,2)) AS load_pct,
         |    CAST(avg_latency_ms AS DECIMAL(8,1)) AS avg_latency_ms,
         |    CAST(packet_loss_pct AS DECIMAL(6,3)) AS packet_loss_pct,
         |    CAST(connected_users AS INTEGER) AS connected_users,
         |    CAST(load_pct AS DECIMAL(6,2)) >= 90 AS alert_threshold_breached,
         |    CASE WHEN CAST(load_pct AS DECIMAL(6,2)) >= 90 THEN 'CRITICAL'
         |         WHEN CAST(load_pct AS DECIMAL(6,2)) >= 75 THEN 'DEGRADED'
         |         ELSE 'HEALTHY' END AS load_status
         |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |          ORDER BY _bronze_ingested_at DESC) AS _rn
         |        FROM bp WHERE probe_id IS NOT NULL AND tower_id IS NOT NULL)
         |  WHERE _rn = 1),
         |pa AS (
         |  SELECT tower_id, probe_hour AS hour, region,
         |    CAST(CAST(SUM(CAST(load_pct AS DECIMAL(18,2))) AS DOUBLE)
         |      / COUNT(load_pct) AS DOUBLE) AS avg_load_pct,
         |    CAST(MAX(load_pct) AS DOUBLE) AS max_load_pct,
         |    CAST(CAST(SUM(CAST(avg_latency_ms AS DECIMAL(18,1))) AS DOUBLE)
         |      / COUNT(avg_latency_ms) AS DOUBLE) AS avg_latency_ms,
         |    CAST(CAST(SUM(CAST(packet_loss_pct AS DECIMAL(18,3))) AS DOUBLE)
         |      / COUNT(packet_loss_pct) AS DOUBLE) AS avg_packet_loss_pct,
         |    CAST(CAST(SUM(CAST(connected_users AS DECIMAL(18,0))) AS DOUBLE)
         |      / COUNT(connected_users) AS DOUBLE) AS avg_connected_users,
         |    CAST(SUM(CASE WHEN alert_threshold_breached THEN 1 ELSE 0 END) AS BIGINT) AS alert_count,
         |    MAX(CASE WHEN load_status = 'CRITICAL' THEN 3
         |             WHEN load_status = 'DEGRADED' THEN 2 ELSE 1 END) AS worst_status_rank,
         |    CAST(COUNT(*) AS BIGINT) AS probe_count
         |  FROM sp GROUP BY 1, 2, 3),
         |ca AS (
         |  SELECT tower_id, date_trunc('hour', call_start_ts) AS hour,
         |    CAST(COUNT(*) AS BIGINT) AS call_count,
         |    CAST(SUM(CASE WHEN is_successful THEN 1 ELSE 0 END) AS BIGINT) AS successful_calls,
         |    CAST(SUM(CAST(duration_minutes AS DECIMAL(18,2))) AS DOUBLE) AS total_call_minutes,
         |    CAST(SUM(CAST(revenue_usd AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue_usd
         |  FROM sc GROUP BY 1, 2)
         |SELECT pa.tower_id AS tower_id, strftime(pa.hour, '%Y-%m-%d %H:%M:%S') AS hour,
         |  pa.region, pa.avg_load_pct, pa.max_load_pct, pa.avg_latency_ms,
         |  pa.avg_packet_loss_pct, pa.avg_connected_users, pa.alert_count,
         |  CASE WHEN worst_status_rank = 3 THEN 'CRITICAL'
         |       WHEN worst_status_rank = 2 THEN 'DEGRADED' ELSE 'HEALTHY' END AS worst_status,
         |  pa.probe_count,
         |  COALESCE(ca.call_count, 0) AS call_count,
         |  COALESCE(ca.successful_calls, 0) AS successful_calls,
         |  COALESCE(ca.total_call_minutes, 0.0) AS total_call_minutes,
         |  COALESCE(ca.total_revenue_usd, 0.0) AS total_revenue_usd,
         |  CASE WHEN COALESCE(ca.call_count, 0) > 0
         |    THEN round(CAST(ca.successful_calls AS DOUBLE) / ca.call_count * 100.0, 2)
         |    ELSE NULL END AS success_rate_pct
         |FROM pa LEFT JOIN ca ON pa.tower_id = ca.tower_id AND pa.hour = ca.hour
         |ORDER BY tower_id, hour""".stripMargin,
    "q61_customer_monthly" ->
      s"""WITH bc AS (SELECT * FROM read_parquet('$FixtureDir/calls_n20000/*.parquet')),
         |bcu AS (SELECT * FROM read_parquet('$FixtureDir/customers_n200/*.parquet')),
         |${silverCallsSql(
             """event_id AS call_id, caller_customer_id AS customer_id, tower_id,
               |    CAST(CAST(call_start_timestamp AS TIMESTAMP) AS DATE) AS call_date,
               |    round(duration_seconds / 60.0, 2) AS duration_minutes,
               |    call_result_code = 'COMPLETED' AS is_successful,
               |    roaming,
               |    CAST(revenue_usd AS DECIMAL(12,4)) AS revenue_usd""".stripMargin)},
         |scu AS (
         |  SELECT customer_id,
         |    CAST(plan_monthly_fee AS DECIMAL(10,2)) AS plan_monthly_fee,
         |    CAST(activation_date AS DATE) AS activation_date
         |  FROM (SELECT *, row_number() OVER (PARTITION BY customer_id
         |          ORDER BY CAST(updated_at AS TIMESTAMP) DESC) AS _rn
         |        FROM bcu WHERE customer_id IS NOT NULL)
         |  WHERE _rn = 1),
         |dimc AS (
         |  SELECT md5(customer_id) AS customer_key, customer_id,
         |    CASE WHEN plan_monthly_fee >= 60 THEN 'HIGH_VALUE'
         |         WHEN plan_monthly_fee >= 25 THEN 'MID_VALUE'
         |         ELSE 'LOW_VALUE' END AS value_segment,
         |    CASE WHEN (2024 - year(activation_date))*12 + (1 - month(activation_date))
         |            + CASE WHEN day(activation_date) = 1 THEN 0
         |                   ELSE (1 - day(activation_date))/31.0 END >= 36 THEN 'VETERAN'
         |         WHEN (2024 - year(activation_date))*12 + (1 - month(activation_date))
         |            + CASE WHEN day(activation_date) = 1 THEN 0
         |                   ELSE (1 - day(activation_date))/31.0 END >= 12 THEN 'ESTABLISHED'
         |         ELSE 'NEW' END AS tenure_segment
         |  FROM scu),
         |fact AS (
         |  SELECT COALESCE(d.customer_key, 'UNKNOWN') AS customer_key,
         |    sc.call_date, sc.duration_minutes, sc.revenue_usd,
         |    CASE WHEN sc.is_successful THEN 1 ELSE 0 END AS successful_call_count,
         |    CASE WHEN sc.roaming THEN 1 ELSE 0 END AS roaming_call_count
         |  FROM sc LEFT JOIN dimc d ON sc.customer_id = d.customer_id),
         |monthly AS (
         |  SELECT customer_key, strftime(call_date, '%Y-%m') AS year_month,
         |    CAST(COUNT(*) AS BIGINT) AS call_count,
         |    CAST(SUM(CAST(duration_minutes AS DECIMAL(18,2))) AS DOUBLE) AS total_minutes,
         |    CAST(SUM(CAST(revenue_usd AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue_usd,
         |    CAST(SUM(CASE WHEN successful_call_count = 1 THEN 1 ELSE 0 END) AS BIGINT) AS successful_calls,
         |    CAST(SUM(CASE WHEN roaming_call_count = 1 THEN 1 ELSE 0 END) AS BIGINT) AS roaming_calls
         |  FROM fact GROUP BY 1, 2)
         |SELECT d.customer_key, d.customer_id, d.value_segment, d.tenure_segment,
         |  m.year_month, m.call_count, m.total_minutes, m.total_revenue_usd,
         |  m.successful_calls, m.roaming_calls,
         |  CASE WHEN m.total_minutes >= 300 THEN 'HEAVY'
         |       WHEN m.total_minutes >= 60 THEN 'REGULAR'
         |       ELSE 'LIGHT' END AS usage_segment
         |FROM dimc d LEFT JOIN monthly m ON d.customer_key = m.customer_key
         |WHERE m.year_month IS NOT NULL
         |ORDER BY d.customer_id, m.year_month""".stripMargin,
    "q62_fraud_alerts" ->
      s"""WITH bc AS (SELECT * FROM read_parquet('$FixtureDir/calls_n20000/*.parquet')),
         |calls AS (
         |  SELECT caller_customer_id AS customer_id, event_id,
         |    CAST(call_start_timestamp AS TIMESTAMP) AS ts,
         |    cell_lat AS lat, cell_lon AS lon, tower_id
         |  FROM bc),
         |enr AS (
         |  SELECT *,
         |    lag(ts) OVER w AS prev_ts,
         |    lag(lat) OVER w AS prev_lat,
         |    lag(lon) OVER w AS prev_lon,
         |    COUNT(*) OVER (PARTITION BY customer_id ORDER BY CAST(epoch(ts) AS BIGINT)
         |        RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
         |      - (COUNT(*) OVER (PARTITION BY customer_id, CAST(epoch(ts) AS BIGINT))
         |         - row_number() OVER (PARTITION BY customer_id, CAST(epoch(ts) AS BIGINT)
         |             ORDER BY ts, event_id)) AS calls_30min
         |  FROM calls
         |  WINDOW w AS (PARTITION BY customer_id ORDER BY ts, event_id)),
         |sp AS (
         |  SELECT *,
         |    CAST(epoch(ts) AS BIGINT) - CAST(epoch(prev_ts) AS BIGINT) AS dt_sec,
         |    (12742.0 * asin(sqrt(
         |      pow(sin(radians(lat - prev_lat) / 2), 2)
         |      + cos(radians(prev_lat)) * cos(radians(lat))
         |        * pow(sin(radians(lon - prev_lon) / 2), 2)))) AS dist_km
         |  FROM enr),
         |sp2 AS (
         |  SELECT *, CASE WHEN dt_sec > 0 THEN dist_km / (dt_sec / 3600.0) END AS speed_kmh
         |  FROM sp)
         |SELECT * FROM (
         |  SELECT 'travel_' || event_id AS alert_id,
         |    'IMPOSSIBLE_TRAVEL' AS alert_type,
         |    CASE WHEN speed_kmh > 2000.0 THEN 'HIGH' ELSE 'MEDIUM' END AS severity,
         |    customer_id, event_id,
         |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
         |    round(dist_km, 2) AS distance_km,
         |    round(speed_kmh, 2) AS implied_speed_kmh,
         |    CAST(0 AS INTEGER) AS window_call_count
         |  FROM sp2
         |  WHERE dt_sec > 0 AND dist_km >= 500.0 AND speed_kmh >= 600.0
         |  UNION ALL
         |  SELECT 'velocity_' || event_id, 'VELOCITY',
         |    CASE WHEN calls_30min > 50 THEN 'HIGH' ELSE 'MEDIUM' END,
         |    customer_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S'),
         |    0.0, 0.0, CAST(calls_30min AS INTEGER)
         |  FROM sp2 WHERE calls_30min > 25)
         |ORDER BY alert_id""".stripMargin,
  )
}
