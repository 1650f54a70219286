package graft.queries

import graft.Tables
import graft.functions.Funcs._
import graft.operators.AsofJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal operators: date spine (F16), as-of join (J7), calendar
  * functions (F10-F14), monthly rollups (A5), trailing averages (A6).
  */
object Temporal {

  type Q = (SparkSession, String) => DataFrame

  /** F16: date-spine generator (reference dim_date.sql:11-17,
    * dbt_utils.date_spine) — `sequence` + `explode`, the one
    * generator-shaped op. Derives the dim_date attribute set
    * (reference dim_date.sql:20-66). Generated on executors, no data
    * read at all.
    */
  def q12DateSpine(s: SparkSession, dir: String): DataFrame = {
    val spine = s.sql(
      """SELECT explode(sequence(to_date('2024-01-01'), to_date('2024-12-31'),
        |        interval 1 day)) AS date_day""".stripMargin)
    spine.select(
      col("date_day"),
      date_format(col("date_day"), "yyyyMMdd").cast("int").as("date_key"),
      year(col("date_day")).as("year"),
      quarter(col("date_day")).as("quarter"),
      month(col("date_day")).as("month"),
      dayofmonth(col("date_day")).as("day_of_month"),
      dayofweek(col("date_day")).as("day_of_week"),
      dayofyear(col("date_day")).as("day_of_year"),
      date_format(col("date_day"), "EEEE").as("day_name"),
      date_format(col("date_day"), "MMMM").as("month_name"),
      concat(lit("Q"), quarter(col("date_day"))).as("quarter_label"),
      dayofweek(col("date_day")).isin(1, 7).as("is_weekend"))
      .orderBy("date_day")
  }

  /** J7: as-of join — each event picks up the user's most recent
    * signup at-or-before it (see [[graft.operators.AsofJoin]] for the
    * single-shuffle design). Oracle uses DuckDB's native ASOF JOIN.
    */
  def q13AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val left = ev.select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val right = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_event_id"),
        col("value").as("signup_value"))
    AsofJoin.asofJoin(left, right, key = "user_id", ts = "ts",
        valueCols = Seq("signup_event_id", "signup_value"))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        col("asof_signup_event_id"), col("asof_signup_value"))
      .orderBy("event_id")
  }

  /** F10-F14: calendar-part kitchen sink over distinct order dates
    * (reference dim_date.sql:20-49 derivations applied to data).
    */
  def q16DatetimeParts(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderdate").cast("date").as("order_date")).distinct()
      .select(
        col("order_date"),
        date_trunc("month", col("order_date")).cast("date").as("month_start"),
        year(col("order_date")).as("year"),
        quarter(col("order_date")).as("quarter"),
        month(col("order_date")).as("month"),
        dayofmonth(col("order_date")).as("day_of_month"),
        dayofweek(col("order_date")).as("day_of_week"),
        dayofyear(col("order_date")).as("day_of_year"),
        weekofyear(col("order_date")).as("week_of_year"),
        date_format(col("order_date"), "yyyy-MM").as("year_month"))
      .orderBy("order_date")

  /** A5: monthly per-customer rollup (reference
    * agg_customer_monthly_summary.sql:18-34). Shuffles once on the
    * composite grouping key with map-side partial aggregation.
    */
  def q19MonthlyRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        col("o_custkey").as("customer_id"),
        date_format(col("o_orderdate"), "yyyy-MM").as("year_month"),
        year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("total_revenue"),
        countIf(col("o_orderstatus") === "F").as("fulfilled_count"))
      .orderBy("customer_id", "year_month")

  /** A6: daily profile + trailing-7-day average baseline (reference
    * tests/assert_row_count_anomaly.sql:4-16) as a rows-frame window.
    */
  def q25TrailingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("event_date").rowsBetween(-7, -1)
    Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("event_date"))
      .agg(count(lit(1)).as("daily_rows"))
      .withColumn("trailing_7d_avg", avg("daily_rows").over(w))
      .withColumn("pct_of_baseline",
        (col("daily_rows") / col("trailing_7d_avg")).cast("double"))
      .orderBy("event_date")
  }

  /** F11-F13: the Trino/MySQL dialect shims applied to data —
    * unit-first DATE_ADD/DATE_DIFF and %-style DATE_FORMAT
    * (reference silver_calls.sql:34, silver_customers.sql:61-64,
    * dim_date.sql:22-37). */
  def q32DialectShims(s: SparkSession, dir: String): DataFrame = {
    val ref = lit("2024-06-15").cast("date")
    Tables.orders(s, dir)
      .select(col("o_orderkey").as("order_id"),
        col("o_orderdate").cast("date").as("order_date"))
      .select(
        col("order_id"), col("order_date"),
        dateAddUnit("day", -3, col("order_date")).cast("date").as("minus_3_days"),
        dateAddUnit("month", 2, col("order_date")).cast("date").as("plus_2_months"),
        dateDiffUnit("day", col("order_date"), ref).as("days_to_ref"),
        dateDiffUnit("week", col("order_date"), ref).as("weeks_to_ref"),
        dateDiffUnit("year", col("order_date"), ref).as("years_to_ref"),
        dateFormatMysql(col("order_date"), "%Y%m%d").as("fmt_ymd"),
        dateFormatMysql(col("order_date"), "%Y-%m").as("fmt_ym"),
        dateFormatMysql(col("order_date"), "%b").as("fmt_mon"))
      .orderBy("order_id")
  }

  /** J7 (general form): date-range (BETWEEN) join of events onto a
    * generated month dimension, then rollup. The month side is tiny →
    * Spark plans a broadcast nested-loop for the theta join; the
    * events side streams through without a shuffle until the final
    * small aggregation — the right shape when the range side is a
    * bounded dimension. (The keyed as-of variant is q13.) */
  def q33RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val months = s.sql(
      """SELECT explode(sequence(to_date('2024-01-01'), to_date('2024-12-01'),
        |        interval 1 month)) AS month_start""".stripMargin)
      .withColumn("month_end", last_day(col("month_start")))
    val ev = Tables.events(s, dir)
      .withColumn("event_date", col("ts").cast("date"))
    ev.join(broadcast(months),
        col("event_date").between(col("month_start"), col("month_end")))
      .groupBy(col("month_start"))
      .agg(
        count(lit(1)).as("event_count"),
        countDistinct(col("user_id")).as("active_users"),
        dsum(col("value")).as("total_value"))
      .orderBy("month_start")
  }

  /** Conversion funnel: per user, first signup → first purchase at or
    * after it → 7-day conversion flag. Two keyed shuffles (the
    * per-user first-stage aggregate, then the stage-2 candidate join
    * on user_id — per-user event counts bound the join's in-key term,
    * the same argument as q91's order-key blocking). The classic
    * ordered-sequence analytics shape: every later stage only ever
    * joins against the (smaller) earlier stage's firsts. */
  def q116Funnel(s: SparkSession, dir: String): DataFrame = {
    val week_us = 7L * 86400L * 1000000L
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val signups = ev
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts_us"))).as("first_signup_us"))
      .filter(col("first_signup_us").isNotNull)
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .join(signups, "user_id")
      .filter(col("ts_us") >= col("first_signup_us"))
      .groupBy("user_id")
      .agg(min(col("ts_us")).as("first_purchase_us"))
    signups.join(firstPurchase, Seq("user_id"), "left")
      .select(col("user_id"), col("first_signup_us"), col("first_purchase_us"),
        (col("first_purchase_us").isNotNull &&
          col("first_purchase_us") <= col("first_signup_us") + week_us)
          .as("converted_7d"))
      .orderBy("user_id")
  }

  /** First-order Markov transition matrix over per-user event
    * timelines: LAG on the user-keyed window pairs each event with
    * its predecessor, then (prev, next) counts and per-prev rates.
    * The window partitions by user — no global sort — and both
    * post-window aggregates are bounded by the squared event-type
    * alphabet, so the expensive shuffle is the one keyed window at
    * any corpus size. Ties in ts are broken by event_id so the LAG
    * sequence (hence the counts) is deterministic. */
  def q121MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val trans = ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("transitions"))
    // the rate window runs over the |types|^2-row aggregate, not the
    // corpus — partition skew is bounded by the alphabet, not n
    val wp = Window.partitionBy("prev_type")
    trans
      .withColumn("prev_total", sum(col("transitions")).over(wp))
      .withColumn("transition_rate",
        (col("transitions").cast("double") / col("prev_total")).cast("double"))
      .orderBy("prev_type", "next_type")
  }

  /** Time-series gap-fill + forward-fill (LOCF): densify each user's
    * daily value series onto the calendar spine, then carry the last
    * observation forward over the gaps. The dense grid is GENERATED
    * (explode of a bounded date sequence per user — no join, no
    * cartesian plan), the series join is one keyed shuffle on
    * (user, day), and the fill window partitions by user — at any
    * corpus size the only per-row costs are one generator, one
    * keyed join, and one keyed window. Days before a user's first
    * observation stay NULL (nothing to carry). */
  def q130GapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(dsum(col("value")).as("daily_value"))
    val dense = daily.select("user_id").distinct()
      .withColumn("day",
        explode(expr(
          "sequence(to_date('2024-01-01'), to_date('2024-01-30'), interval 1 day)")))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_value",
        last(col("daily_value"), ignoreNulls = true).over(w))
      .withColumn("is_observed", col("daily_value").isNotNull)
      .orderBy("user_id", "day")
  }

  /** Time-weighted average (TWA) per user — the right mean for
    * irregularly-sampled series (a value held for 3 hours must weigh
    * 3× one held for 1 hour): each event's value is held until the
    * next event (step interpolation), TWA = Σ value·duration / Σ
    * duration. One keyed LEAD window builds the step segments; the
    * weighted sums are kept INTEGRAL (cents × microseconds — bounded
    * by ~5·10¹⁶ per user-month, well inside BIGINT) so the aggregate
    * is exact and order-independent; the single final division is the
    * only double op. The last event of each user has no successor and
    * carries zero duration (standard TWA-until-last-observation). */
  def q136TimeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val seg = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v_cents"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .withColumn("dur_us", coalesce(col("next_us") - col("ts_us"), lit(0L)))
    seg.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("dur_us")).as("span_us"),
        sum(col("v_cents") * col("dur_us")).as("weighted_sum"))
      .withColumn("twa_cents",
        when(col("span_us") > 0,
          (col("weighted_sum").cast("double") / col("span_us").cast("double"))
            .cast("double")))
      .orderBy("user_id")
  }

  /** Merged-interval coverage per user (union length of overlapping
    * activity windows) — the islands-and-gaps shape behind "total
    * active time": each event opens a 10-minute window; overlapping
    * windows merge into islands (a new island starts where start >
    * running max of prior ends — one keyed LAG/cummax window), and
    * the answer is Σ island spans. Two keyed windows + one keyed
    * aggregate; nothing global. The within-island span is
    * last-end − first-start computed per island key, exact in µs. */
  def q143IntervalUnion(s: SparkSession, dir: String): DataFrame = {
    val winUs = 600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("s_us"), col("event_id"))
    val iv = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s_us"))
      .withColumn("e_us", col("s_us") + winUs)
      // running max of PRIOR ends: an interval starts a new island
      // iff its start exceeds everything seen before it
      .withColumn("prev_max_end",
        max(col("e_us")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        (col("prev_max_end").isNull ||
          col("s_us") > col("prev_max_end")).cast("int"))
      .withColumn("island",
        sum(col("new_island")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    iv.groupBy("user_id", "island")
      .agg(min(col("s_us")).as("island_start"),
        max(col("e_us")).as("island_end"),
        count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("n_events")).as("n_events"),
        sum(col("island_end") - col("island_start")).as("covered_us"))
      .orderBy("user_id")
  }

  /** U-shaped (position-based) multi-touch attribution: each purchase
    * closes a "journey" of the touch events since the user's previous
    * purchase, and the conversion's 10,000 basis points of credit
    * split 40% to the first touch, 40% to the last, 20% across the
    * middles — the marketing-analytics op downstream of q116's funnel.
    * Credit stays INTEGER: the middle pot divides by `n−2` with the
    * remainder going one bp each to the earliest middles (q124's
    * largest-remainder determinism, applied positionally), so per-
    * journey credit sums to exactly 10,000 and engines cannot drift.
    * Journeys with no touches (back-to-back purchases) credit nobody.
    *
    * Scale shape: both windows are keyed by user (journey index is a
    * preceding-rows purchase count; position/size by (user, journey))
    * — no global sort anywhere, and the final rollup is bounded by
    * the channel alphabet. */
  def q150Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val wPrev = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tagged = ev.withColumn("journey",
      coalesce(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .over(wPrev), lit(0L)))
    val closed = tagged.filter(col("event_type") === "purchase")
      .select("user_id", "journey").distinct()
    val touches = tagged.filter(col("event_type") =!= "purchase")
      .join(closed, Seq("user_id", "journey"))
    val wj = Window.partitionBy("user_id", "journey")
      .orderBy(col("ts_us"), col("event_id"))
    val credited = touches
      .withColumn("pos", row_number().over(wj))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id", "journey")))
      .withColumn("credit_bps",
        when(col("n") === 1, lit(10000L))
          .when(col("n") === 2, lit(5000L))
          .when(col("pos") === 1 || col("pos") === col("n"), lit(4000L))
          .otherwise(expr(
            "2000 DIV (n - 2) + CASE WHEN pos - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END")
            .cast("long")))
    credited.groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("touches"),
        countDistinct(col("user_id"), col("journey")).as("journeys_touched"),
        sum(col("credit_bps")).as("credit_bps"))
      .orderBy("channel")
  }

  /** Three-step strict-order funnel with PER-STEP deadlines (q116's
    * two-step funnel generalized): first signup → first click within
    * 7 days OF THE SIGNUP → first purchase within 7 days OF THAT
    * CLICK. Each step is a conditional-min aggregation keyed by user
    * joined forward — the min-chaining idiom — so the whole funnel is
    * |steps| keyed aggs and joins, never a per-event window, and
    * adding a step adds one agg+join, not a pass over raw events. */
  def q155FunnelSteps(s: SparkSession, dir: String): DataFrame = {
    val week = 7L * 86400L * 1000000L
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val s1 = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts_us"))).as("signup_us"))
      .filter(col("signup_us").isNotNull)
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts_us") >= col("signup_us") &&
        col("ts_us") <= col("signup_us") + week)
      .groupBy("user_id").agg(min(col("ts_us")).as("click_us"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts_us") >= col("click_us") &&
        col("ts_us") <= col("click_us") + week)
      .groupBy("user_id").agg(min(col("ts_us")).as("purchase_us"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_us"), col("click_us"),
        col("purchase_us"),
        (when(col("purchase_us").isNotNull, 3)
          .when(col("click_us").isNotNull, 2)
          .otherwise(1)).as("reached_step"))
      .orderBy("user_id")
  }

  /** Behavioral sequence mining over per-user event strings: encode
    * each user's timeline as a string of event initials (ordered by
    * ts with event_id tie-break) and pattern-match with regexes —
    * "error immediately before purchase", "view→click" adjacency,
    * longest error streak. The encode is one keyed agg (the string is
    * bounded by a user's event count); every pattern after that is
    * scan-speed string work, the cheap way to ask ordered-adjacency
    * questions that would otherwise need self-joins per pattern. */
  def q156SequencePatterns(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
    val seqd = ev.groupBy("user_id")
      .agg(concat_ws("", transform(array_sort(collect_list(col("e"))),
        x => x.getField("c"))).as("seq"))
    val runs = regexp_extract_all(col("seq"), lit("e+"), lit(0))
    seqd.select(col("user_id"),
        length(col("seq")).as("seq_len"),
        regexp_count(col("seq"), lit("ep")).as("n_error_then_purchase"),
        regexp_count(col("seq"), lit("vc")).as("n_view_then_click"),
        coalesce(array_max(transform(runs, r => length(r))), lit(0))
          .as("longest_error_run"),
        col("seq").startsWith("s").as("starts_with_signup"))
      .orderBy("user_id")
  }

  /** Linear interpolation over daily gaps — q130's LOCF upgraded to
    * the two-sided fill an analyst actually wants for metrics that
    * trend: each missing day takes the straight line between its
    * nearest observed neighbors. prev/next observation and their days
    * come from two keyed ignoreNulls windows (backward `last`,
    * forward `first`); the lerp itself is kept EXACT-rational —
    * integer cents × integer day spans, with ONE double division at
    * the end written identically in the oracle — so interpolated
    * values cannot float-drift. Edge days with only one neighbor
    * stay null (no extrapolation). */
  def q157Interpolate(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      // NOT dsum: dsum's trailing double cast would make the ×100 a
      // float op (16.31 → 1630.999… → truncates); stay decimal
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("cents"))
    val dense = daily.select("user_id").distinct()
      .withColumn("day",
        explode(expr(
          "sequence(to_date('2024-01-01'), to_date('2024-01-30'), interval 1 day)")))
    val wb = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("cents").isNotNull, col("day"))
    val g = dense.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last(col("cents"), ignoreNulls = true).over(wb))
      .withColumn("pd", last(obsDay, ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("cents"), ignoreNulls = true).over(wf))
      .withColumn("nd", first(obsDay, ignoreNulls = true).over(wf))
    g.select(col("user_id"), col("day"),
        col("cents").isNotNull.as("is_observed"),
        when(col("cents").isNotNull, col("cents").cast("double") / 100.0)
          .when(col("pv").isNotNull && col("nv").isNotNull,
            (col("pv") * datediff(col("nd"), col("day")) +
              col("nv") * datediff(col("day"), col("pd"))).cast("double") /
              (datediff(col("nd"), col("pd")) * 100).cast("double"))
          .otherwise(lit(null).cast("double")).as("filled_value"))
      .orderBy("user_id", "day")
  }

  /** Behavioral diversity score: Shannon entropy of each user's
    * event-type distribution, H = −Σ p·ln p. Cross-engine exact via
    * the q133 idiom taken one step further: each term is rounded to
    * 6 dp and summed as DECIMAL(18,6) — decimal addition is exact
    * and order-independent, so per-user entropy cannot drift on
    * aggregation order (a plain double Σ over even 5 terms could).
    * Two keyed aggs, alphabet-bounded inner rows. */
  def q160Entropy(s: SparkSession, dir: String): DataFrame = {
    val cnts = Tables.events(s, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val tot = cnts.groupBy("user_id")
      .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_types"))
    cnts.join(tot, "user_id")
      .withColumn("p",
        (col("c").cast("double") / col("n_events").cast("double")))
      .withColumn("term",
        round(col("p") * round(log(col("p")), 6), 6).cast(DecimalType(18, 6)))
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        max(col("n_types")).as("n_types"),
        (-sum(col("term"))).cast("double").as("entropy"))
      .orderBy("user_id")
  }

  /** Cadence profile: exact min / median / max gap between a user's
    * consecutive events. Gaps come from one user-keyed LAG; the
    * median is exact integer selection on the per-user sorted gap
    * array (bounded by the user's event count — no funnel needed at
    * per-entity scale), with the even case taking the FLOOR average
    * of the two middle gaps so everything stays BIGINT. */
  def q161MedianGap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("user_id"), (col("ts_us") - col("prev_us")).as("gap_us"))
    gaps.groupBy("user_id")
      .agg(sort_array(collect_list(col("gap_us"))).as("g"))
      .select(col("user_id"),
        size(col("g")).as("n_gaps"),
        element_at(col("g"), 1).as("min_gap_us"),
        element_at(col("g"), size(col("g"))).as("max_gap_us"),
        expr("""CAST(CASE WHEN size(g) % 2 = 1
          THEN element_at(g, CAST((size(g) + 1) DIV 2 AS INT))
          ELSE (element_at(g, CAST(size(g) DIV 2 AS INT))
            + element_at(g, CAST(size(g) DIV 2 + 1 AS INT))) DIV 2
          END AS BIGINT)""").as("median_gap_us"))
      .orderBy("user_id")
  }

  /** Holt linear (double-exponential) forecast, α = β = 1/2: per
    * event type, fold the day-ordered daily counts through
    * l_i = (x_i + l_{i-1} + b_{i-1})/2,
    * b_i = (b_{i-1} + l_i − l_{i-1})/2 (init l₁ = x₁, b₁ = 0) and
    * emit level/trend/next-day forecast — the trend-aware member of
    * the q106 recursive family. Cross-engine parity holds because
    * BOTH engines run the IDENTICAL sequential fold over the same
    * day-sorted array (list_reduce ↔ aggregate), so even where the
    * halvings outrun the 53-bit mantissa the roundings are the same
    * IEEE operations in the same order. Scale shape: two keyed aggs,
    * then scan-speed array work bounded by the calendar span. */
  def q164HoltForecast(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val arr = daily.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day"), col("cnt")))).as("a"))
      .select(col("event_type"),
        transform(col("a"), x => x.getField("cnt").cast("double")).as("xs"))
    arr.select(col("event_type"), size(col("xs")).as("n_days"),
        aggregate(
          slice(col("xs"), lit(2), size(col("xs")) - 1),
          struct(element_at(col("xs"), 1).as("l"), lit(0.0).as("b")),
          (acc, x) => struct(
            ((x + acc.getField("l") + acc.getField("b")) / 2).as("l"),
            ((acc.getField("b") +
              (x + acc.getField("l") + acc.getField("b")) / 2 -
              acc.getField("l")) / 2).as("b"))).as("st"))
      .select(col("event_type"), col("n_days"),
        col("st.l").cast("double").as("level"),
        col("st.b").cast("double").as("trend"),
        (col("st.l") + col("st.b")).cast("double").as("forecast_next"))
      .orderBy("event_type")
  }

  /** Holt–Winters additive seasonal forecast (α = β = γ = 1/2,
    * period 7): the seasonal member of the q106/q164 recursive-fold
    * family. Init from the first week (l₀ = week mean, b₀ = 0,
    * sᵢ = xᵢ − l₀), then fold days 8..n through
    *   l_t = ((x − s_{t−7}) + (l + b)) / 2
    *   b_t = ((l_t − l) + b) / 2
    *   s_t = ((x − l_t) + s_{t−7}) / 2
    * carried as a struct(l, b, i, s[7]) accumulator whose seasonal
    * slot cycles with the day counter. Cross-engine parity is q164's
    * argument: BOTH engines run the identical sequential fold
    * (aggregate ↔ list_reduce) with identically-parenthesised IEEE
    * arithmetic, so every rounding matches bit-for-bit. Scale shape:
    * two keyed aggs, then scan-speed array work bounded by the
    * calendar span (30 days here) — never a per-event shuffle. */
  def q173HoltWinters(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val arr = daily.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day"), col("cnt")))).as("a"))
      .select(col("event_type"),
        transform(col("a"), x => x.getField("cnt").cast("double")).as("xs"))
      .filter(size(col("xs")) >= 8)
    val withInit = arr
      .withColumn("l0",
        aggregate(slice(col("xs"), 1, 7), lit(0.0), (a, x) => a + x) / 7.0)
      .withColumn("s0", transform(slice(col("xs"), 1, 7), x => x - col("l0")))
    val folded = withInit.select(
      col("event_type"), size(col("xs")).as("n_days"),
      aggregate(
        slice(col("xs"), lit(8), size(col("xs")) - 7),
        struct(col("l0").as("l"), lit(0.0).as("b"), lit(7).as("i"),
          col("s0").as("s")),
        (acc, x) => {
          val l = acc.getField("l"); val b = acc.getField("b")
          val i = acc.getField("i"); val sArr = acc.getField("s")
          val slot = (i % 7) + 1
          val sOld = element_at(sArr, slot)
          val lNew = ((x - sOld) + (l + b)) / 2.0
          val bNew = ((lNew - l) + b) / 2.0
          val sNew = ((x - lNew) + sOld) / 2.0
          struct(lNew.as("l"), bNew.as("b"), (i + 1).as("i"),
            concat(slice(sArr, lit(1), slot - 1), array(sNew),
              slice(sArr, slot + 1, lit(7) - slot)).as("s"))
        }).as("st"))
    folded.select(col("event_type"), col("n_days"),
        col("st.l").cast("double").as("level"),
        col("st.b").cast("double").as("trend"),
        element_at(col("st.s"), (col("st.i") % 7) + 1).cast("double")
          .as("seasonal_next"),
        ((col("st.l") + col("st.b")) +
          element_at(col("st.s"), (col("st.i") % 7) + 1)).cast("double")
          .as("forecast_next"))
      .orderBy("event_type")
  }

  /** Shared daily volume series: (event_type, day, cnt, d) with d =
    * days since the fixed 2024-01-01 epoch. One definition feeds
    * q176/q181/q182 so the epoch and grouping cannot drift. */
  private def dailySeries(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("d", datediff(col("day"), lit("2024-01-01").cast("date")))

  /** Pearson r from the six BIGINT moment sums (n, sx, sy, sxx, syy,
    * sxy), guarded for zero variance — shared by q181/q182 so both
    * lag statistics use the one formula. */
  private val pearsonFromMoments =
    expr("""CAST(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
        THEN CAST(n * sxy - sx * sy AS DOUBLE)
          / sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)
            AS DOUBLE))
        ELSE NULL END AS DOUBLE)""")

  /** Theil–Sen robust trend: per event type, the MEDIAN of all
    * pairwise daily-count slopes — the outlier-proof alternative to
    * q139's OLS line (one wild day moves OLS, not the pairwise
    * median). The pair join is keyed by event type and the daily
    * aggregate is bounded by the calendar span (30 days → ≤435 pairs
    * per type), so the quadratic stays post-aggregation — the same
    * containment argument as q117. Median = exact integer selection
    * on the per-type sorted slope array (q161's idiom), slopes one
    * identically-written double division each; the even case
    * averages the two middle slopes. */
  def q176TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = dailySeries(s, dir)
    val a = daily.select(col("event_type"), col("d").as("d1"),
      col("cnt").as("y1"))
    val b = daily.select(col("event_type"), col("d").as("d2"),
      col("cnt").as("y2"))
    val slopes = a.join(b, Seq("event_type"))
      .filter(col("d1") < col("d2"))
      .select(col("event_type"),
        ((col("y2") - col("y1")).cast("double") /
          (col("d2") - col("d1")).cast("double")).as("slope"))
    slopes.groupBy("event_type")
      .agg(sort_array(collect_list(col("slope"))).as("sl"))
      .select(col("event_type"),
        size(col("sl")).as("n_pairs"),
        expr("""CAST(CASE WHEN size(sl) % 2 = 1
          THEN element_at(sl, CAST((size(sl) + 1) DIV 2 AS INT))
          ELSE (element_at(sl, CAST(size(sl) DIV 2 AS INT))
            + element_at(sl, CAST(size(sl) DIV 2 + 1 AS INT))) / 2.0
          END AS DOUBLE)""").as("slope_per_day"))
      .orderBy("event_type")
  }

  /** Autocorrelation function of daily event volume, lags 1..7 per
    * event type — the seasonality diagnostic behind q153/q173's
    * period-7 choice. One keyed shuffle builds the daily series; the
    * lag fan-out is an explode(1..7) joined back on (type, day+lag)
    * — a keyed equi-join, 7× the 30-row aggregate, bounded by the
    * calendar span. Pearson r per (type, lag) from six BIGINT moment
    * sums over the matched pairs (the sample shrinks with lag, and
    * both engines see the identical pair set), double only in the
    * final expression. */
  def q181Acf(s: SparkSession, dir: String): DataFrame = {
    val daily = dailySeries(s, dir)
    val lagged = daily
      .withColumn("lag", explode(array((1 to 7).map(lit): _*)))
      .select(col("event_type"), (col("d") + col("lag")).as("d2"),
        col("lag"), col("cnt").as("x"))
    val pairs = lagged.join(
      daily.select(col("event_type"), col("d").as("d2"),
        col("cnt").as("y")),
      Seq("event_type", "d2"))
    pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("lag"), col("n"),
        pearsonFromMoments.as("acf"))
      .orderBy("event_type", "lag")
  }

  /** Lead–lag cross-correlation: clicks vs purchases daily volume at
    * offsets −7..7 — "purchases trail clicks by how many days?".
    * Same bounded lag fan-out as q181, negative offsets included;
    * the lag with max |r| is read off the 15-row output. */
  def q182LeadLag(s: SparkSession, dir: String): DataFrame = {
    val daily = dailySeries(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
    val x = daily.filter(col("event_type") === "click")
      .select(col("d"), col("cnt").as("x"))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("d").as("dy"), col("cnt").as("y"))
    val fan = x.withColumn("lag", explode(array((-7 to 7).map(lit): _*)))
      .select((col("d") + col("lag")).as("dy"), col("lag"), col("x"))
    fan.join(y, Seq("dy"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("lag"), col("n"),
        pearsonFromMoments.as("xcorr"))
      .orderBy("lag")
  }

  /** q268 — EMBARGOED temporal split (purged time-series validation,
    * López de Prado 2018 ch.7; every time-split eval of a model on
    * user behavior needs it): train strictly before the cutoff, test
    * strictly after cutoff + embargo, the gap quarantined — plus the
    * leakage AUDIT a time split must ship: per split, how many of its
    * users also appear in train (entity overlap across a time split
    * is the usual leak even when timestamps don't overlap; reported,
    * not silently dropped — dropping is q122's group-split job). One
    * scan + one distinct (user, split) frame joined back. */
  def q268EmbargoSplit(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    val testStart = lit("2024-01-21 00:00:00").cast("timestamp")
    val tagged = graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("split",
        when(col("ts") < cutoff, "train")
          .when(col("ts") >= testStart, "test")
          .otherwise("embargoed"))
    val summary = tagged.groupBy("split")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
    val us = tagged.select("user_id", "split").distinct()
    val trainUsers = us.filter(col("split") === "train").select("user_id")
    val overlap = us.join(trainUsers, "user_id")
      .groupBy("split").agg(count(lit(1)).as("users_also_in_train"))
    summary.join(overlap, Seq("split"), "left")
      .select(col("split"), col("n_events"), col("n_users"),
        col("first_ts"), col("last_ts"),
        coalesce(col("users_also_in_train"), lit(0L)).as("users_also_in_train"))
      .orderBy("split")
  }

  val queries: Map[String, Q] = Map(
    "q268_embargo_split" -> q268EmbargoSplit _,
    "q181_acf" -> q181Acf _,
    "q182_lead_lag" -> q182LeadLag _,
    "q176_theil_sen" -> q176TheilSen _,
    "q173_holt_winters" -> q173HoltWinters _,
    "q157_interpolate" -> q157Interpolate _,
    "q164_holt_forecast" -> q164HoltForecast _,
    "q160_entropy" -> q160Entropy _,
    "q161_median_gap" -> q161MedianGap _,
    "q155_funnel_steps" -> q155FunnelSteps _,
    "q156_sequence_patterns" -> q156SequencePatterns _,
    "q150_attribution" -> q150Attribution _,
    "q12_date_spine" -> q12DateSpine _,
    "q130_gap_fill" -> q130GapFill _,
    "q136_time_weighted_avg" -> q136TimeWeightedAvg _,
    "q143_interval_union" -> q143IntervalUnion _,
    "q116_funnel" -> q116Funnel _,
    "q121_markov_transitions" -> q121MarkovTransitions _,
    "q13_asof_join" -> q13AsofJoin _,
    "q16_datetime_parts" -> q16DatetimeParts _,
    "q19_monthly_rollup" -> q19MonthlyRollup _,
    "q25_trailing_avg" -> q25TrailingAvg _,
    "q32_dialect_shims" -> q32DialectShims _,
    "q33_range_join" -> q33RangeJoin _,
  )

  val oracles: Map[String, String] = Map(
    "q268_embargo_split" ->
      """WITH tagged AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
        |         WHEN ts >= TIMESTAMP '2024-01-21 00:00:00' THEN 'test'
        |         ELSE 'embargoed' END AS split
        |  FROM events),
        |summary AS (
        |  SELECT split, COUNT(*) AS n_events,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |    strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
        |  FROM tagged GROUP BY split),
        |us AS (SELECT DISTINCT user_id, split FROM tagged),
        |ov AS (
        |  SELECT us.split, COUNT(*) AS users_also_in_train
        |  FROM us JOIN (SELECT user_id FROM us WHERE split = 'train') t
        |    ON us.user_id = t.user_id
        |  GROUP BY us.split)
        |SELECT s.split, s.n_events, s.n_users, s.first_ts, s.last_ts,
        |  COALESCE(ov.users_also_in_train, 0) AS users_also_in_train
        |FROM summary s LEFT JOIN ov ON s.split = ov.split
        |ORDER BY s.split""".stripMargin,
    "q181_acf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        |  FROM events GROUP BY 1, 2),
        |fan AS (
        |  SELECT event_type, d + l AS d2, l AS lag, cnt AS x
        |  FROM daily, (SELECT unnest(range(1, 8)) AS l)),
        |pairs AS (
        |  SELECT f.event_type, f.lag, f.x, dd.cnt AS y
        |  FROM fan f JOIN daily dd
        |    ON dd.event_type = f.event_type AND dd.d = f.d2),
        |m AS (
        |  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS INTEGER) AS lag, n,
        |  CAST(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)
        |        AS DOUBLE))
        |    ELSE NULL END AS DOUBLE) AS acf
        |FROM m ORDER BY event_type, lag""".stripMargin,
    "q182_lead_lag" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
        |x AS (SELECT d, cnt AS x FROM daily WHERE event_type = 'click'),
        |y AS (SELECT d AS dy, cnt AS y FROM daily
        |  WHERE event_type = 'purchase'),
        |fan AS (
        |  SELECT d + l AS dy, l AS lag, x
        |  FROM x, (SELECT unnest(range(-7, 8)) AS l)),
        |m AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM fan JOIN y USING (dy) GROUP BY 1)
        |SELECT CAST(lag AS INTEGER) AS lag, n,
        |  CAST(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)
        |        AS DOUBLE))
        |    ELSE NULL END AS DOUBLE) AS xcorr
        |FROM m ORDER BY lag""".stripMargin,
    "q176_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        |  FROM events GROUP BY 1, 2),
        |slopes AS (
        |  SELECT a.event_type,
        |    CAST(CAST(b.cnt - a.cnt AS DOUBLE)
        |      / CAST(b.d - a.d AS DOUBLE) AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b USING (event_type)
        |  WHERE a.d < b.d),
        |arr AS (
        |  SELECT event_type, list(slope ORDER BY slope) AS sl
        |  FROM slopes GROUP BY 1)
        |SELECT event_type, CAST(len(sl) AS INTEGER) AS n_pairs,
        |  CAST(CASE WHEN len(sl) % 2 = 1
        |    THEN sl[CAST((len(sl) + 1) // 2 AS INTEGER)]
        |    ELSE (sl[CAST(len(sl) // 2 AS INTEGER)]
        |      + sl[CAST(len(sl) // 2 + 1 AS INTEGER)]) / 2.0
        |    END AS DOUBLE) AS slope_per_day
        |FROM arr ORDER BY event_type""".stripMargin,
    "q173_holt_winters" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |arr AS (
        |  SELECT event_type, list(CAST(cnt AS DOUBLE) ORDER BY day) AS xs
        |  FROM daily GROUP BY 1 HAVING len(list(cnt)) >= 8),
        |ini AS (
        |  SELECT event_type, xs, len(xs) AS n_days,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), xs[1:7]),
        |      (a, b) -> a + b) / 7.0 AS l0
        |  FROM arr),
        |f AS (
        |  SELECT event_type, n_days,
        |    list_reduce(
        |      list_prepend(
        |        list_concat([l0, CAST(0 AS DOUBLE), CAST(7 AS DOUBLE)],
        |          list_transform(xs[1:7], v -> v - l0)),
        |        list_transform(xs[8:], v -> [v])),
        |      (acc, x) -> list_concat(
        |        [((x[1] - acc[4 + (CAST(acc[3] AS INTEGER) % 7)])
        |            + (acc[1] + acc[2])) / 2,
        |         ((((x[1] - acc[4 + (CAST(acc[3] AS INTEGER) % 7)])
        |              + (acc[1] + acc[2])) / 2 - acc[1]) + acc[2]) / 2,
        |         acc[3] + 1],
        |        list_transform(range(0, 7), j ->
        |          CASE WHEN j = CAST(acc[3] AS INTEGER) % 7
        |          THEN ((x[1] - ((x[1]
        |                - acc[4 + (CAST(acc[3] AS INTEGER) % 7)])
        |              + (acc[1] + acc[2])) / 2)
        |            + acc[4 + (CAST(acc[3] AS INTEGER) % 7)]) / 2
        |          ELSE acc[4 + j] END))) AS fs
        |  FROM ini)
        |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
        |  CAST(fs[1] AS DOUBLE) AS level, CAST(fs[2] AS DOUBLE) AS trend,
        |  CAST(fs[4 + (CAST(fs[3] AS INTEGER) % 7)] AS DOUBLE)
        |    AS seasonal_next,
        |  CAST((fs[1] + fs[2]) + fs[4 + (CAST(fs[3] AS INTEGER) % 7)]
        |    AS DOUBLE) AS forecast_next
        |FROM f ORDER BY event_type""".stripMargin,
    "q164_holt_forecast" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |arr AS (
        |  SELECT event_type, list(CAST(cnt AS DOUBLE) ORDER BY day) AS xs
        |  FROM daily GROUP BY 1),
        |f AS (
        |  SELECT event_type, len(xs) AS n_days,
        |    list_reduce(
        |      list_prepend([xs[1], CAST(0 AS DOUBLE)],
        |        list_transform(xs[2:], v -> [v])),
        |      (acc, x) -> [(x[1] + acc[1] + acc[2]) / 2,
        |        (acc[2] + (x[1] + acc[1] + acc[2]) / 2 - acc[1]) / 2]) AS st
        |  FROM arr)
        |SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
        |  CAST(st[1] AS DOUBLE) AS level, CAST(st[2] AS DOUBLE) AS trend,
        |  CAST(st[1] + st[2] AS DOUBLE) AS forecast_next
        |FROM f ORDER BY event_type""".stripMargin,
    "q160_entropy" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT user_id, SUM(c) AS n_events, COUNT(*) AS n_types
        |  FROM c GROUP BY 1),
        |terms AS (
        |  SELECT c.user_id, t.n_events, t.n_types,
        |    CAST(round(
        |      (CAST(c.c AS DOUBLE) / CAST(t.n_events AS DOUBLE))
        |      * round(ln(CAST(c.c AS DOUBLE) / CAST(t.n_events AS DOUBLE)), 6),
        |      6) AS DECIMAL(18, 6)) AS term
        |  FROM c JOIN t ON t.user_id = c.user_id)
        |SELECT user_id, CAST(MAX(n_events) AS BIGINT) AS n_events,
        |  CAST(MAX(n_types) AS BIGINT) AS n_types,
        |  CAST(-SUM(term) AS DOUBLE) AS entropy
        |FROM terms GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q161_median_gap" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |gp AS (
        |  SELECT user_id, ts_us - lag(ts_us) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS gap
        |  FROM ev),
        |arr AS (
        |  SELECT user_id, list(gap ORDER BY gap) AS g
        |  FROM gp WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT user_id, CAST(len(g) AS INTEGER) AS n_gaps,
        |  g[1] AS min_gap_us, g[len(g)] AS max_gap_us,
        |  CAST(CASE WHEN len(g) % 2 = 1 THEN g[(len(g) + 1) // 2]
        |    ELSE (g[len(g) // 2] + g[len(g) // 2 + 1]) // 2
        |  END AS BIGINT) AS median_gap_us
        |FROM arr ORDER BY user_id""".stripMargin,
    "q157_interpolate" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |dense AS (
        |  SELECT u.user_id, s.day
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (
        |    SELECT CAST(unnest(generate_series(DATE '2024-01-01',
        |      DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day) s),
        |g AS (
        |  SELECT d.user_id, d.day, dl.cents,
        |    last_value(dl.cents IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN dl.cents IS NOT NULL THEN d.day END
        |      IGNORE NULLS) OVER wb AS pd,
        |    first_value(dl.cents IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN dl.cents IS NOT NULL THEN d.day END
        |      IGNORE NULLS) OVER wf AS nd
        |  FROM dense d
        |  LEFT JOIN daily dl ON dl.user_id = d.user_id AND dl.day = d.day
        |  WINDOW wb AS (PARTITION BY d.user_id ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY d.user_id ORDER BY d.day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day, cents IS NOT NULL AS is_observed,
        |  CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) / 100.0
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |      CAST(pv * datediff('day', day, nd)
        |        + nv * datediff('day', pd, day) AS DOUBLE)
        |      / CAST(datediff('day', pd, nd) * 100 AS DOUBLE)
        |    ELSE NULL END AS filled_value
        |FROM g ORDER BY user_id, day""".stripMargin,
    "q155_funnel_steps" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts_us END) AS signup_us
        |  FROM ev GROUP BY 1
        |  HAVING MIN(CASE WHEN event_type = 'signup' THEN ts_us END)
        |    IS NOT NULL),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS click_us
        |  FROM ev e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us >= s1.signup_us
        |    AND e.ts_us <= s1.signup_us + 604800000000
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS purchase_us
        |  FROM ev e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us >= s2.click_us
        |    AND e.ts_us <= s2.click_us + 604800000000
        |  GROUP BY 1)
        |SELECT s1.user_id, signup_us, click_us, purchase_us,
        |  CAST(CASE WHEN purchase_us IS NOT NULL THEN 3
        |    WHEN click_us IS NOT NULL THEN 2 ELSE 1 END AS INTEGER)
        |    AS reached_step
        |FROM s1
        |LEFT JOIN s2 ON s2.user_id = s1.user_id
        |LEFT JOIN s3 ON s3.user_id = s1.user_id
        |ORDER BY s1.user_id""".stripMargin,
    "q156_sequence_patterns" ->
      """WITH sq AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY epoch_us(ts), event_id) AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id,
        |  CAST(length(seq) AS INTEGER) AS seq_len,
        |  CAST(len(regexp_extract_all(seq, 'ep')) AS INTEGER)
        |    AS n_error_then_purchase,
        |  CAST(len(regexp_extract_all(seq, 'vc')) AS INTEGER)
        |    AS n_view_then_click,
        |  CAST(COALESCE(list_aggregate(list_transform(
        |    regexp_extract_all(seq, 'e+'), x -> length(x)), 'max'), 0)
        |    AS INTEGER) AS longest_error_run,
        |  seq LIKE 's%' AS starts_with_signup
        |FROM sq ORDER BY user_id""".stripMargin,
    "q150_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |tagged AS (
        |  SELECT *, COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey
        |  FROM ev),
        |closed AS (
        |  SELECT DISTINCT user_id, journey FROM tagged
        |  WHERE event_type = 'purchase'),
        |touches AS (
        |  SELECT t.* FROM tagged t JOIN closed c USING (user_id, journey)
        |  WHERE t.event_type != 'purchase'),
        |pos AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, journey
        |      ORDER BY ts_us, event_id) AS pos,
        |    COUNT(*) OVER (PARTITION BY user_id, journey) AS n
        |  FROM touches)
        |SELECT event_type AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS touches,
        |  CAST(COUNT(DISTINCT (user_id, journey)) AS BIGINT)
        |    AS journeys_touched,
        |  CAST(SUM(CASE WHEN n = 1 THEN 10000 WHEN n = 2 THEN 5000
        |    WHEN pos = 1 OR pos = n THEN 4000
        |    ELSE 2000 // (n - 2)
        |      + CASE WHEN pos - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
        |    END) AS BIGINT) AS credit_bps
        |FROM pos GROUP BY 1 ORDER BY 1""".stripMargin,
    "q143_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s_us,
        |    epoch_us(ts) + 600000000 AS e_us
        |  FROM events),
        |m AS (
        |  SELECT *,
        |    MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        |  FROM iv),
        |f AS (
        |  SELECT *, CASE WHEN prev_max_end IS NULL OR s_us > prev_max_end
        |    THEN 1 ELSE 0 END AS new_island FROM m),
        |g AS (
        |  SELECT *, SUM(new_island) OVER (
        |      PARTITION BY user_id ORDER BY s_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |isl AS (
        |  SELECT user_id, island, MIN(s_us) AS island_start,
        |    MAX(e_us) AS island_end, COUNT(*) AS n_events
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(SUM(island_end - island_start) AS BIGINT) AS covered_us
        |FROM isl GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q136_time_weighted_avg" ->
      """WITH seg AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents,
        |    COALESCE(LEAD(epoch_us(ts)) OVER (
        |        PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      - epoch_us(ts), 0) AS dur_us
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(dur_us) AS BIGINT) AS span_us,
        |  CAST(SUM(v_cents * dur_us) AS BIGINT) AS weighted_sum,
        |  CASE WHEN SUM(dur_us) > 0 THEN
        |    CAST(CAST(SUM(v_cents * dur_us) AS DOUBLE)
        |      / CAST(SUM(dur_us) AS DOUBLE) AS DOUBLE) END AS twa_cents
        |FROM seg GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q130_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_value
        |  FROM events GROUP BY 1, 2),
        |dense AS (
        |  SELECT u.user_id, s.day
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (
        |    SELECT CAST(unnest(generate_series(DATE '2024-01-01',
        |      DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day) s)
        |SELECT d.user_id, d.day, dl.daily_value,
        |  last_value(dl.daily_value IGNORE NULLS) OVER (
        |    PARTITION BY d.user_id ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
        |  dl.daily_value IS NOT NULL AS is_observed
        |FROM dense d
        |LEFT JOIN daily dl ON dl.user_id = d.user_id AND dl.day = d.day
        |ORDER BY d.user_id, d.day""".stripMargin,
    "q121_markov_transitions" ->
      """WITH t AS (
        |  SELECT user_id,
        |    LAG(event_type) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, next_type, COUNT(*) AS transitions
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, transitions,
        |  CAST(SUM(transitions) OVER (PARTITION BY prev_type) AS BIGINT)
        |    AS prev_total,
        |  CAST(CAST(transitions AS DOUBLE)
        |    / CAST(SUM(transitions) OVER (PARTITION BY prev_type) AS BIGINT)
        |    AS DOUBLE) AS transition_rate
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
    "q116_funnel" ->
      """WITH s AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
        |      AS first_signup_us
        |  FROM events GROUP BY 1
        |  HAVING MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
        |    IS NOT NULL),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase_us
        |  FROM events e JOIN s ON s.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) >= s.first_signup_us
        |  GROUP BY 1)
        |SELECT s.user_id, s.first_signup_us, p.first_purchase_us,
        |  COALESCE(p.first_purchase_us <= s.first_signup_us + 604800000000,
        |           FALSE) AS converted_7d
        |FROM s LEFT JOIN p ON p.user_id = s.user_id
        |ORDER BY s.user_id""".stripMargin,
    "q12_date_spine" ->
      """SELECT d AS date_day,
        |  CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
        |  CAST(year(d) AS INTEGER) AS "year",
        |  CAST(quarter(d) AS INTEGER) AS quarter,
        |  CAST(month(d) AS INTEGER) AS "month",
        |  CAST(dayofmonth(d) AS INTEGER) AS day_of_month,
        |  CAST(dayofweek(d) + 1 AS INTEGER) AS day_of_week,
        |  CAST(dayofyear(d) AS INTEGER) AS day_of_year,
        |  dayname(d) AS day_name, monthname(d) AS month_name,
        |  'Q' || quarter(d) AS quarter_label,
        |  dayofweek(d) IN (0, 6) AS is_weekend
        |FROM (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
        |       DATE '2024-12-31', INTERVAL 1 DAY)) AS DATE) AS d)
        |ORDER BY date_day""".stripMargin,
    "q13_asof_join" ->
      """SELECT e.event_id, e.user_id, e.event_type,
        |  epoch_us(e.ts) AS ts_us,
        |  s.signup_event_id AS asof_signup_event_id,
        |  s.signup_value AS asof_signup_value
        |FROM events e
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, event_id AS signup_event_id,
        |    value AS signup_value
        |  FROM events WHERE event_type = 'signup') s
        |ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY event_id""".stripMargin,
    "q16_datetime_parts" ->
      """SELECT order_date,
        |  CAST(date_trunc('month', order_date) AS DATE) AS month_start,
        |  CAST(year(order_date) AS INTEGER) AS "year",
        |  CAST(quarter(order_date) AS INTEGER) AS quarter,
        |  CAST(month(order_date) AS INTEGER) AS "month",
        |  CAST(dayofmonth(order_date) AS INTEGER) AS day_of_month,
        |  CAST(dayofweek(order_date) + 1 AS INTEGER) AS day_of_week,
        |  CAST(dayofyear(order_date) AS INTEGER) AS day_of_year,
        |  CAST(weekofyear(order_date) AS INTEGER) AS week_of_year,
        |  strftime(order_date, '%Y-%m') AS year_month
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date FROM orders)
        |ORDER BY order_date""".stripMargin,
    "q19_monthly_rollup" ->
      """SELECT o_custkey AS customer_id,
        |  strftime(o_orderdate, '%Y-%m') AS year_month,
        |  CAST(year(o_orderdate) AS INTEGER) AS "year",
        |  CAST(month(o_orderdate) AS INTEGER) AS "month",
        |  COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_count
        |FROM orders GROUP BY 1, 2, 3, 4
        |ORDER BY customer_id, year_month""".stripMargin,
    "q32_dialect_shims" ->
      """SELECT o_orderkey AS order_id,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 3 DAY AS DATE) AS minus_3_days,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2_months,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-06-15') AS days_to_ref,
        |  CAST(floor(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-06-15') / 7)
        |    AS BIGINT) AS weeks_to_ref,
        |  CAST(2024 - year(o_orderdate)
        |    - CASE WHEN 6 < month(o_orderdate)
        |            OR (6 = month(o_orderdate) AND 15 < dayofmonth(o_orderdate))
        |           THEN 1 ELSE 0 END AS BIGINT) AS years_to_ref,
        |  strftime(o_orderdate, '%Y%m%d') AS fmt_ymd,
        |  strftime(o_orderdate, '%Y-%m') AS fmt_ym,
        |  strftime(o_orderdate, '%b') AS fmt_mon
        |FROM orders ORDER BY order_id""".stripMargin,
    "q33_range_join" ->
      """WITH months AS (
        |  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-12-01',
        |         INTERVAL 1 MONTH)) AS DATE) AS month_start),
        |m2 AS (SELECT month_start, last_day(month_start) AS month_end FROM months)
        |SELECT month_start, COUNT(*) AS event_count,
        |  COUNT(DISTINCT user_id) AS active_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN m2
        |  ON CAST(ts AS DATE) BETWEEN month_start AND month_end
        |GROUP BY month_start ORDER BY month_start""".stripMargin,
    "q25_trailing_avg" ->
      """SELECT event_date, daily_rows,
        |  AVG(daily_rows) OVER (ORDER BY event_date
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trailing_7d_avg,
        |  CAST(daily_rows / AVG(daily_rows) OVER (ORDER BY event_date
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS pct_of_baseline
        |FROM (
        |  SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS daily_rows
        |  FROM events GROUP BY 1)
        |ORDER BY event_date""".stripMargin,
  )
}
