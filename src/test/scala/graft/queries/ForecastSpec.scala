package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q173's Holt–Winters fold re-implemented as a plain Scala loop —
  * the same defence RankStatsSpec gives the rank statistics: the
  * DuckDB oracle runs the SAME fold, so a shared formula error would
  * be invisible to the hash gate; an independent scalar
  * implementation is not fooled. Exact equality is required (both
  * run the identical IEEE operation sequence).
  */
class ForecastSpec extends SparkSpec {

  private def holtWinters(xs: Array[Double]): (Double, Double, Double) = {
    val l0 = xs.take(7).foldLeft(0.0)(_ + _) / 7.0
    var l = l0; var b = 0.0; var i = 7
    val s = Array.tabulate(7)(j => xs(j) - l0)
    for (t <- 7 until xs.length) {
      val slot = i % 7
      val x = xs(t); val sOld = s(slot)
      val lNew = ((x - sOld) + (l + b)) / 2.0
      val bNew = ((lNew - l) + b) / 2.0
      s(slot) = ((x - lNew) + sOld) / 2.0
      l = lNew; b = bNew; i += 1
    }
    (l, b, s(i % 7))
  }

  test("q181: joined-lag ACF equals the direct day-paired Pearson") {
    // pair by CALENDAR DAY, exactly as the query's d+lag join does —
    // an index-shifted series would silently assume gap-free days
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("d", datediff(col("day"), lit("2024-01-01").cast("date")))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(r => r.getInt(3) -> r.getLong(2).toDouble).toMap }
    val out = Temporal.q181Acf(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Double]("acf"))
      .toMap
    for ((t, byDay) <- daily; lag <- 1 to 3) {
      val pairs = byDay.toSeq.sortBy(_._1).flatMap { case (d, x) =>
        byDay.get(d + lag).map(y => (x, y))
      }
      val n = pairs.length
      val ma = pairs.map(_._1).sum / n; val mb = pairs.map(_._2).sum / n
      val cov = pairs.map { case (p, q) => (p - ma) * (q - mb) }.sum
      val va = pairs.map(p => (p._1 - ma) * (p._1 - ma)).sum
      val vb = pairs.map(q => (q._2 - mb) * (q._2 - mb)).sum
      val r = cov / math.sqrt(va * vb)
      assert(math.abs(out((t, lag)) - r) < 1e-9,
        s"acf($t, $lag): ${out((t, lag))} vs $r")
    }
  }

  test("q182: lead-lag cross-correlation equals day-paired Pearson") {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("d", datediff(col("day"), lit("2024-01-01").cast("date")))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(r => r.getInt(3) -> r.getLong(2).toDouble).toMap }
    val clicks = daily("click"); val purch = daily("purchase")
    val out = Temporal.q182LeadLag(spark, sfDir).collect()
      .map(r => r.getInt(0) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    for (lag <- -3 to 3) {
      val pairs = clicks.toSeq.sortBy(_._1).flatMap { case (d, x) =>
        purch.get(d + lag).map(y => (x, y))
      }
      val n = pairs.length
      val ma = pairs.map(_._1).sum / n; val mb = pairs.map(_._2).sum / n
      val cov = pairs.map { case (p, q) => (p - ma) * (q - mb) }.sum
      val va = pairs.map(p => (p._1 - ma) * (p._1 - ma)).sum
      val vb = pairs.map(q => (q._2 - mb) * (q._2 - mb)).sum
      val r = cov / math.sqrt(va * vb)
      assert(math.abs(out(lag).get - r) < 1e-9,
        s"xcorr($lag): ${out(lag)} vs $r")
    }
  }

  test("q176: Theil-Sen equals the literal pairwise-slope median") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("d", datediff(col("day"), lit("2024-01-01").cast("date")))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(r => (r.getInt(3), r.getLong(2))).sortBy(_._1) }
    val out = Temporal.q176TheilSen(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("slope_per_day")).toMap
    for ((t, pts) <- daily) {
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2).toDouble /
        (pts(j)._1 - pts(i)._1).toDouble).sorted
      val m = slopes.length
      val med = if (m % 2 == 1) slopes(m / 2)
                else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
      assert(math.abs(out(t) - med) < 1e-12, s"$t: ${out(t)} vs $med")
    }
  }

  test("q173: struct-fold equals the scalar reference loop, per type") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type", "day")
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.map(_.getLong(2).toDouble) }
    val out = Temporal.q173HoltWinters(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("seasonal_next"), r.getAs[Double]("forecast_next")))
      .toMap
    assert(out.nonEmpty)
    for ((t, xs) <- daily if xs.length >= 8) {
      val (l, b, sNext) = holtWinters(xs)
      val (gl, gb, gs, gf) = out(t)
      assert(gl === l, s"level mismatch for $t")
      assert(gb === b, s"trend mismatch for $t")
      assert(gs === sNext, s"seasonal mismatch for $t")
      assert(gf === (l + b) + sNext, s"forecast mismatch for $t")
    }
  }
}
