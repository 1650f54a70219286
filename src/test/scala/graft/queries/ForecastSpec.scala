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

  test("q181: joined-lag ACF equals the direct shifted-series Pearson") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type", "day")
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.map(_.getLong(2).toDouble) }
    val out = Temporal.q181Acf(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Double]("acf"))
      .toMap
    for ((t, xs) <- daily; lag <- 1 to 3) {
      val a = xs.dropRight(lag); val b = xs.drop(lag)
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (p, q) => (p - ma) * (q - mb) }.sum
      val va = a.map(p => (p - ma) * (p - ma)).sum
      val vb = b.map(q => (q - mb) * (q - mb)).sum
      val r = cov / math.sqrt(va * vb)
      assert(math.abs(out((t, lag)) - r) < 1e-9,
        s"acf($t, $lag): ${out((t, lag))} vs $r")
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
