package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two-pass histogram funnel must return exactly the sorted
  * definition of the median — including the even-n interpolation
  * pair, ranks that straddle bucket boundaries, and the all-equal
  * hot-bucket case. */
class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def check(values: Seq[Long], width: Long): Unit = {
    val (n, midSum, midCount) =
      ExactQuantile.medianCents(values.toDF("v"), col("v"), width)
    assert(n == values.size)
    val sorted = values.sorted
    val k1 = ((n + 1) / 2 - 1).toInt
    val k2 = ((n + 2) / 2 - 1).toInt
    val expect = if (k1 == k2) sorted(k1) else sorted(k1) + sorted(k2)
    assert(midSum == expect, s"midSum $midSum != $expect for $values")
    assert(midCount == (if (k1 == k2) 1 else 2))
  }

  test("funnel median equals the sorted definition (odd/even/hot-bucket/boundary)") {
    check(Seq(5L, 1L, 9L, 7L, 3L), 2L)        // odd n, tiny buckets
    check(Seq(10L, 2L, 8L, 4L), 3L)           // even n, middles straddle buckets
    check(Seq(7L, 7L, 7L, 7L, 7L, 7L), 100L)  // all-equal hot bucket
    check((1L to 101L).toSeq, 10L)            // uniform, many buckets
    check(Seq(1L, 1000000L), 10L)             // sparse extremes
  }

  test("grouped funnel quantiles equal the per-group nearest-rank definition") {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val got = ExactQuantile.groupedQuantiles(Tables.events(spark, sfDir),
        "event_type", cents, Seq("p50" -> 0.5, "p95" -> 0.95))
      .select("event_type", "pct", "value_cents")
      .as[(String, String, Long)].collect().toSet
    val byGroup = Tables.events(spark, sfDir)
      .select(col("event_type"), cents.as("v")).filter(col("v").isNotNull)
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._2).sorted }
    val expect = byGroup.flatMap { case (g, sorted) =>
      Seq("p50" -> 0.5, "p95" -> 0.95).map { case (pct, p) =>
        val k = math.max(1L, math.ceil(p * sorted.length).toLong)
        (g, pct, sorted((k - 1).toInt))
      }
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q128's funnel equals the sorted lineitem median at sf0.001") {
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    val li = Tables.lineitem(spark, sfDir)
    val (n, midSum, midCount) = ExactQuantile.medianCents(li, cents)
    val sorted = li.select(cents.as("v")).orderBy("v").as[Long].collect()
    assert(n == sorted.length)
    val k1 = ((n + 1) / 2 - 1).toInt
    val k2 = ((n + 2) / 2 - 1).toInt
    val expect = if (k1 == k2) sorted(k1) else sorted(k1) + sorted(k2)
    assert(midSum == expect && midCount == (if (k1 == k2) 1 else 2))
  }
}
