package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a global sort — the two-pass
  * histogram funnel every engine uses when `ORDER BY` over the whole
  * corpus is off the table:
  *
  *   pass 1  bucket histogram: one scan, groupBy(value DIV width) —
  *           a bounded-cardinality aggregate (|domain| / width rows)
  *           collected to the driver, where a cumulative sum locates
  *           the bucket holding each wanted rank;
  *   pass 2  rank lookup inside ONLY the located bucket(s): the scan
  *           is filtered to one bucket (predicate pushdown prunes the
  *           rest), and the k-th local order statistic is a
  *           TakeOrderedAndProject of the local offset + MAX — no
  *           window, no global exchange.
  *
  * At 100 TB: pass 1 shuffles |buckets| rows, pass 2 touches one
  * bucket's rows. If a single bucket is pathologically hot (all
  * values equal), the same funnel recurses with a narrower width
  * inside that bucket; the fixtures never need it, so this
  * implementation keeps the single refinement level and documents
  * the recursion as the production escape hatch.
  *
  * Values are worked in integer CENTS (decimal(18,2) × 100) so every
  * comparison, the histogram key, and the final sum are exact — the
  * interpolated median is derived from exact middle-rank cents at
  * the very end.
  */
object ExactQuantile {

  /** (n, sum of the middle-rank values in cents, 1 or 2 middles). */
  def medianCents(df: DataFrame, cents: Column,
                  bucketCents: Long = 100000L): (Long, Long, Int) = {
    val vals = df.select(cents.as("v"))
    val hist = vals.groupBy((col("v") / bucketCents).cast("long").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.map(_._2).sum
    require(n > 0, "median of an empty relation")
    val ranks = Seq((n + 1) / 2, (n + 2) / 2).distinct
    val midSum = ranks.map { k =>
      // walk the (driver-sized) histogram to the bucket holding rank k
      var cum = 0L
      var i = 0
      while (i < hist.length && cum + hist(i)._2 < k) { cum += hist(i)._2; i += 1 }
      require(i < hist.length, s"rank $k beyond histogram mass $n")
      val bucket = hist(i)._1
      val localK = (k - cum).toInt
      // k-th smallest inside the bucket = MAX over the ascending
      // TakeOrdered of size localK (duplicate values cannot change
      // the k-th order statistic)
      vals.filter((col("v") / bucketCents).cast("long") === bucket)
        .orderBy(col("v").asc).limit(localK)
        .agg(max(col("v"))).head.getLong(0)
    }.sum
    (n, midSum, ranks.size)
  }
}
