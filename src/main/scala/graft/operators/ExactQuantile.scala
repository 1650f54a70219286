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
        .agg(max(col("v"))).head().getLong(0)
    }.sum
    (n, midSum, ranks.size)
  }

  /** WEIGHTED median with the same funnel: each row occupies `weight`
    * rank slots, and the (lower) weighted median is the smallest
    * value whose cumulative weight reaches k = (W+1)/2. Pass 1
    * histograms SUM(weight) per bucket (bounded, driver-walked);
    * pass 2 scans ONLY the located bucket with a running weight sum
    * and takes MIN(v) at the crossing — deterministic even under
    * value ties, because the crossing can only land inside a tie
    * group whose v is unique. The within-bucket window is
    * unpartitioned but runs over one pruned bucket, not the corpus
    * (same boundedness as medianCents' TakeOrdered). Rows with
    * non-positive weight are excluded (they occupy no rank slots).
    * Returns (totalWeight, k, medianCents). */
  def weightedMedianCents(df: DataFrame, cents: Column, weight: Column,
                          bucketCents: Long = 100000L): (Long, Long, Long) = {
    val vals = df.select(cents.as("v"), weight.cast("long").as("w"))
      .filter(col("w") > 0)
    val hist = vals.groupBy((col("v") / bucketCents).cast("long").as("b"))
      .agg(sum(col("w")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = hist.map(_._2).sum
    require(total > 0, "weighted median of an empty or zero-weight relation")
    val k = (total + 1) / 2
    var cum = 0L
    var i = 0
    while (i < hist.length && cum + hist(i)._2 < k) { cum += hist(i)._2; i += 1 }
    val bucket = hist(i)._1
    val localK = k - cum
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val med = vals.filter((col("v") / bucketCents).cast("long") === bucket)
      .withColumn("cw", sum(col("w")).over(w))
      .filter(col("cw") >= localK)
      .agg(min(col("v"))).head().getLong(0)
    (total, k, med)
  }

  /** Per-GROUP nearest-rank quantiles with the same funnel: pass 1 is
    * one (group, bucket) histogram scan (bounded: |groups|·|buckets|
    * rows to the driver); the driver walks each group's cumulative
    * sum to (bucket, offset-within-bucket) per requested percentile;
    * pass 2 is ONE scan pruned to the located (group, bucket) pairs
    * by a broadcast join, ranked only WITHIN each (group, bucket,
    * pct) partition — offsets are bucket-relative, so different
    * percentiles landing in different (or the same) buckets of one
    * group never disturb each other. Nearest-rank definition
    * (k = max(1, ⌈p·n⌉)): the emitted value is an actual data value,
    * exact in cents. Nulls are excluded (they have no rank). */
  def groupedQuantiles(df: DataFrame, groupCol: String, cents: Column,
                       ps: Seq[(String, Double)],
                       bucketCents: Long = 100000L): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val vals = df.select(col(groupCol).as("g"), cents.as("v"))
      .filter(col("v").isNotNull)
    val hist = vals
      .groupBy(col("g"), (col("v") / bucketCents).cast("long").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(r => (r._2, r._3)).sortBy(_._1)
      }
    val lookup = hist.toSeq.flatMap { case (g, buckets) =>
      val n = buckets.map(_._2).sum
      ps.map { case (pct, p) =>
        val k = math.max(1L, math.ceil(p * n).toLong)
        var cum = 0L
        var i = 0
        while (i < buckets.length && cum + buckets(i)._2 < k) {
          cum += buckets(i)._2; i += 1
        }
        (g, buckets(i)._1, pct, (k - cum).toInt, n)
      }
    }.toDF("g", "b", "pct", "local_k", "n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g", "b", "pct").orderBy(col("v").asc)
    vals.withColumn("b", (col("v") / bucketCents).cast("long"))
      .join(broadcast(lookup), Seq("g", "b"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === col("local_k"))
      .select(col("g").as(groupCol), col("pct"), col("n"),
        col("v").as("value_cents"))
      .orderBy(groupCol, "pct")
  }
}
