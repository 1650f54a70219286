package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Weighted-median funnel: must equal the expand-by-weight brute
  * force (each row repeated `weight` times, plain lower median) at
  * any partition count and bucket width, including crossings that
  * land inside a duplicate-value tie group.
  */
class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long)]): Long = {
    val expanded = rows.filter(_._2 > 0)
      .flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    expanded(((expanded.length + 1) / 2 - 1).toInt)
  }

  test("equals the expand-by-weight median, incl. ties at the crossing") {
    val rows = Seq[(Long, Long)](
      (100L, 3L), (250L, 1L), (250L, 4L), (250L, 2L), (900L, 2L),
      (1200L, 5L), (1200L, 1L), (4000L, 2L), (999999L, 1L))
    val df = rows.toDF("v", "w")
    val (total, k, med) =
      ExactQuantile.weightedMedianCents(df, col("v"), col("w"))
    assert(total === rows.map(_._2).sum)
    assert(k === (total + 1) / 2)
    assert(med === brute(rows))
  }

  test("zero/negative weights occupy no rank slots") {
    val rows = Seq[(Long, Long)]((10L, 0L), (20L, -5L), (30L, 1L), (40L, 2L))
    val (total, _, med) = ExactQuantile.weightedMedianCents(
      rows.toDF("v", "w"), col("v"), col("w"))
    assert(total === 3L)
    assert(med === 40L) // expanded: 30,40,40 → lower median 40
  }

  test("partition- and bucket-width-invariant on md5-derived data") {
    val df = spark.range(500).select(
      (conv(substring(md5(col("id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 700000).as("v"),
      (conv(substring(md5(col("id").cast("string")), 7, 2), 16, 10)
        .cast("long") % 9 + 1).as("w"))
    val rows = df.as[(Long, Long)].collect().toSeq
    val expected = brute(rows)
    for (parts <- Seq(1, 7); width <- Seq(1000L, 100000L, 10000000L)) {
      val d = df.repartition(parts)
      val (_, _, med) =
        ExactQuantile.weightedMedianCents(d, col("v"), col("w"), width)
      assert(med === expected, s"parts=$parts width=$width")
    }
  }
}
