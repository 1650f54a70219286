package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bit planes (Morton order)") {
    // 2 bits, 2 cols: z(x=0b10, y=0b01) = y1 x1 y0 x0 = 0 1 1 0... bit
    // layout: result bit b*k+i takes bit b of col i (x is col 0).
    val got = Seq((2L, 1L)).toDF("x", "y")
      .select(Zorder.zvalue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head.getLong(0)
    // x bits: b0=0 -> z bit0, b1=1 -> z bit2; y bits: b0=1 -> z bit1, b1=0 -> z bit3
    assert(got === 6L) // 0b0110
  }

  /** Per-partition [min,max] envelopes of `c`, as a count of
    * partitions whose envelope overlaps [lo, hi] — the row-group
    * pruning model: a reader must open exactly these partitions. */
  private def overlapping(df: DataFrame, c: String, lo: Int, hi: Int): Long =
    df.withColumn("_pid", spark_partition_id())
      .groupBy("_pid").agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      .filter(col("mx") >= lo && col("mn") <= hi)
      .count()

  test("z-order prunes on BOTH dimensions; linear only on the leading one") {
    val grid = spark.range(100 * 100).select(
      (col("id") / 100).cast("int").as("x"),
      (col("id") % 100).cast("int").as("y"))
    val nParts = 16
    val zed = Zorder.cluster(grid, Seq("x", "y"), nParts)
    val linear = grid.repartitionByRange(nParts, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
    // narrow predicate on the SECOND dimension
    val zHits = overlapping(zed, "y", 40, 45)
    val linHits = overlapping(linear, "y", 40, 45)
    assert(zHits < linHits,
      s"z-order should prune y-predicates: z=$zHits linear=$linHits of $nParts")
    assert(linHits === nParts.toLong) // linear layout cannot prune on y at all
    // and the leading dimension still prunes under z-order
    assert(overlapping(zed, "x", 40, 45) < nParts)
  }

  test("string dimensions cluster via post-common-prefix ordinals") {
    val rows = for { t <- 0 until 10; i <- 0 until 200 } yield
      (f"TWR$t%03d", s"2024-01-0${1 + t % 3}T0$i", i)
    val df = rows.toDF("tower_id", "ts", "v")
    val zed = Zorder.cluster(df, Seq("tower_id", "ts"), 8)
    assert(zed.count() === 2000)
    // a single tower's rows must NOT span every partition
    val towerParts = zed.withColumn("_pid", spark_partition_id())
      .filter(col("tower_id") === "TWR007")
      .select("_pid").distinct().count()
    assert(towerParts < 8, s"TWR007 spread over all $towerParts partitions")
  }
}
