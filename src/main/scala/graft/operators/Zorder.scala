package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** True Z-order (Morton) clustering — multi-column data layout for
  * file skipping, the plain-Parquet analog of Iceberg's
  * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)')`
  * (reference processing/bronze/bronze_compaction.py:141-151).
  *
  * Each clustering column is min/max-normalized to a `bits`-wide
  * unsigned int (one tiny agg job for the ranges), and the bit
  * planes are interleaved into a single long. Range-partitioning +
  * sorting on that z-value gives every file a tight min/max envelope
  * in EVERY clustering dimension, so a predicate on any subset of
  * the columns skips files — linear (lexicographic) clustering only
  * skips on the leading column.
  *
  * The z-value is a pure bitwise column expression (shift/and/or),
  * fully whole-stage-codegen'd: the layout pass stays scan-speed and
  * the shuffle is the one repartitionByRange any clustering needs.
  */
object Zorder {

  /** Interleave the low `bits` bits of the given (already
    * normalized, non-negative) long columns: result bit b*k+i takes
    * bit b of column i. k*bits must stay below 63. */
  def zvalue(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1 && k * bits < 63, s"$k cols x $bits bits exceeds a long")
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min/max-normalize a column to [0, 2^bits): orderable types are
    * cast through double (exact for the int/date/timestamp-seconds
    * ranges clustering keys take). A constant column maps to 0. */
  private def normalize(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = mx - mn
    if (span <= 0) lit(0L)
    else floor((c.cast("double") - mn) / span * ((1L << bits) - 1)).cast("long")
  }

  /** Order-preserving ordinal for a string column: the two characters
    * after `lcp` (the longest common prefix of the column's min and
    * max, where all the discriminating entropy starts — fixed-prefix
    * ids like TWR007 and ISO timestamps both have constant heads).
    * Monotonic in the string order over ASCII data, so the ordinal's
    * min/max are just the mapped min/max strings — no second pass. */
  private def stringOrdinal(c: Column, lcp: Int): Column =
    coalesce(ascii(substring(c, lcp + 1, 1)) * 128 +
      ascii(substring(c, lcp + 2, 1)), lit(0)).cast("long")

  private def stringOrdinal(s: String, lcp: Int): Long = {
    val a = if (s.length > lcp) s.charAt(lcp).toLong else 0L
    val b = if (s.length > lcp + 1) s.charAt(lcp + 1).toLong else 0L
    a * 128 + b
  }

  /** Cluster `df` into `numPartitions` z-ordered ranges on `cols`.
    * One stats job (global min/max per column — strings included:
    * their ordinal mapping is monotonic, so string min/max map to
    * ordinal min/max), then a single range shuffle + in-partition
    * sort on the interleaved key. */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Int,
              bits: Int = 16): DataFrame = {
    val isStr = cols.map(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val aggs = cols.zip(isStr).flatMap { case (c, str) =>
      if (str) Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c"))
      else Seq(min(col(c).cast("double")).as(s"_mn_$c"),
        max(col(c).cast("double")).as(s"_mx_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val normalized = cols.zipWithIndex.map { case (c, i) =>
      if (isStr(i)) {
        val (mn, mx) = (stats.getString(2 * i), stats.getString(2 * i + 1))
        val lcp = (mn, mx) match {
          case (null, _) | (_, null) => 0
          case _ => mn.zip(mx).takeWhile { case (a, b) => a == b }.length
        }
        normalize(stringOrdinal(col(c), lcp),
          if (mn == null) 0 else stringOrdinal(mn, lcp).toDouble,
          if (mx == null) 0 else stringOrdinal(mx, lcp).toDouble, bits)
      } else
        normalize(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    df.withColumn("_z", zvalue(normalized, bits))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
