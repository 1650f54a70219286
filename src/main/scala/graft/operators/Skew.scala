package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY.md §7.4 #6, BASELINE scale
  * notes). Joins lean on AQE's runtime skew-join splitting; for
  * aggregations over pathologically hot keys this provides the
  * classic two-phase salted form.
  */
object Skew {

  /** Two-phase salted aggregation: partial sums/counts on
    * (key, salt) — spreading a hot key over `salts` reducers — then
    * final combine on the key. The salt mixes row content with the
    * input partition id — so identical duplicate rows still spread —
    * which makes salt ASSIGNMENT partition-layout dependent; the
    * aggregated RESULT is identical regardless (the final combine
    * collapses all salts), so only the result is part of the
    * contract.
    *
    * Equivalent to groupBy(key).agg(sum, count) for any input; worth
    * the second (tiny) shuffle only when one key dominates.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    // content hash + partition id: identical duplicate rows (or a
    // low-cardinality value set) still spread across reducers instead
    // of collapsing into one salt bucket; the salt never affects the
    // final result, so partition-dependence is harmless here
    val saltExpr = pmod(
      xxhash64(df.columns.map(col): _*) + spark_partition_id().cast("long"), lit(salts))
    df.withColumn("_salt", saltExpr)
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("row_count"))
  }
}
