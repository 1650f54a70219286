package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 dimension machinery (SURVEY.md J7; reference
  * dim_customers.sql:11-15 documents the range-join contract, though
  * its implementation only ever emits single current versions —
  * Gold.dimCustomers reproduces that exactly; THIS operator is the
  * full-history generalization).
  *
  * Scale design: `lookupJoin` deliberately rewrites the range join as
  * an EQUI-join on the business key plus a post-join range filter —
  * Catalyst plans a hash join (shuffle or broadcast), never the
  * broadcast-nested-loop a pure theta join would get (SURVEY.md §4).
  * Version fan-out is bounded by versions-per-key, so the filter
  * discards at most (versions-1)/versions of the joined rows.
  */
object Scd2 {

  /** Build effective ranges from a change history: one row per
    * (key, change) with [effective_start, effective_end) half-open
    * ranges (end NULL = current version). */
  def fromHistory(history: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc)
    history
      .withColumn("effective_start", col(tsCol))
      .withColumn("effective_end", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_end").isNull)
      .withColumn("version_seq", row_number().over(w))
  }

  /** As-of lookup of facts against an SCD2 dim: ONE left join whose
    * condition is the key equality plus the [start, end) range cover.
    * The range lives in the JOIN condition (not a post-filter), so
    * unmatched facts survive with null dim columns — correct LEFT
    * as-of semantics — while the equi component still drives a hash
    * join (the range conjuncts become join filters). */
  def lookupJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 factTs: Column, joinType: String = "left"): DataFrame = {
    val d2 = dim.withColumnRenamed(keyCol, "_scd2_key")
    fact.join(d2,
        fact(keyCol) === d2("_scd2_key") &&
          factTs >= d2("effective_start") &&
          (d2("effective_end").isNull || factTs < d2("effective_end")),
        joinType)
      .drop("_scd2_key")
  }
}
