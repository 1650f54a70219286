package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the SCD2/temporal-lookup
  * pattern (SURVEY.md J7; reference dim_customers.sql:11-15 contract).
  *
  * Spark has no ASOF JOIN operator; the naive formulation
  * `left.join(right, key === key && lts >= rts)` + keep-max collapses
  * to a broadcast-nested-loop or an exploding range join. This
  * implementation uses the union+window form instead:
  *
  *   1. tag right rows, union with left rows (schema-aligned),
  *   2. one shuffle partitioned by key, sorted by (ts, rightFirst),
  *   3. running `last(_, ignoreNulls)` carries the latest right
  *      values forward onto each left row.
  *
  * Cost: ONE shuffle of (|L|+|R|) rows + a per-partition sort —
  * the same as a sort-merge join, with no row explosion. At 100 TB
  * the key-partitioned sort is exactly what AQE would want; skewed
  * keys can be salted upstream because the window only needs
  * per-key ordering.
  *
  * Ties (left.ts == right.ts) match the right row, i.e. `>=`
  * inclusive semantics, same as DuckDB's ASOF JOIN.
  */
object AsofJoin {

  /** @param valueCols right-side columns carried onto left rows
    *                  (null when no right row is at-or-before).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged = "_asof_is_right"
    // All value columns travel in ONE struct so the carried values are
    // row-atomic: last(_, ignoreNulls) picks the latest right ROW, and
    // a null value INSIDE that row stays null (carrying each column
    // independently would mix columns from different right rows when
    // the latest row holds nulls).
    val payload = "_asof_payload"

    val l2 = left
      .withColumn(tagged, lit(0))
      .withColumn(payload,
        lit(null).cast(org.apache.spark.sql.types.StructType(
          valueCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))

    val r2Cols =
      leftCols.map { c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(lit(1).as(tagged),
        struct(valueCols.map(col): _*).as(payload))
    val r2 = right.select(r2Cols: _*)

    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col(tagged).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l2.unionByName(r2)
      .withColumn("_asof_hit", last(col(payload), ignoreNulls = true).over(w))
    val expanded = valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"_asof_hit.$c"))
    }
    expanded.filter(col(tagged) === 0)
      .drop(tagged, payload, "_asof_hit")
  }
}
