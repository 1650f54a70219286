package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY.md §7.4 #6, BASELINE scale
  * notes). Joins lean on AQE's runtime skew-join splitting; for
  * pathologically hot keys this provides the classic salted forms
  * for aggregation and equi joins.
  */
object Skew {

  /** Salt assignment shared by both salted forms: content hash mixed
    * with a per-row ordinal, so byte-identical duplicate rows within a
    * partition still take distinct salts (the degenerate hot key made
    * of repeated identical rows spreads instead of re-concentrating). */
  private[operators] def saltCol(df: DataFrame, salts: Int) = pmod(
    xxhash64(df.columns.map(col): _*) + monotonically_increasing_id(), lit(salts))

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
    // the salt never affects the final result (the final combine
    // collapses all salts), so its layout-dependent assignment is
    // harmless here
    df.withColumn("_salt", saltCol(df, salts))
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("row_count"))
  }

  /** Salted equi join for a pathologically hot probe key: the probe
    * side scatters each row across `salts` sub-keys, the (small)
    * build side replicates every row to ALL salts, and the join runs
    * on (key, salt) — so the hot key's rows land on `salts` reducers
    * instead of one. Row multiplicity is exactly that of the plain
    * join (each probe row meets each matching build row exactly once,
    * on its own salt replica), for inner and left joins alike.
    *
    * When AQE's skew split suffices, prefer it (zero code); this is
    * the remedy when the build side must NOT broadcast (too big) and
    * one key still dominates — e.g. the UNKNOWN customer in a
    * fact ⟕ enrichment join. Build-side cost: ×salts replication,
    * which is the explicit price of the balance. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full joins would emit every unmatched build row once PER
    // SALT REPLICA — reject them instead of silently duplicating
    require(Set("inner", "left", "leftouter", "left_outer")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only (got $joinType): " +
        "unmatched build rows would duplicate once per salt replica")
    val salted = probe.withColumn("_salt", saltCol(probe, salts).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
