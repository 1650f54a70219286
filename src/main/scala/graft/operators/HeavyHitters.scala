package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed frequent-items (heavy hitters) — the two-pass
  * sketch-then-recount funnel that makes "which tokens/domains/URLs
  * appear in more than s·n rows?" feasible over a 100 TB scan.
  *
  * Why not groupBy(item) directly: over a token stream the full
  * groupBy shuffles every distinct key (billions at corpus scale) to
  * compute counts that are then almost all thrown away. Here pass 1
  * runs the bounded-state Misra-Gries aggregate
  * (plans.MisraGriesAgg, ≤ `capacity` pairs per task in the shuffle)
  * whose summary provably contains every item with
  * frequency > n/(capacity+1); pass 2 recounts ONLY those ≤ capacity
  * candidates exactly via a broadcast semi-join, so the second
  * shuffle carries at most `capacity` distinct keys no matter how
  * large the corpus.
  *
  * The result is EXACT and partition-invariant: the sketch's
  * surviving extras vary with merge order, but every true heavy
  * hitter is guaranteed present (Misra-Gries bound), and the exact
  * recount + threshold filter kills any extra — so any valid
  * candidate superset yields the identical final answer.
  *
  * Lossless only when `minSupport > 1/(capacity+1)` (enforced):
  * below that, a true heavy hitter could be decremented out of the
  * sketch and the answer would silently miss rows.
  */
object HeavyHitters {

  /** All items of `itemCol` with frequency ≥ minSupport·n (n = the
    * non-null item count). Output: (item, freq, n), unordered —
    * callers pin their own total order. Lazy: no driver actions; the
    * 1-row sketch and the candidate list are broadcast as computed
    * plan branches.
    */
  def frequentItems(df: DataFrame, itemCol: String, minSupport: Double,
                    capacity: Int = 1024): DataFrame = {
    require(minSupport > 1.0 / (capacity + 1),
      f"lossless guarantee requires minSupport > 1/(capacity+1): " +
        f"got minSupport=$minSupport%.6f, capacity=$capacity " +
        f"(bound ${1.0 / (capacity + 1)}%.6f) — raise capacity or the support")
    require(minSupport <= 1.0, s"minSupport must be a fraction, got $minSupport")
    val src = df.select(col(itemCol).as("item")).filter(col("item").isNotNull)
    // pass 1: one bounded-state aggregate over the stream — the only
    // full scan that aggregates; its shuffle is ≤ capacity pairs/task
    val sketch = src.agg(
      call_function("graft_mg_sketch", col("item"), lit(capacity)).as("sk"),
      count(lit(1)).as("n"))
    val candidates = sketch
      .select(explode(col("sk")).as("c"))
      .select(col("c.item").as("item"))
    // pass 2: exact recount of candidates only — the semi-join prunes
    // at scan speed (broadcast of ≤ capacity strings), and the groupBy
    // shuffles ≤ capacity distinct keys
    src.join(broadcast(candidates), Seq("item"), "leftsemi")
      .groupBy("item")
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(sketch.select(col("n"))))
      .filter(col("freq").cast("double") >= lit(minSupport) * col("n"))
  }

  /** Per-group frequent items: all (group, item) pairs where the item
    * reaches minSupport·n_group WITHIN its group — "top tokens per
    * language". Same two-pass funnel with the sketch keyed by group
    * (bounded state per group per task is exactly why the sketch is
    * an aggregate), candidates semi-joined on (group, item), support
    * measured against the GROUP's stream length. Output: (group,
    * item, freq, n), unordered.
    *
    * The broadcast candidate list is |groups|·capacity rows — fine
    * for enum-like groups (languages, sources); for high-cardinality
    * groups flip the semi-join to a shuffle join (same semantics,
    * one more keyed exchange). */
  def frequentItemsByGroup(df: DataFrame, groupCol: String, itemCol: String,
                           minSupport: Double, capacity: Int = 1024): DataFrame = {
    require(minSupport > 1.0 / (capacity + 1),
      f"lossless guarantee requires minSupport > 1/(capacity+1): " +
        f"got minSupport=$minSupport%.6f, capacity=$capacity")
    require(minSupport <= 1.0, s"minSupport must be a fraction, got $minSupport")
    val src = df.select(col(groupCol).as("group"), col(itemCol).as("item"))
      .filter(col("item").isNotNull && col("group").isNotNull)
    val sketch = src.groupBy("group").agg(
      call_function("graft_mg_sketch", col("item"), lit(capacity)).as("sk"),
      count(lit(1)).as("n"))
    val candidates = sketch
      .select(col("group"), explode(col("sk")).as("c"))
      .select(col("group"), col("c.item").as("item"))
    src.join(broadcast(candidates), Seq("group", "item"), "leftsemi")
      .groupBy("group", "item")
      .agg(count(lit(1)).as("freq"))
      .join(broadcast(sketch.select(col("group"), col("n"))), "group")
      .filter(col("freq").cast("double") >= lit(minSupport) * col("n"))
  }
}
