package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007, "Near linear
  * time algorithm to detect community structures") made DETERMINISTIC:
  * every node starts as its own label; each round EVERY node
  * simultaneously adopts the most frequent label among its neighbors'
  * previous-round labels, ties broken by smallest label. The classic
  * algorithm's randomness (async order, random tie-break) is exactly
  * what makes it irreproducible; fixing both (synchronous rounds,
  * min-label ties) gives a trajectory any SQL engine replays
  * bit-identically — the q205/q203 discipline applied to communities.
  * Complements the graph family: CC finds connectivity, k-core finds
  * density, LPA finds COMMUNITY structure (a bridge edge joins two
  * components into one CC but LPA keeps the sides' majorities apart).
  *
  * Scale: each round is one keyed shuffle (neighbor-label join on the
  * symmetrized edge list), one (node, label) count aggregate, and one
  * node-keyed window for the argmax — no global operation anywhere,
  * and the edge table is re-read from its checkpointed round-0 form
  * (Lineage.cut per round, so the plan stays O(1) per round). Label
  * skew (a giant community) concentrates on the COUNT aggregate's
  * (node, label) key, which includes the node — bounded by degree,
  * not community size.
  */
object LabelProp {

  /** `rounds` synchronous LPA rounds over undirected edges (a, b).
    * Returns (n, lbl) for every node incident to an edge. Fixed round
    * count keeps DuckDB-oracle parity (unrolled levels); pass
    * `earlyStop = true` to exit when a round is a fixpoint (identical
    * labels), which cannot change the result — only skip no-op work
    * (the q203/Hits convergence discipline). */
  def run(edges: DataFrame, rounds: Int, earlyStop: Boolean = false): DataFrame = {
    import Lineage.cut
    require(rounds >= 0, s"rounds must be >= 0 (got $rounds)")
    val sym = cut(edges
      .select(col("a").cast("long").as("n"), col("b").cast("long").as("m"))
      .unionAll(edges
        .select(col("b").cast("long").as("n"), col("a").cast("long").as("m")))
      .distinct())
    var labels = cut(sym.select(col("n")).distinct()
      .withColumn("lbl", col("n")))
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val prev = labels
      val w = Window.partitionBy("n").orderBy(col("c").desc, col("lbl"))
      val next = cut(sym
        .join(prev.select(col("n").as("m"), col("lbl")), "m")
        .groupBy("n", "lbl").agg(count(lit(1)).as("c"))
        .withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1)
        .select("n", "lbl"))
      if (earlyStop) {
        // fixpoint test: one anti-join count (node-keyed), cheap
        // relative to the round it saves
        converged = next.join(prev, Seq("n", "lbl"), "left_anti").isEmpty
      }
      labels = next
      r += 1
    }
    labels
  }
}
