package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative k-core peeling (Seidman, "Network structure and minimum
  * degree", Social Networks 1983; the distributed peel is the
  * standard Pregel-style formulation): repeatedly drop nodes of
  * degree < k and their incident edges. The fixpoint is the k-core —
  * the maximal subgraph where every node keeps ≥ k neighbors — the
  * density diagnostic that separates clique-like duplicate families
  * from chains/trees (which a 2-core strips entirely).
  *
  * Each round is two keyed shuffles (degree count + two left-semi
  * edge filters) over the CURRENT edge set, which only shrinks; no
  * driver-side data beyond the loop counter. Rounds are a FIXED
  * constant so the computation is replayable as unrolled SQL levels
  * by the oracle — callers pick `rounds` ≥ the peel depth of their
  * graph (a chain of length L needs ~L/2 rounds; KCoreSpec asserts
  * the fixpoint is reached on the fixture corpus, so a data change
  * that outruns the constant fails a spec, not silently).
  */
object KCore {

  /** Peel `rounds` times toward the k-core of an undirected edge set
    * (columns a, b; each edge stored once). Returns the surviving
    * edge set.
    *
    * Each round CUTS LINEAGE (checkpoint if a checkpoint dir is set,
    * localCheckpoint otherwise — the Dedup.connectedComponents
    * doctrine), not merely caches: a round reads its parent ~5 times
    * (degree union twice, keep derivation, two semi-joins), so a
    * cache-only loop builds a logical plan whose TREE grows ~5× per
    * round — by round 12 even rendering the plan description for the
    * SQL listener is a multi-minute, multi-GB `generateTreeString`
    * (measured: the first cache-only version of this loop wedged the
    * suite there). Checkpointing makes every round's plan O(1). */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    import Lineage.cut
    var cur = cut(edges)
    var r = 0
    while (r < rounds) {
      val deg = cur.select(col("a").as("n"))
        .unionAll(cur.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("n")
      cur = cut(cur
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select("a", "b"))
      r += 1
    }
    cur
  }

  /** `peel` with early exit at the no-peel fixpoint: stops after the
    * first round that removes no edge. Peeling is monotone (the edge
    * set only shrinks), so an unchanged edge COUNT is exactly the
    * fixpoint — and the count is read off the just-checkpointed round
    * result, so the check adds no extra pass over the data. Output is
    * identical to `peel(edges, k, exitRound)` by construction (same
    * loop body), spec'd in KCoreSpec; the extra no-op round that
    * detects the fixpoint leaves the edge set untouched, so output
    * also equals `peel` at ANY round count ≥ the peel depth — callers
    * no longer size `rounds` to their graph. Oracle query q203 keeps
    * fixed rounds (unrolled SQL levels need a constant). Returns
    * (surviving edges, rounds actually run). */
  def peelConverged(edges: DataFrame, k: Int, maxRounds: Int): (DataFrame, Int) = {
    import Lineage.cut
    require(maxRounds >= 1, s"maxRounds must be >= 1 (got $maxRounds)")
    var cur = cut(edges)
    var prevCount = cur.count()
    var r = 0
    var converged = false
    while (r < maxRounds && !converged) {
      val deg = cur.select(col("a").as("n"))
        .unionAll(cur.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("n")
      cur = cut(cur
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select("a", "b"))
      r += 1
      val c = cur.count()
      converged = c == prevCount
      prevCount = c
    }
    (cur, r)
  }

  /** Node degrees of an undirected edge set. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
}
