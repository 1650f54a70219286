package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered edge orientation —
  * the Schank–Wagner "forward" algorithm in its MapReduce form
  * (Suri & Vassilvitskii, WWW'11, "Counting Triangles and the Curse
  * of the Last Reducer"; see PAPERS.md). The reference pipeline ships
  * no graph operators; this extends the engine's dedup-graph family
  * (Dedup.connectedComponents) with the other classic curation-graph
  * diagnostic.
  *
  * Why orientation matters at 100 TB: the naive wedge join groups on
  * each node's FULL neighbor list, so one celebrity node with degree
  * d contributes d² wedge rows — the "last reducer" that never
  * finishes. Orienting every edge from its lower-(degree, id) endpoint
  * to its higher one makes every out-degree O(√E) (no node can have
  * √E out-neighbors of degree ≥ its own unless E is larger), so the
  * wedge join emits at most E^{3/2} rows TOTAL, evenly spread across
  * keys — the skew is removed by construction, not by salting.
  */
object Triangles {

  /** Per-node triangle census over an undirected simple graph.
    *
    * @param edges0 distinct undirected edges, one row per edge with
    *               `aCol` < `bCol` (no self-loops, no duplicates)
    * @return (node, degree, triangles) — every node incident to an
    *         edge, with the count of triangles it participates in
    *
    * Plan shape: one union+agg for degrees (shuffle on node), two
    * broadcast-or-shuffle equi-joins to attach endpoint degrees, the
    * wedge self-join keyed on the low endpoint, and one equi-join
    * probing the oriented edge set to close each wedge. All joins are
    * keyed; nothing is collected to the driver.
    */
  def census(edges0: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    // reused by degrees, orientation, and the closing probe — persist
    // once (Verify/Bench sweep leaked blocks between queries)
    val edges = edges0.select(col(aCol).as("a"), col(bCol).as("b")).persist()
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // (u, v, dv): u is the lower-(deg, id) endpoint; dv rides along so
    // the wedge join can compare ranks without re-joining degrees
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .persist()
    val o1 = oriented
    val o2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    // each wedge once: out-neighbors v ≺ w in (deg, id) rank order
    val wedges = o1.join(o2, Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    // v ≺ w, so the closing edge — if it exists — is oriented v → w
    val o3 = oriented.select(col("u").as("v"), col("v").as("w"))
    val tris = wedges.join(o3, Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"),
        col("deg").cast("bigint").as("degree"),
        coalesce(col("tri"), lit(0L)).cast("bigint").as("triangles"))
  }
}
