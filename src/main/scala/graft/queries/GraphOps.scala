package graft.queries

import graft.Tables
import graft.operators.{Dedup, Triangles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over pipeline-derived graphs. The reference ships
  * no graph operators; these extend its dedup/curation family with the
  * standard distributed-graph diagnostics (connected components live
  * in [[graft.operators.Dedup]]; triangle counting here).
  */
object GraphOps {

  /** fanOut (r12): per-doc text kernels (tokenize, n-gram HOFs,
    * hashes) run map-side over a single-split documents scan — one
    * task at any core count; fan out, identity at production scale
    * (Tables.fanOut). */
  private def fannedDocs(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.Tables.fanOut(graft.Tables.documents(s, dir), s, dir, "documents",
      rowsPerTask = 250L)


  type Q = (SparkSession, String) => DataFrame

  /** Triangle census of the VERIFIED near-dup graph (q77's edge set:
    * MinHash-LSH candidates, Jaccard ≥ 0.2) — the graph-shape
    * diagnostic a dedup pipeline runs on its own candidate graph.
    * Triangles measure how clique-like duplicate clusters are: a
    * chain-shaped cluster (A~B~C but A≁C) is usually a drifting
    * template, while a triangle-dense cluster is a true copy family —
    * the ratio `triangles / max_wedges` (exact integers here; the
    * division is left to the reader) is the local clustering
    * coefficient.
    *
    * Scale: the edge set is sparse by LSH construction; the census
    * itself is [[Triangles.census]] — degree-ordered orientation, so
    * the wedge join is bounded E^{3/2} with no skewed reducer, and
    * every step is a keyed join/agg (see the operator's scaladoc).
    */
  def q147TriangleCensus(s: SparkSession, dir: String): DataFrame = {
    val d = fannedDocs(s, dir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", k = 16, shingleN = 3)
    val cand = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 4)
    val edges = Dedup.verifyJaccard(cand, d, "doc_id", "text", shingleN = 3)
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    Triangles.census(edges)
      .select(col("node").as("doc_id"), col("degree"), col("triangles"),
        (col("degree") * (col("degree") - 1) / 2).cast("bigint").as("max_wedges"))
      .orderBy("doc_id")
  }

  /** 2-core of the verified near-dup graph (operators.KCore, 12 peel
    * rounds): strips chain/tree-shaped candidate clusters — usually
    * drifting templates — leaving only cycle-containing copy
    * families, the complement diagnostic to q147's triangle census
    * on the same edge set. Every round is keyed shuffles over a
    * shrinking edge set; the round count is a fixed constant so the
    * DuckDB oracle replays the identical peel as 12 unrolled CTE
    * levels, and KCoreSpec pins that the fixture graph reaches its
    * fixpoint within them. */
  def q203KCore(s: SparkSession, dir: String): DataFrame = {
    val d = fannedDocs(s, dir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", k = 16, shingleN = 3)
    val cand = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 4)
    val edges = Dedup.verifyJaccard(cand, d, "doc_id", "text", shingleN = 3)
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val initial = graft.operators.KCore.degrees(edges)
    // peelConverged (r12): stops at the no-peel fixpoint instead of
    // always paying 12 rounds — output is identical at any round
    // count ≥ the peel depth (KCoreSpec pins it; the oracle's 12
    // unrolled levels are equally fixpoint-stable), and each skipped
    // round saves a degree aggregate + two semi-joins + a checkpoint
    // over the edge set at any scale
    val core = graft.operators.KCore.peelConverged(edges, k = 2,
      maxRounds = 12)._1
    val coreDeg = graft.operators.KCore.degrees(core)
      .withColumnRenamed("deg", "core_deg")
    initial.join(coreDeg, Seq("n"), "left")
      .select(col("n").as("doc_id"), col("deg").as("initial_degree"),
        coalesce(col("core_deg"), lit(0L)).as("core_degree"),
        col("core_deg").isNotNull.as("in_2core"))
      .orderBy("doc_id")
  }

  /** HITS hubs & authorities (operators.Hits) over the bipartite
    * customer→part purchase graph — the link-analysis complement to
    * q135's PageRank: which customers are broad buyers (hubs) and
    * which parts sit in many broad baskets (authorities). 8 exact
    * integer fixed-point rounds, replayed bit-identically by the
    * oracle's unrolled CTE levels. */
  def q205Hits(s: SparkSession, dir: String): DataFrame = {
    // fanOut (r12): edge build (broadcast join + distinct partials)
    // is map-side over the single-split lineitem scan
    val edges = Tables.orders(s, dir)
      .join(Tables.fanOut(Tables.lineitem(s, dir), s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("hub"), col("l_partkey").as("auth"))
    // NOTE (r12, measured rejection): Hits.runConverged was tried here
    // (the q203 peelConverged win) and measured 5.9 → 9.7 s — this
    // graph's integer scores do NOT reach the fixpoint within 8
    // rounds, so the per-round convergence check (two node-sized
    // full-outer joins) is pure overhead. Fixed rounds stay.
    val (hubs, auths) = graft.operators.Hits.run(edges, rounds = 8)
    auths.select(lit("authority").as("role"), col("id"), col("score"))
      .unionAll(hubs.select(lit("hub").as("role"), col("id"), col("score")))
      .orderBy("role", "id")
  }

  /** Deterministic synchronous label-propagation communities
    * (operators.LabelProp, 4 rounds) over the verified near-dup
    * graph — the community complement to connectivity (q77 CC),
    * density (q203 k-core), and centrality (q135/q205): a bridge
    * edge merges two clusters into one COMPONENT, but LPA keeps the
    * sides' majority labels apart, which is the right granularity
    * for "template family" analysis of near-dup corpora. Fixed
    * rounds so the DuckDB oracle unrolls the identical trajectory;
    * LabelPropSpec pins that earlyStop returns the same labels. */
  def q213LabelProp(s: SparkSession, dir: String): DataFrame = {
    val d = fannedDocs(s, dir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", k = 16, shingleN = 3)
    val cand = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 4)
    val edges = Dedup.verifyJaccard(cand, d, "doc_id", "text", shingleN = 3)
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val labels = graft.operators.LabelProp.run(edges, rounds = 4)
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, "lbl")
      .select(col("n").as("doc_id"), col("lbl").as("community"),
        col("community_size"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q147_triangle_census" -> q147TriangleCensus _,
    "q203_kcore" -> q203KCore _,
    "q205_hits" -> q205Hits _,
    "q213_label_prop" -> q213LabelProp _,
  )

  /** q205 oracle: 8 HITS rounds unrolled; `//` is DuckDB's
    * truncating integer division = Spark's DIV on positive longs. */
  private val hitsLevels: String = (1 to 8).map { r =>
    val prevH = if (r == 1) "h0" else s"h${r - 1}"
    s"""a${r}r AS MATERIALIZED (
       |  SELECT auth AS id, SUM(score) AS raw
       |  FROM e JOIN $prevH ON e.hub = $prevH.id GROUP BY 1),
       |a$r AS MATERIALIZED (
       |  SELECT id, raw * 1000000 // (SELECT MAX(raw) FROM a${r}r) AS score
       |  FROM a${r}r),
       |h${r}r AS MATERIALIZED (
       |  SELECT hub AS id, SUM(score) AS raw
       |  FROM e JOIN a$r ON e.auth = a$r.id GROUP BY 1),
       |h$r AS MATERIALIZED (
       |  SELECT id, raw * 1000000 // (SELECT MAX(raw) FROM h${r}r) AS score
       |  FROM h${r}r)""".stripMargin
  }.mkString(",\n")

  /** q203 oracle: 12 peel levels unrolled (e0 = the verified edge
    * set; each level recounts degrees and keeps both-endpoint-
    * surviving edges). */
  private val kcoreLevels: String = (1 to 12).map { r =>
    s"""d$r AS MATERIALIZED (
       |  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT a AS n FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
       |  GROUP BY 1),
       |e$r AS MATERIALIZED (
       |  SELECT a, b FROM e${r - 1}
       |  WHERE a IN (SELECT n FROM d$r WHERE deg >= 2)
       |    AND b IN (SELECT n FROM d$r WHERE deg >= 2))""".stripMargin
  }.mkString(",\n")

  /** q213 oracle: 4 synchronous LPA levels unrolled — each node's
    * next label is the modal previous-round neighbor label, min-label
    * tie-break (window over the grouped count, the engine-portable
    * argmax). */
  private val lpaLevels: String = (1 to 4).map { r =>
    s"""l$r AS MATERIALIZED (
       |  SELECT n, lbl FROM (
       |    SELECT s.n, p.lbl, COUNT(*) AS c,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY s.n ORDER BY COUNT(*) DESC, p.lbl) AS rk
       |    FROM sym s JOIN l${r - 1} p ON p.n = s.m
       |    GROUP BY s.n, p.lbl)
       |  WHERE rk = 1)""".stripMargin
  }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "q213_label_prop" ->
      s"""WITH ${DedupOps.tokHashCte},
         |${DedupOps.shinglesCte},
         |${DedupOps.sigBandedCtes},
         |${DedupOps.cpairsCte},
         |${DedupOps.verifiedCte},
         |sym AS MATERIALIZED (
         |  SELECT id_a AS n, id_b AS m FROM verified
         |  UNION
         |  SELECT id_b AS n, id_a AS m FROM verified),
         |l0 AS MATERIALIZED (SELECT DISTINCT n, n AS lbl FROM sym),
         |$lpaLevels,
         |sizes AS (
         |  SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
         |  FROM l4 GROUP BY 1)
         |SELECT l4.n AS doc_id, l4.lbl AS community, sizes.community_size
         |FROM l4 JOIN sizes USING (lbl)
         |ORDER BY doc_id""".stripMargin,
    "q205_hits" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS hub, l_partkey AS auth
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |h0 AS MATERIALIZED (
         |  SELECT DISTINCT hub AS id, CAST(1000000 AS BIGINT) AS score FROM e),
         |$hitsLevels
         |SELECT 'authority' AS role, id, CAST(score AS BIGINT) AS score FROM a8
         |UNION ALL
         |SELECT 'hub' AS role, id, CAST(score AS BIGINT) AS score FROM h8
         |ORDER BY role, id""".stripMargin,
    "q203_kcore" ->
      s"""WITH ${DedupOps.tokHashCte},
         |${DedupOps.shinglesCte},
         |${DedupOps.sigBandedCtes},
         |${DedupOps.cpairsCte},
         |${DedupOps.verifiedCte},
         |e0 AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM verified),
         |d0 AS MATERIALIZED (
         |  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
         |$kcoreLevels,
         |fin AS (
         |  SELECT n, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
         |    SELECT a AS n FROM e12 UNION ALL SELECT b FROM e12) GROUP BY 1)
         |SELECT d0.n AS doc_id, d0.deg AS initial_degree,
         |  COALESCE(fin.core_deg, 0) AS core_degree,
         |  fin.core_deg IS NOT NULL AS in_2core
         |FROM d0 LEFT JOIN fin USING (n)
         |ORDER BY doc_id""".stripMargin,
    "q147_triangle_census" ->
      s"""WITH ${DedupOps.tokHashCte},
         |${DedupOps.shinglesCte},
         |${DedupOps.sigBandedCtes},
         |${DedupOps.cpairsCte},
         |${DedupOps.verifiedCte},
         |deg AS (
         |  SELECT node, COUNT(*) AS deg FROM (
         |    SELECT id_a AS node FROM verified
         |    UNION ALL SELECT id_b FROM verified) GROUP BY 1),
         |tri AS (
         |  SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
         |  FROM verified e1
         |  JOIN verified e2 ON e2.id_a = e1.id_b
         |  JOIN verified e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
         |pn AS (
         |  SELECT node, COUNT(*) AS tri FROM (
         |    SELECT a AS node FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri) GROUP BY 1)
         |SELECT deg.node AS doc_id, CAST(deg.deg AS BIGINT) AS degree,
         |  CAST(COALESCE(pn.tri, 0) AS BIGINT) AS triangles,
         |  CAST(deg.deg * (deg.deg - 1) // 2 AS BIGINT) AS max_wedges
         |FROM deg LEFT JOIN pn ON pn.node = deg.node
         |ORDER BY doc_id""".stripMargin,
  )
}
