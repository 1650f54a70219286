package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (Array[Float], 64-d).
  * The oracle-checked path quantizes to integer milli-units so dot
  * products are exact in both engines (see operators.Similarity).
  */
object SimilarityOps {

  type Q = (SparkSession, String) => DataFrame

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        Similarity.quantize(col("embedding")).as("query_vec"))

  private def querySet(c: DataFrame): DataFrame =
    c.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("query_vec").as("qvec"))

  /** Brute-force cosine top-5 per query (every 10th vector queries
    * the whole corpus) — the exact baseline for ANN recall. */
  def q49CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val c = quantized(s, dir)
    Similarity.bruteForceTopK(c, querySet(c), k = 5)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("cosine"), col("label"))
      .orderBy("query_id", "rank")
  }

  /** SRP-LSH bucketed ANN top-5 with the same query set, plus no
    * oracle (hash-seeded hyperplanes) — recall is measured against
    * q49 in the AnnRecallSpec test. */
  def q50AnnTopK(s: SparkSession, dir: String): DataFrame = {
    val c = quantized(s, dir)
    val ps = Similarity.planes(32, 64)
    Similarity.annTopK(c, querySet(c), k = 5, ps, bands = 8, bitsPerBand = 4)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Per-label embedding statistics on exact integer norms. */
  def q51EmbeddingStats(s: SparkSession, dir: String): DataFrame =
    quantized(s, dir)
      .withColumn("norm2", Similarity.dotQ(col("query_vec"), col("query_vec")))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("vec_count"),
        sum(col("norm2")).as("sum_norm2"),
        min(col("norm2")).as("min_norm2"),
        max(col("norm2")).as("max_norm2"),
        (sum(col("norm2")).cast("double") / count(lit(1))).cast("double").as("avg_norm2"))
      .orderBy("label")

  /** Embedding near-duplicate pairs among consecutive vec_ids —
    * the exact-cosine verify kernel, oracle-checked; LSH candidate
    * generation for the full corpus is q50's machinery. */
  def q52EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val c = quantized(s, dir)
    val a = c.select(col("vec_id").as("id_a"), col("query_vec").as("va"))
    val b = c.select(col("vec_id").as("id_b"), col("query_vec").as("vb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .withColumn("cosine", Similarity.cosineQ(col("va"), col("vb")))
      .select(col("id_a"), col("id_b"), col("cosine"),
        (col("cosine") >= 0.9).as("is_near_dup"))
      .orderBy("id_a")
  }

  /** IVF-flat ANN with a deterministic md5-picked codebook (16 lists,
    * 4 probes) — the second scale path next to q50's SRP-LSH; the
    * oracle rebuilds the identical index from the same md5 draw. */
  def q75IvfAnn(s: SparkSession, dir: String): DataFrame = {
    val c = quantized(s, dir)
    Similarity.ivfTopK(c, querySet(c), k = 5, numCentroids = 16, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** Multi-probe SRP-LSH ANN: q50's index, but each query also probes
    * the 1-bit-neighbor buckets per band — recall rises with zero
    * extra index memory (see Similarity.annTopK multiProbe). */
  def q80MultiprobeAnn(s: SparkSession, dir: String): DataFrame = {
    val c = quantized(s, dir)
    val ps = Similarity.planes(32, 64)
    Similarity.annTopK(c, querySet(c), k = 5, ps, bands = 8, bitsPerBand = 4,
      multiProbe = 4)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "q49_cosine_topk" -> q49CosineTopK _,
    "q80_multiprobe_ann" -> q80MultiprobeAnn _,
    "q50_ann_topk" -> q50AnnTopK _,
    "q51_embedding_stats" -> q51EmbeddingStats _,
    "q52_embedding_neardup" -> q52EmbeddingNearDup _,
    "q75_ivf_ann" -> q75IvfAnn _,
  )

  private val qv =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS DOUBLE))"

  /** The 32×64 ±1 SRP hyperplane matrix is generated from a fixed
    * seed, so it is a compile-time-known constant — embed it verbatim
    * as a VALUES literal and the oracle replays the exact bucketing:
    * plane p belongs to band p/4 with bit weight 2^(p%4), a key bit
    * is set iff dot(v, plane) > 0 (integer dots — exact as doubles). */
  private val planesValues: String =
    Similarity.planes(32, 64).zipWithIndex
      .map { case (row, p) => s"($p, [${row.mkString(",")}])" }
      .mkString(",\n  ")

  val oracles: Map[String, String] = Map(
    "q50_ann_topk" ->
      s"""WITH planes(p, s) AS (VALUES
         |  $planesValues),
         |e AS (SELECT vec_id, $qv AS v FROM embeddings),
         |sigs AS (
         |  SELECT e.vec_id, pl.p // 4 AS band,
         |    CAST(SUM(CASE WHEN list_dot_product(e.v,
         |        list_transform(pl.s, x -> CAST(x AS DOUBLE))) > 0
         |      THEN 1 << (pl.p % 4) ELSE 0 END) AS BIGINT) AS bkey
         |  FROM e, planes pl GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
         |  FROM sigs c JOIN sigs q ON c.band = q.band AND c.bkey = q.bkey
         |  WHERE q.vec_id % 10 = 0 AND c.vec_id != q.vec_id),
         |scored AS (
         |  SELECT cand.query_id, cand.vec_id,
         |    CAST(list_dot_product(cv.v, qv.v) /
         |      sqrt(list_dot_product(qv.v, qv.v) * list_dot_product(cv.v, cv.v))
         |      AS DOUBLE) AS cosine
         |  FROM cand
         |  JOIN e cv ON cv.vec_id = cand.vec_id
         |  JOIN e qv ON qv.vec_id = cand.query_id)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q49_cosine_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, $qv AS qvec FROM embeddings WHERE vec_id % 10 = 0),
         |c AS (SELECT vec_id, label, $qv AS cvec FROM embeddings),
         |scored AS (
         |  SELECT q.query_id, c.vec_id, c.label,
         |    CAST(list_dot_product(q.qvec, c.cvec) /
         |      sqrt(list_dot_product(q.qvec, q.qvec) * list_dot_product(c.cvec, c.cvec))
         |      AS DOUBLE) AS cosine
         |  FROM q, c WHERE c.vec_id != q.query_id)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id, cosine, label FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q51_embedding_stats" ->
      s"""WITH n AS (
         |  SELECT label, CAST(list_dot_product($qv, $qv) AS BIGINT) AS norm2
         |  FROM embeddings)
         |SELECT label, COUNT(*) AS vec_count,
         |  CAST(SUM(norm2) AS BIGINT) AS sum_norm2,
         |  MIN(norm2) AS min_norm2, MAX(norm2) AS max_norm2,
         |  CAST(CAST(SUM(norm2) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_norm2
         |FROM n GROUP BY label ORDER BY label""".stripMargin,
    "q80_multiprobe_ann" ->
      s"""WITH planes(p, s) AS (VALUES
         |  $planesValues),
         |e AS (SELECT vec_id, $qv AS v FROM embeddings),
         |sigs AS (
         |  SELECT e.vec_id, pl.p // 4 AS band,
         |    CAST(SUM(CASE WHEN list_dot_product(e.v,
         |        list_transform(pl.s, x -> CAST(x AS DOUBLE))) > 0
         |      THEN 1 << (pl.p % 4) ELSE 0 END) AS BIGINT) AS bkey
         |  FROM e, planes pl GROUP BY 1, 2),
         |qsigs AS (
         |  SELECT vec_id, band, CAST(xor(bkey, f.f) AS BIGINT) AS bkey
         |  FROM sigs, (VALUES (0), (1), (2), (4), (8)) f(f)
         |  WHERE vec_id % 10 = 0),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
         |  FROM sigs c JOIN qsigs q ON c.band = q.band AND c.bkey = q.bkey
         |  WHERE c.vec_id != q.vec_id),
         |scored AS (
         |  SELECT cand.query_id, cand.vec_id,
         |    CAST(list_dot_product(cv.v, qv.v) /
         |      sqrt(list_dot_product(qv.v, qv.v) * list_dot_product(cv.v, cv.v))
         |      AS DOUBLE) AS cosine
         |  FROM cand
         |  JOIN e cv ON cv.vec_id = cand.vec_id
         |  JOIN e qv ON qv.vec_id = cand.query_id)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q75_ivf_ann" ->
      s"""WITH e AS (SELECT vec_id, $qv AS v FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cid, v FROM e
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_dot_product(e.v, c.v) /
         |               sqrt(list_dot_product(c.v, c.v)) DESC, c.cid) AS rn
         |    FROM e, cent c) WHERE rn = 1),
         |probe AS (
         |  SELECT query_id, cid FROM (
         |    SELECT q.vec_id AS query_id, c.cid, ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_dot_product(q.v, c.v) /
         |               sqrt(list_dot_product(c.v, c.v)) DESC, c.cid) AS rn
         |    FROM e q, cent c WHERE q.vec_id % 10 = 0) WHERE rn <= 4),
         |cand AS (
         |  SELECT p.query_id, a.vec_id
         |  FROM probe p JOIN assign a ON a.cid = p.cid
         |  WHERE a.vec_id != p.query_id),
         |scored AS (
         |  SELECT cand.query_id, cand.vec_id,
         |    CAST(list_dot_product(cv.v, qv.v) /
         |      sqrt(list_dot_product(qv.v, qv.v) * list_dot_product(cv.v, cv.v))
         |      AS DOUBLE) AS cosine
         |  FROM cand
         |  JOIN e cv ON cv.vec_id = cand.vec_id
         |  JOIN e qv ON qv.vec_id = cand.query_id)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q52_embedding_neardup" ->
      s"""WITH c AS (SELECT vec_id, $qv AS v FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  CAST(list_dot_product(a.v, b.v) /
         |    sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v))
         |    AS DOUBLE) AS cosine,
         |  CAST(list_dot_product(a.v, b.v) /
         |    sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v))
         |    AS DOUBLE) >= 0.9 AS is_near_dup
         |FROM c a JOIN c b ON b.vec_id = a.vec_id + 1
         |ORDER BY id_a""".stripMargin,
  )
}
