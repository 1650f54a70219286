package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding
  * columns (Array[Float]).
  *
  * Determinism note: float dot products are order/precision fragile
  * across engines, so the oracle-checked path quantizes embeddings to
  * integer milli-units first — integer dots are exact in both Spark
  * and any SQL oracle, and a float value×1000 can never land exactly
  * on .5 (denominator 2000 is not a power of two), so rounding is
  * unambiguous. The quantization error (~1e-3 relative) is far below
  * any ranking-relevant signal at 64 dims.
  *
  * Scale design: brute force is the per-bucket verify kernel; sign
  * random projection LSH buckets candidates so the quadratic term is
  * bounded by bucket size. Queries are broadcast; the corpus side
  * never shuffles for scoring.
  */
object Similarity {

  /** Quantize a float vector to integer milli-units (exact longs). */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity from quantized integer dots (deterministic). */
  def cosineQ(a: Column, b: Column): Column =
    (dotQ(a, b).cast("double") /
      sqrt(dotQ(a, a).cast("double") * dotQ(b, b).cast("double"))).cast("double")

  /** Brute-force cosine top-k: broadcast the (small) query set against
    * the corpus, rank per query with (score desc, id) tie-break.
    * The corpus scan is embarrassingly parallel — no corpus shuffle;
    * only the per-query top-k aggregation shuffles k rows per query.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", cosineQ(col("query_vec"), col("qvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplanes for sign-random-projection LSH,
    * derived from a fixed seed (identical on every executor/run). */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rnd.nextBoolean()) 1 else -1)
  }

  /** Per-band SRP bucket keys: planes are grouped into `bands` bands
    * of `bitsPerBand`; a vector's key in band b packs the sign bits
    * of that band's planes. Two similar vectors agree on all bits of
    * SOME band with good probability (multi-table LSH), and
    * bitsPerBand controls bucket granularity: at corpus size n, pick
    * bitsPerBand ≈ log2(n / targetBucketSize). Pure codegen'd
    * expression. */
  def srpBandKeys(qvec: Column, ps: Array[Array[Int]], bands: Int,
                  bitsPerBand: Int): Column = {
    require(ps.length == bands * bitsPerBand)
    array((0 until bands).map { b =>
      (0 until bitsPerBand).map { j =>
        val planeArr = array(ps(b * bitsPerBand + j).map(x => lit(x.toLong)): _*)
        when(dotQ(qvec, planeArr) > 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _)
    }: _*)
  }

  /** LSH-bucketed ANN: multi-table sign-random-projection — bucket
    * corpus + queries per band, score only within shared buckets,
    * take per-query top-k. The scale path: scoring cost drops from
    * |Q|·|C| to |Q|·bands·E[bucket size], tuned via bitsPerBand. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              ps: Array[Array[Int]], bands: Int = 8, bitsPerBand: Int = 4): DataFrame = {
    val bandC = corpus
      .select(col("vec_id"), col("query_vec"),
        posexplode(srpBandKeys(col("query_vec"), ps, bands, bitsPerBand)))
      .select(col("vec_id"), col("query_vec"), col("pos").as("band"), col("col").as("bkey"))
    val bandQ = queries
      .select(col("query_id"), col("qvec"),
        posexplode(srpBandKeys(col("qvec"), ps, bands, bitsPerBand)))
      .select(col("query_id"), col("qvec"), col("pos").as("band"), col("col").as("bkey"))
    val cand = bandC.join(broadcast(bandQ), Seq("band", "bkey"))
      .filter(col("query_id") =!= col("vec_id"))
      .select("query_id", "qvec", "vec_id", "query_vec").distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand
      .withColumn("cosine", cosineQ(col("query_vec"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
