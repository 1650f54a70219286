package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection operators for training-data curation:
  * word-shingling, MinHash+LSH banding, SimHash. Everything is
  * composed from built-in expressions + joins — no UDFs, no driver
  * loops — so candidate generation is shuffle-bound, not CPU-bound.
  *
  * Scale design: LSH banding turns the O(n²) all-pairs problem into
  * groupBy(band-bucket) + within-bucket self-join. At 100 TB the
  * bucket join is the only quadratic term and is bounded by bucket
  * size; skewed buckets (degenerate shingles) are capped upstream by
  * distinct-shingle hashing.
  */
object Dedup {

  /** Word n-gram shingles over a token array; documents shorter than
    * n tokens contribute their whole text as one shingle. */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k + 1))): _*))
    when(size(toks) >= n, grams).otherwise(array(concat_ws(" ", toks)))
  }

  /** Classic 32-bit-domain MinHash family: h_i(x) = (a_i·x32 + b_i)
    * mod p with p prime > 2^32; a_i/b_i fixed odd constants derived
    * from the index (fully deterministic across runs/executors). */
  private val P = 4294967311L // smallest prime > 2^32
  // Coefficients capped below 2^30 so a·x32 + b < 2^62 — no Long
  // overflow under ANSI mode (Spark 4 default) for any 32-bit x.
  private def aCoef(i: Int): Long = ((0x9E3779B9L * (i + 1)) % 1073741789L) | 1L
  private def bCoef(i: Int): Long = (0x85EBCA6BL * (i + 1) + 0x27D4EB2FL) % 1073741789L

  /** (id, sig array<long> of k minhashes) per document. One explode +
    * one groupBy shuffle on the id. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 16, shingleN: Int = 3): DataFrame = {
    val sh = df.select(
        col(idCol),
        explode(array_distinct(shingles(TextAnalysis.tokens(col(textCol)), shingleN)))
          .as("shingle"))
      // non-negative 32-bit shingle hash so a*x+b never overflows Long
      .withColumn("h32", pmod(xxhash64(col("shingle")), lit(1L << 32)))
    val mins = (0 until k).map(i =>
      min(pmod(lit(aCoef(i)) * col("h32") + lit(bCoef(i)), lit(P))).as(s"_m$i"))
    sh.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of
    * `rowsPerBand`, bucket on (band index, band hash), self-join
    * within buckets → distinct candidate pairs (idA < idB). */
  def lshCandidatePairs(sigs: DataFrame, idCol: String,
                        bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val banded = sigs.select(
        col(idCol), posexplode(
          array((0 until bands).map(bi =>
            slice(col("sig"), bi * rowsPerBand + 1, rowsPerBand)): _*)))
      .select(col(idCol), col("pos").as("band_idx"), hash(col("col")).as("band_key"))
    val left = banded.select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
    val right = banded.select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
    left.join(right, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard verification of candidate pairs against the
    * distinct-shingle sets (the verify kernel after LSH recall). */
  def verifyJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
                    textCol: String, shingleN: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("_vid"),
      array_distinct(shingles(TextAnalysis.tokens(col(textCol)), shingleN)).as("_set"))
    pairs
      .join(sets.withColumnRenamed("_vid", "id_a").withColumnRenamed("_set", "set_a"), "id_a")
      .join(sets.withColumnRenamed("_vid", "id_b").withColumnRenamed("_set", "set_b"), "id_b")
      .withColumn("intersection_size", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("union_size",
        size(col("set_a")) + size(col("set_b")) - col("intersection_size"))
      .withColumn("jaccard",
        (col("intersection_size").cast("double") / col("union_size")).cast("double"))
      .drop("set_a", "set_b")
  }

  /** 64-bit SimHash per document: per-token xxhash64, each bit
    * contributes ±1, sign of the per-bit sum forms the fingerprint.
    * Implemented as 64 codegen'd conditional-sum aggregates in ONE
    * groupBy pass — no per-bit explode, no arrays, no UDF. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"_b$i"))
    val sig = (0 until 64).map(i =>
      when(col(s"_b$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    tok.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: bucket on 8-bit chunks — by
    * pigeonhole, two fingerprints within Hamming distance d <= 7
    * share at least one of the 8 chunks unchanged, so recall is
    * GUARANTEED for maxHamming <= 7; verify with bit_count(xor). */
  def simhashNearDups(sigs: DataFrame, idCol: String, maxHamming: Int = 7): DataFrame = {
    val chunked = sigs.select(col(idCol), col("simhash"),
        posexplode(array((0 until 8).map(j =>
          shiftright(col("simhash"), j * 8).bitwiseAND(0xFF)): _*)))
      .select(col(idCol), col("simhash"), col("pos").as("chunk_idx"), col("col").as("chunk"))
    val l = chunked.select(col(idCol).as("id_a"), col("simhash").as("sim_a"),
      col("chunk_idx"), col("chunk"))
    val r = chunked.select(col(idCol).as("id_b"), col("simhash").as("sim_b"),
      col("chunk_idx"), col("chunk"))
    l.join(r, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
  }
}
