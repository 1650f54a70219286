package graft.queries

import graft.Tables
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection queries over the documents table.
  * MinHash/SimHash internals hash with xxhash64/murmur3, which no SQL
  * oracle reproduces — those run as rows-only checks; their verify
  * kernels (exact Jaccard, fingerprints) are oracle-checked via
  * q44/q45 in TextOps.
  */
object DedupOps {

  type Q = (SparkSession, String) => DataFrame

  /** MinHash(16) + LSH(4 bands × 4 rows) candidate pairs, verified
    * with exact 3-shingle Jaccard. The full scalable near-dup
    * pipeline: shingle → sign → band → bucket-join → verify. */
  def q46MinhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", k = 16, shingleN = 3)
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 4)
    Dedup.verifyJaccard(pairs, d, "doc_id", "text", shingleN = 3)
      .filter(col("jaccard") >= 0.2)
      .select("id_a", "id_b", "intersection_size", "union_size", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash fingerprints per document (deterministic across
    * runs — xxhash64 token hashing, sign-of-bit-sum aggregation). */
  def q47SimhashFingerprint(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash64(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("simhash"))
      .orderBy("doc_id")

  /** SimHash near-dup pairs: 8-bit chunk bucketing + Hamming verify.
    * maxHamming stays at 7 — the pigeonhole recall guarantee of the
    * 8-chunk bucketing (see Dedup.simhashNearDups). */
  def q48SimhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val sigs = Dedup.simhash64(Tables.documents(s, dir), "doc_id", "text")
    Dedup.simhashNearDups(sigs, "doc_id", maxHamming = 7)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, Q] = Map(
    "q46_minhash_neardup" -> q46MinhashNearDup _,
    "q47_simhash_fingerprint" -> q47SimhashFingerprint _,
    "q48_simhash_neardup" -> q48SimhashNearDup _,
  )

  /** Hash-internal ops — no SQL-expressible oracle; driver records
    * rows-only checks (their verify kernels are oracle-checked in
    * TextOps q44/q45). */
  val oracles: Map[String, String] = Map.empty
}
