package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-doubling suffix ranks ≡ brute-force sorted truncated
  * suffixes — dense ranks, truncation semantics, duplicate documents
  * (equal suffixes share a rank, including groups spanning range-
  * partition boundaries), input-partitioning invariance, and the
  * distributed zipWithIndex contract.
  */
class SuffixRankSpec extends SparkSpec {
  import spark.implicits._

  /** All (doc, pos, suffix) of texts truncated at maxLen. */
  private def bruteSuffixes(docs: Seq[(Long, String)], maxLen: Int): Seq[(Long, Int, String)] =
    docs.flatMap { case (id, text) =>
      val t = text.take(maxLen)
      (0 until t.length).map(p => (id, p, t.substring(p)))
    }

  /** Dense rank per suffix string (lexicographic). */
  private def bruteRanks(docs: Seq[(Long, String)], maxLen: Int): Map[(Long, Int), Long] = {
    val sfx = bruteSuffixes(docs, maxLen)
    val rankOf = sfx.map(_._3).distinct.sorted.zipWithIndex.toMap
    sfx.map { case (id, p, s) => (id, p) -> rankOf(s).toLong }.toMap
  }

  private def runRanks(docs: Seq[(Long, String)], maxLen: Int): Map[(Long, Int), Long] =
    SuffixRank.ranks(docs.toDF("doc_id", "text"), "doc_id", "text", maxLen)
      .as[(Long, Int, Long)].collect()
      .map { case (id, p, r) => (id, p) -> r }.toMap

  test("handcrafted corpus with a duplicate document: dense ranks exact") {
    val docs = Seq((1L, "banana"), (2L, "bandana"), (3L, "banana"))
    assert(runRanks(docs, 240) === bruteRanks(docs, 240))
  }

  test("truncation budget applies before suffixing") {
    val docs = Seq((1L, "banana"), (2L, "band"))
    // maxLen 4: suffixes of "bana" and "band" only
    assert(runRanks(docs, 4) === bruteRanks(docs, 4))
  }

  test("sf0.001 sample: ranks ≡ brute force at maxLen=60") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    assert(docs.nonEmpty)
    assert(runRanks(docs, 60) === bruteRanks(docs, 60))
  }

  test("ranks are invariant to input partitioning") {
    val docs = Seq((1L, "abcabc"), (2L, "bcabca"), (3L, "cabcab"), (4L, "abcabc"))
    val base = runRanks(docs, 240)
    val repart = SuffixRank.ranks(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text", 240)
      .as[(Long, Int, Long)].collect()
      .map { case (id, p, r) => (id, p) -> r }.toMap
    assert(repart === base)
  }

  test("zipWithIndex: contiguous 0-based index in sort order, any partitioning") {
    val df = (1 to 97).map(i => (i.toLong, s"k${100 - i}")).toDF("id", "k")
      .repartition(5)
    val got = SuffixRank.zipWithIndex(df, Seq("k", "id"))
      .select("id", "k", "_gi").as[(Long, String, Long)].collect()
    val expected = (1 to 97).map(i => (i.toLong, s"k${100 - i}"))
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, k), gi) => (id, k, gi.toLong) }
    assert(got.sortBy(_._3).toSeq === expected)
  }
}
