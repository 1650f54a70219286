package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 hardening (verdict item 8): SuffixRank.ranks property-
  * tested against a plain JVM suffix sort on random corpora —
  * including non-ASCII alphabets, duplicate documents, and empty
  * texts — and zipWithIndex pinned invariant under adversarial input
  * partitioning. The q250 oracle covers the documents fixture; this
  * covers the input space the fixture doesn't reach. */
class SuffixRankPropertySpec extends SparkSpec {
  import spark.implicits._

  /** JVM ground truth: count-smaller lexicographic rank of every
    * truncated suffix (round 13 — rank = index of the string's first
    * occurrence in the multiset-sorted suffix list; equal ranks iff
    * equal strings, rank order ≡ string order). BMP alphabets only,
    * where String ordering == code-point ordering. */
  private def oracle(docs: Seq[(Long, String)],
                     maxLen: Int): Set[(Long, Int, Long)] = {
    val suffixes = docs.flatMap { case (id, t) =>
      val tt = t.take(maxLen)
      (0 until tt.length).map(p => ((id, p), tt.substring(p)))
    }
    val firstIdx = scala.collection.mutable.Map.empty[String, Long]
    suffixes.map(_._2).sorted.zipWithIndex.foreach { case (s, i) =>
      if (!firstIdx.contains(s)) firstIdx(s) = i.toLong
    }
    suffixes.map { case ((id, p), s) => (id, p, firstIdx(s)) }.toSet
  }

  private def run(docs: Seq[(Long, String)], maxLen: Int): Set[(Long, Int, Long)] =
    SuffixRank.ranks(docs.toDF("doc_id", "text"), "doc_id", "text", maxLen)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("property: ranks == JVM suffix sort on random corpora (ascii + unicode)") {
    val alphabets = Seq("ab", "abc ", "zyx w", "αβγab", "日本語ab")
    alphabets.zipWithIndex.foreach { case (alpha, round) =>
      val rnd = new scala.util.Random(1000 + round)
      val base = (0 until 10).map { id =>
        val len = 1 + rnd.nextInt(24)
        (id.toLong,
          (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      }
      // duplicate doc (cross-doc equal suffixes) + empty doc (no rows)
      val docs = base ++ Seq((100L, base.head._2), (101L, ""))
      val maxLen = 1 + rnd.nextInt(12)
      assert(run(docs, maxLen) === oracle(docs, maxLen),
        s"alphabet '$alpha', maxLen $maxLen")
    }
  }

  test("packed and unpacked rank paths produce identical ranks") {
    // production only takes the two-column path past 2^31 suffix rows;
    // this pins packed ≡ unpacked (≡ the JVM oracle) at testable sizes
    val rnd = new scala.util.Random(77)
    val docs = (0 until 12).map { id =>
      (id.toLong, (0 until 1 + rnd.nextInt(20))
        .map(_ => "abcα "(rnd.nextInt(5))).mkString)
    } ++ Seq((50L, "abc abc"), (51L, "abc abc"))
    val maxLen = 10
    val packed = run(docs, maxLen)
    SuffixRank.forceUnpacked = true
    val unpacked = try run(docs, maxLen) finally SuffixRank.forceUnpacked = false
    assert(packed === unpacked)
    assert(packed === oracle(docs, maxLen))
  }

  test("property: single-char and all-equal corpora (degenerate rank groups)") {
    val docs = Seq((1L, "aaaaaaaa"), (2L, "aaaa"), (3L, "a"))
    (1 to 3).foreach { maxLen =>
      assert(run(docs, maxLen) === oracle(docs, maxLen), s"maxLen $maxLen")
    }
  }

  test("zipWithIndex: invariant under adversarial input partitioning") {
    val rows = (0 until 500).map { i =>
      (i.toLong, s"k${i % 7}", (i * 31 % 97).toLong)
    }
    val df = rows.toDF("id", "skew_key", "v")
    def index(input: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      SuffixRank.zipWithIndex(input, Seq("v", "id"), "gi")
        .select("id", "gi").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val base = index(df)
    // the index is the rank in (v, id) order — pin against a JVM sort
    val expected = rows.sortBy(r => (r._3, r._1)).zipWithIndex
      .map { case (r, i) => (r._1, i.toLong) }.sortBy(_._1)
    assert(base === expected)
    // skewed hash partitioning, single partition, and reversed order
    // must all produce the identical index
    assert(index(df.repartition(32, col("skew_key"))) === base)
    assert(index(df.repartition(1)) === base)
    assert(index(df.orderBy(col("id").desc)) === base)
  }
}
