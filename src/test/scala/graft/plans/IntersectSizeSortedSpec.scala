package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native sorted-merge intersection count ≡ size(array_intersect) on
  * sorted-distinct inputs — that equivalence IS the contract under
  * which Dedup.verifyJaccard swaps it in.
  */
class IntersectSizeSortedSpec extends SparkSpec {
  import spark.implicits._

  private def native = call_function("graft_intersect_size", col("a"), col("b"))
  private def builtin = size(array_intersect(col("a"), col("b")))

  test("fixed cases: overlap, disjoint, identical, empty, subsets") {
    val df = Seq(
      (1L, Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 7L, 9L)), // 2
      (2L, Seq(1L, 2L), Seq(3L, 4L)),                 // 0
      (3L, Seq(5L, 6L, 7L), Seq(5L, 6L, 7L)),         // 3
      (4L, Seq.empty[Long], Seq(1L, 2L)),             // 0
      (5L, Seq(2L, 4L), Seq(1L, 2L, 3L, 4L, 5L)),     // 2
      (6L, Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)) // 2
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), native.as("c")).as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 2, 2L -> 0, 3L -> 3, 4L -> 0, 5L -> 2, 6L -> 2))
  }

  test("randomized: ≡ size(array_intersect) on 200 sorted-distinct md5 pairs") {
    val rows = (1 to 200).map { i =>
      def arr(salt: Int): Seq[Long] = {
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until 30).map { k =>
          val h = md.digest(s"$i|$salt|$k".getBytes("UTF-8"))
          (h(0) & 0x3f).toLong // small domain forces collisions
        }.distinct.sorted
      }
      (i.toLong, arr(0), arr(1))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(col("id"), native.as("n"), builtin.as("e"))
      .as[(Long, Int, Int)].collect()
    both.foreach { case (id, n, e) => assert(n === e, s"row $id") }
  }

  test("null array yields null; result survives codegen in a real pipeline") {
    val df = Seq(
      (1L, Some(Seq(1L, 2L)), None),
      (2L, Some(Seq(1L, 2L)), Some(Seq(2L, 3L)))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), native.as("c"))
      .as[(Long, Option[Int])].collect().toMap
    assert(got === Map(1L -> None, 2L -> Some(1)))
    // through an aggregation stage (whole-stage codegen path)
    val total = df.filter(col("b").isNotNull)
      .select(native.as("c")).agg(sum("c")).as[Long].head()
    assert(total === 1L)
  }

  test("verifyJaccard result is identical with and without the native kernel") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    val pairs = graft.operators.Dedup.lshCandidatePairs(sigs, "doc_id")
    val withNative = graft.operators.Dedup
      .verifyJaccard(pairs, docs, "doc_id", "text")
      .select("id_a", "id_b", "intersection_size", "union_size")
      .collect().map(_.toSeq).toSet
    // the fallback path, forced by expressing the built-in directly
    val sets = graft.operators.Dedup.shingleSets(docs, "doc_id", "text")
      .select(col("doc_id").as("_vid"), col("_shingles").as("_set"))
    val fallback = pairs
      .join(sets.select(col("_vid").as("id_a"), col("_set").as("sa")), "id_a")
      .join(sets.select(col("_vid").as("id_b"), col("_set").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sa"), col("sb"))).as("intersection_size"),
        (size(col("sa")) + size(col("sb")) -
          size(array_intersect(col("sa"), col("sb")))).as("union_size"))
      .collect().map(_.toSeq).toSet
    assert(withNative === fallback)
    assert(withNative.nonEmpty)
  }
}
