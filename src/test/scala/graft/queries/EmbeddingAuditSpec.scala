package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The embedding-audit queries rest on algebraic identities; these
  * specs re-derive both from first principles on the fixture
  * vectors: q184's norm identity against the literal O(n²) pairwise
  * dot sum, q183's centroid cosine against a driver-side centroid
  * computation.
  */
class EmbeddingAuditSpec extends SparkSpec {

  private def vecs(): Map[Int, Array[Array[Long]]] =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), Similarity.quantize(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .groupBy(_._1).map { case (l, a) => l -> a.map(_._2) }

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("q184: norm identity equals the literal pairwise dot sum") {
    val byLabel = vecs()
    val rows = SimilarityOps.q184EmbeddingDiversity(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("pair_dot_num")).toMap
    for ((label, vs) <- byLabel) {
      var pairSum = 0L
      for (i <- vs.indices; j <- vs.indices if i != j)
        pairSum += dot(vs(i), vs(j))
      assert(rows(label) === pairSum,
        s"$label: identity ${rows(label)} vs brute $pairSum")
    }
  }

  test("q183: flagged outliers are the true bottom-5 by centroid cosine") {
    val byLabel = vecs()
    val got = SimilarityOps.q183LabelOutliers(spark, sfDir).collect()
      .groupBy(_.getInt(0))
      .map { case (l, rs) =>
        l -> rs.sortBy(_.getInt(1)).map(_.getAs[Double]("cos_centroid")) }
    for ((label, vs) <- byLabel) {
      val s = vs.transpose.map(_.sum).toArray
      val cosines = vs.map(v =>
        dot(v, s).toDouble /
          (math.sqrt(dot(v, v).toDouble) * math.sqrt(dot(s, s).toDouble)))
        .sorted.take(5)
      val flagged = got(label)
      assert(flagged.length === cosines.length)
      for (i <- flagged.indices)
        assert(math.abs(flagged(i) - cosines(i)) < 1e-12,
          s"$label rank ${i + 1}: ${flagged(i)} vs ${cosines(i)}")
    }
  }
}
