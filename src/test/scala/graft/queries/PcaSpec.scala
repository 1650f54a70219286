package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{Pca, Similarity}
import org.apache.spark.sql.functions._

/** The PCA family: q187's moment cells against brute-force integer
  * moments, q188's fixed-point direction against a full Jacobi
  * eigensolve (Rayleigh-quotient criterion — the honest one for the
  * fixtures' near-isotropic spectrum), and q189's projections
  * against manual dot products.
  */
class PcaSpec extends SparkSpec {

  private val D = 64

  private def quantizedRows(): Array[(Long, Array[Long])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))

  test("q187: moment cells equal brute-force integer moments") {
    val rows = quantizedRows().map(_._2)
    val n = rows.length.toLong
    val s = Array.tabulate(D)(i => rows.map(_(i)).sum)
    val out = SimilarityOps.q187EmbeddingCov(spark, sfDir).collect()
    assert(out.length === D * (D + 1) / 2)
    for (r <- out) {
      val di = r.getLong(0).toInt; val dj = r.getLong(1).toInt
      assert(di <= dj)
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === s(di))
      assert(r.getLong(4) === s(dj))
      val sij = rows.map(v => v(di) * v(dj)).sum
      assert(r.getLong(5) === sij, s"cell ($di,$dj)")
    }
  }

  /** Cyclic Jacobi eigenvalue sweep for a symmetric matrix — test-only
    * reference solver (eigenvalues ascending). */
  private def jacobiEigenvalues(a0: Array[Array[Double]],
                                sweeps: Int = 30): Array[Double] = {
    val n = a0.length
    val a = a0.map(_.clone())
    for (_ <- 1 to sweeps; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (apq != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val sn = t * c
        var k = 0
        while (k < n) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - sn * akq
          a(k)(q) = sn * akp + c * akq
          k += 1
        }
        k = 0
        while (k < n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - sn * aqk
          a(q)(k) = sn * apk + c * aqk
          k += 1
        }
      }
    }
    Array.tabulate(n)(i => a(i)(i)).sorted
  }

  private def covMatrix(rows: Array[Array[Long]]): Array[Array[Double]] = {
    val n = rows.length.toLong
    val s = Array.tabulate(D)(i => rows.map(_(i)).sum)
    Array.tabulate(D, D)((i, j) =>
      (n * rows.map(v => v(i) * v(j)).sum - s(i) * s(j)).toDouble)
  }

  test("q188: Rayleigh quotient reaches >= 0.95 of the Jacobi top eigenvalue") {
    val cov = covMatrix(quantizedRows().map(_._2))
    val l1 = jacobiEigenvalues(cov).last
    assert(l1 > 0.0)
    val v = SimilarityOps.q188PcaPower(spark, sfDir).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1).toDouble)
    assert(v.length === D)
    val vn2 = v.map(x => x * x).sum
    assert(vn2 > 0.0)
    val rq = (0 until D).map(i =>
      v(i) * (0 until D).map(j => cov(i)(j) * v(j)).sum).sum / vn2
    assert(rq >= 0.95 * l1, s"Rayleigh $rq vs lambda1 $l1")
  }

  test("q188: query result equals the operator's driver loop on the same cells") {
    val rows = quantizedRows().map(_._2)
    val n = rows.length.toLong
    val s = Array.tabulate(D)(i => rows.map(_(i)).sum)
    val cells = for (i <- 0 until D; j <- i until D) yield
      (i, j, n, s(i), s(j), rows.map(v => v(i) * v(j)).sum)
    val expect = Pca.fixedPointTopDirection(cells, D, 120)
    val got = SimilarityOps.q188PcaPower(spark, sfDir).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1))
    assert(got.toSeq === expect.toSeq)
  }

  test("q189: projections equal manual integer dots against q188's direction") {
    val vfp = SimilarityOps.q188PcaPower(spark, sfDir).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1))
    val n2 = vfp.map(x => x * x).sum
    val byId = quantizedRows().toMap
    val out = SimilarityOps.q189PcaProject(spark, sfDir).collect()
    assert(out.length === byId.size)
    for (r <- out) {
      val q = byId(r.getLong(0))
      val fp = (0 until D).map(i => q(i) * vfp(i)).sum
      assert(r.getLong(2) === fp, s"vec ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - fp.toDouble / math.sqrt(n2.toDouble)) < 1e-9)
    }
  }
}
