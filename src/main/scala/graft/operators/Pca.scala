package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over quantized embedding columns,
  * engineered for cross-engine exactness and 100 TB inputs.
  *
  * The split of labour is the classic distributed-ML shape (the same
  * one `SemanticDedup` and the IVF codebook use): the DATA-sized pass
  * — accumulating the d(d+1)/2 second-moment cells — is one
  * scan-speed generator + keyed integer aggregation whose shuffle is
  * bounded by partitions × d² regardless of row count, while the
  * MODEL-sized solve (a d×d eigen problem, d = 64 here) runs on the
  * driver in deterministic fixed-point integer arithmetic. Nothing
  * float-ordered ever crosses an engine boundary: moments are exact
  * BIGINTs, and the power iteration is integer-truncated at every
  * step, so Spark's driver loop and a SQL oracle replaying the same
  * recurrence produce bit-identical vectors.
  *
  * Overflow budget: quantized components are milli-units (|q| ≤
  * ~1000 for unit-norm embeddings), so a second-moment cell grows as
  * n·10⁶ and the centered covariance n·s_ij − s_i·s_j as n²·10⁶ —
  * BIGINT holds to n ≈ 3·10⁶ vectors; past that the moment sums
  * upgrade to DECIMAL(38,0) with the same plan (q178's documented
  * ceiling pattern). The scaled matrix `cb` is bounded by 2·10⁶ and
  * the iteration state by 10⁶, so the matvec partials stay ≤ ~10¹⁴
  * at any corpus size.
  */
object Pca {

  /** Fixed-point scale for the iteration state (10⁶ ≈ 20 bits of
    * mantissa — comfortably above the truncation noise that would
    * stall convergence, far below overflow). */
  val FixedPointScale = 1000000L

  /** Exact integer moment cells over a quantized vector column:
    * one row per upper-triangle (d_i ≤ d_j) dimension pair carrying
    * (n, s_i, s_j, s_ij) — everything needed to form the centered
    * covariance n·s_ij − s_i·s_j without a second scan.
    *
    * Plan shape: a scan-side generator explodes d(d+1)/2 product
    * terms per row into a hash aggregate — partial (map-side)
    * aggregation collapses every partition to ≤ d(d+1)/2 rows before
    * the only shuffle, so the exchanged volume is partitions × d²,
    * independent of n. No window, no join against data-sized sides
    * (the two first-moment joins are d-row broadcasts). */
  def momentCells(quantized: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val cells = quantized
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${dim - 1}), i ->
           |  transform(sequence(i, ${dim - 1}), j ->
           |    named_struct('d_i', CAST(i AS BIGINT),
           |                 'd_j', CAST(j AS BIGINT),
           |                 'p', $vecCol[i] * $vecCol[j]))))""".stripMargin)).as("c"))
      .select(col("c.d_i"), col("c.d_j"), col("c.p"))
      .groupBy("d_i", "d_j").agg(sum("p").as("s_ij"))
    val firsts = quantized
      .select(posexplode(col(vecCol)).as(Seq("d", "v")))
      .groupBy("d").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("d").cast("long").as("d"), col("s"), col("n"))
    cells
      .join(broadcast(firsts.select(col("d").as("d_i"),
        col("s").as("s_i"), col("n"))), "d_i")
      .join(broadcast(firsts.select(col("d").as("d_j"),
        col("s").as("s_j"))), "d_j")
      .select(col("d_i"), col("d_j"), col("n"),
        col("s_i"), col("s_j"), col("s_ij"))
  }

  /** Deterministic generic-position start vector (one LCG step per
    * dimension, range ±10⁶). An all-constant start can sit almost
    * orthogonal to the dominant eigenvector and park the iteration
    * on the second one; the LCG draw makes that measure-zero. */
  def startVector(dim: Int): Array[Long] =
    Array.tabulate(dim)(d => (1103515245L * d + 12345L) % 2000001L - 1000000L)

  /** Driver-side fixed-point power iteration over collected moment
    * cells: centered covariance → scale to ≤ ~2·10⁶ via one integer
    * division → `iters` rounds of (matvec, renormalize to 10⁶ by
    * truncating division). Every operation is a Long add/mul/div on
    * non-negative magnitudes with an explicit sign, so a SQL replay
    * using truncating `//` on ABS values is bit-identical.
    *
    * Convergence is the textbook (λ₂/λ₁)^iters rate — on a
    * near-isotropic spectrum the RESULT is a top-subspace direction
    * whose Rayleigh quotient reaches ≥ ~0.98·λ₁ (PcaSpec pins this
    * against a full Jacobi eigensolve), while exact eigenVECTOR
    * identity would need iterations ∝ 1/log(λ₁/λ₂). That is the
    * honest statistic for near-tied spectra: any unit vector in the
    * top subspace serves projection/outlier work equally well. */
  def fixedPointTopDirection(cells: Iterable[(Int, Int, Long, Long, Long, Long)],
                             dim: Int, iters: Int): Array[Long] = {
    val cov = Array.ofDim[Long](dim, dim)
    for ((di, dj, n, si, sj, sij) <- cells) {
      val c = n * sij - si * sj
      cov(di)(dj) = c
      cov(dj)(di) = c
    }
    val maxAbs = math.max(cov.map(_.map(math.abs).max).max, 1L)
    val sc = maxAbs / FixedPointScale + 1L
    val cb = cov.map(_.map(c => math.signum(c) * (math.abs(c) / sc)))
    var v = startVector(dim)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += cb(i)(j) * v(j); j += 1 }
        acc
      }
      val m = math.max(w.map(math.abs).max, 1L)
      val dv = m / FixedPointScale + 1L
      v = w.map(x => math.signum(x) * (math.abs(x) / dv))
    }
    v
  }
}
