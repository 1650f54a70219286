package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q177 computes isotonic regression through the minimax closed form
  * (join/window-shaped). This spec re-derives the fit with the
  * textbook sequential pool-adjacent-violators loop over exact
  * integer pools — a genuinely different algorithm — and requires
  * equality, plus the two defining properties (monotone, pool means
  * preserve mass).
  */
class IsotonicSpec extends SparkSpec {

  private def pav(ys: Array[Long], ws: Array[Long]): Array[Double] = {
    // pools as (ysum, wsum, span) merged while the left mean exceeds
    // the right; exact integer compare via cross-multiplication
    val st = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    for (i <- ys.indices) {
      var cur = (ys(i), ws(i), 1)
      while (st.nonEmpty && st.last._1 * cur._2 >= cur._1 * st.last._2) {
        val l = st.remove(st.length - 1)
        cur = (l._1 + cur._1, l._2 + cur._2, l._3 + cur._3)
      }
      st += cur
    }
    st.toArray.flatMap { case (y, w, span) =>
      Array.fill(span)(y.toDouble / w.toDouble)
    }
  }

  test("q177: minimax fit equals sequential PAV on exact pools") {
    val out = Quality.q177Isotonic(spark, sfDir)
      .orderBy("score").collect()
    assert(out.length > 1)
    val ys = out.map(_.getAs[Long]("ysum"))
    val ws = out.map(_.getAs[Long]("w"))
    val expect = pav(ys, ws)
    val got = out.map(_.getAs[Double]("fitted"))
    for (i <- got.indices)
      assert(math.abs(got(i) - expect(i)) < 1e-12,
        s"fitted($i): ${got(i)} vs PAV ${expect(i)}")
    // defining properties
    for (i <- 1 until got.length)
      assert(got(i) >= got(i - 1), s"not monotone at $i")
    val mass = got.zip(ws).map { case (f, w) => f * w }.sum
    assert(math.abs(mass - ys.sum.toDouble) < 1e-6, "pool mass not preserved")
  }
}
