package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Independent definitional checks for the distribution-drift pair:
  * q190's JSD against a direct unrounded double computation (the 6-dp
  * term rounding bounds the drift at |langs|·1e-6), and q191's
  * Cramér's V against the textbook χ²/(n·min(r−1,c−1)) formula. Both
  * engines share the rounded derivation, so these specs are the
  * defence against a shared-formula error being oracle-green (the
  * q171 lesson).
  */
class DivergenceSpec extends SparkSpec {

  private def counts(): Map[(String, String), Long] =
    Tables.documents(spark, sfDir)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

  test("q190: JSD equals the direct computation and respects [0, ln 2]") {
    val c = counts()
    val sources = c.keys.map(_._1).toSeq.distinct
    val langs = c.keys.map(_._2).toSeq.distinct
    val nTot = c.values.sum.toDouble
    val byLang = langs.map(l =>
      l -> c.collect { case ((_, ll), v) if ll == l => v }.sum).toMap
    val rows = Quality.q190SourceDivergence(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === sources.toSet)
    for (src <- sources) {
      val nS = c.collect { case ((ss, _), v) if ss == src => v }.sum
      var jsd = 0.0
      for (l <- langs) {
        val p = c.getOrElse((src, l), 0L).toDouble / nS
        val q = byLang(l).toDouble / nTot
        val m = (p + q) / 2.0
        if (p > 0) jsd += 0.5 * p * math.log(p / m)
        jsd += 0.5 * q * math.log(q / m)
      }
      val (nDocs, got) = rows(src)
      assert(nDocs === nS)
      assert(got >= -1e-9 && got <= math.log(2.0) + 1e-9, s"$src: $got")
      assert(math.abs(got - jsd) < langs.size * 2e-6,
        s"$src: query $got vs direct $jsd")
    }
  }

  test("q191: Cramér's V equals the textbook formula from raw counts") {
    val c = counts()
    val sources = c.keys.map(_._1).toSeq.distinct
    val langs = c.keys.map(_._2).toSeq.distinct
    val nTot = c.values.sum
    val rowTot = langs.map(l =>
      l -> c.collect { case ((_, ll), v) if ll == l => v }.sum).toMap
    val colTot = sources.map(s0 =>
      s0 -> c.collect { case ((ss, _), v) if ss == s0 => v }.sum).toMap
    var chi2 = 0.0
    for (l <- langs; s0 <- sources) {
      val e = rowTot(l).toDouble * colTot(s0).toDouble / nTot
      if (e > 0) {
        val o = c.getOrElse((s0, l), 0L).toDouble
        chi2 += (o - e) * (o - e) / e
      }
    }
    val row = Quality.q191CramersV(spark, sfDir).head()
    val dofMin = math.min(langs.size - 1, sources.size - 1)
    assert(row.getAs[Long]("n_total") === nTot)
    assert(row.getAs[Long]("dof_min") === dofMin.toLong)
    val v = math.sqrt(chi2 / (nTot.toDouble * dofMin))
    val got = row.getAs[Double]("cramers_v")
    assert(got >= 0.0 && got <= 1.0 + 1e-12)
    assert(math.abs(got - v) < 1e-6, s"query $got vs direct $v")
  }
}
