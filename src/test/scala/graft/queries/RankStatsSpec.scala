package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The rank statistics (q171 AUC, q172 Gini) are computed WITHOUT a
  * global sort — score-histogram + distributed prefix sum. These
  * specs pin each against the definitional brute force on the same
  * fixture tables: AUC as the mean pairwise concordance over every
  * (positive, negative) pair, Gini as the classic sorted-rank
  * formula. Agreement proves the closed-form tie handling, not just
  * internal consistency.
  */
class RankStatsSpec extends SparkSpec {

  test("q171: histogram AUC equals brute-force pairwise concordance") {
    val row = Quality.q171Auc(spark, sfDir).head()
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("score"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("purch"))
      .collect()
      .map(r => (r.getLong(1), if (r.getLong(2) >= 15) 1 else 0))
    val pos = users.filter(_._2 == 1).map(_._1)
    val neg = users.filter(_._2 == 0).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture must have both classes")
    // 2·U = Σ over pairs: 2 if pos>neg, 1 if tie, 0 otherwise
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(row.getAs[Long]("u_stat_x2") === u2)
    assert(row.getAs[Long]("n_pos") === pos.length.toLong)
    assert(row.getAs[Long]("n_neg") === neg.length.toLong)
    val auc = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(row.getAs[Double]("auc") - auc) < 1e-12)
    assert(row.getAs[Long]("auc_bp") === u2 * 5000 / (pos.length.toLong * neg.length))
  }

  test("q178: histogram-rank Spearman equals direct tie-averaged ranks") {
    val row = Quality.q178Spearman(spark, sfDir).head()
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("sa"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("sb"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def ranks(xs: Array[Long]): Array[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](xs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + j + 2) / 2.0 // 1-based average rank of the tie block
        for (k <- i to j) out(sorted(k)._2) = avg
        i = j + 1
      }
      out
    }
    val ra = ranks(users.map(_._1)); val rb = ranks(users.map(_._2))
    val n = users.length
    val ma = ra.sum / n; val mb = rb.sum / n
    val cov = ra.zip(rb).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val va = ra.map(x => (x - ma) * (x - ma)).sum
    val vb = rb.map(y => (y - mb) * (y - mb)).sum
    val rho = cov / math.sqrt(va * vb)
    assert(row.getAs[Long]("n") === n.toLong)
    assert(math.abs(row.getAs[Double]("rho") - rho) < 1e-9,
      s"rho ${row.getAs[Double]("rho")} vs brute $rho")
  }

  test("q180: cell-grid Kendall tau-b equals all-pairs brute force") {
    val row = Quality.q180KendallTau(spark, sfDir).head()
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("sa"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("sb"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    var conc = 0L; var disc = 0L; var tiesA = 0L; var tiesB = 0L
    for (i <- users.indices; j <- (i + 1) until users.length) {
      val (a1, b1) = users(i); val (a2, b2) = users(j)
      if (a1 == a2) tiesA += 1
      if (b1 == b2) tiesB += 1
      if (a1 != a2 && b1 != b2) {
        if ((a1 < a2) == (b1 < b2)) conc += 1 else disc += 1
      }
    }
    assert(row.getAs[Long]("concordant") === conc)
    assert(row.getAs[Long]("discordant") === disc)
    assert(row.getAs[Long]("ties_a") === tiesA)
    assert(row.getAs[Long]("ties_b") === tiesB)
    val n = users.length.toLong; val n0 = n * (n - 1) / 2
    val tau = (conc - disc).toDouble /
      (math.sqrt((n0 - tiesA).toDouble) * math.sqrt((n0 - tiesB).toDouble))
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 1e-12)
  }

  test("q175: grid KS equals the direct pooled-ECDF supremum") {
    val rows = Quality.q175KsDrift(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getAs[Double]("ks")))
      .toMap
    val byLang = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, a) => l -> a.map(_._2).sorted }
    val ref = byLang("en")
    for ((lang, xs) <- byLang if lang != "en") {
      val pooled = (xs ++ ref).distinct.sorted
      var best = 0L
      for (v <- pooled) {
        val cumL = xs.count(_ <= v).toLong
        val cumR = ref.count(_ <= v).toLong
        val d = math.abs(cumL * ref.length - cumR * xs.length)
        if (d > best) best = d
      }
      val (nL, nR, ksNum, ks) = rows(lang)
      assert(nL === xs.length.toLong && nR === ref.length.toLong)
      assert(ksNum === best, s"$lang: ks_num $ksNum vs brute $best")
      assert(math.abs(ks - best.toDouble / (nL.toDouble * nR.toDouble))
        < 1e-12)
    }
  }

  test("q172: funnel Gini equals the sorted-rank formula") {
    val row = Quality.q172Gini(spark, sfDir).head()
    val cents = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")).as("cents"))
      .collect().map(_.getLong(1)).sorted
    val n = cents.length.toLong
    val total = cents.sum
    val s1 = cents.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gini = (2.0 * s1 - (n + 1).toDouble * total) / (n.toDouble * total)
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("total_cents") === total)
    // double parity is near-exact (different summation order driver-side)
    assert(math.abs(row.getAs[Double]("gini") - gini) < 1e-9)
    val bp = ((BigInt(2) * BigInt(s1) - BigInt(n + 1) * BigInt(total)) * 10000 /
      (BigInt(n) * BigInt(total))).toLong
    assert(row.getAs[Long]("gini_bp") === bp)
  }
}
