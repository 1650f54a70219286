package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CorpusStats invariants beyond the DuckDB hash gate. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q277: curve laws — first shard all-novel, cum_vocab hits corpus vocab") {
    val rows = CorpusStats.q277ShardVocabCurve(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty && rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // the first populated shard has never seen any gram: novelty = 1
    assert(rows.head._2 === rows.head._3, "first shard must be all-new")
    assert(rows.head._5 === 1.0)
    // new_grams ≤ shard_vocab everywhere; cum is the running sum
    rows.foreach { case (s, vocab, nw, _, rate) =>
      assert(nw <= vocab, s"shard $s: new > vocab")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    assert(rows.map(_._3).sum === rows.last._4, "cum_vocab != sum of new_grams")
    // final cumulative vocabulary == corpus-wide distinct gram count
    val corpusVocab = graft.Tables.documents(spark, dir)
      .select(explode(array_distinct(
        graft.operators.TextAnalysis.tokens(col("text")))).as("t"))
      .distinct().count()
    assert(rows.last._4 === corpusVocab)
  }

  test("q278: stats equal direct per-column computation") {
    val got = CorpusStats.q278ColumnStats(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val li = graft.Tables.lineitem(spark, dir)
    Seq("l_quantity", "l_extendedprice", "l_discount").foreach { c =>
      val d = li.agg(count(lit(1)), sum(when(col(c).isNull, 1L).otherwise(0L)),
        countDistinct(col(c)), min(col(c)), max(col(c))).head
      assert(got(c) === ((d.getLong(0), d.getLong(1), d.getLong(2),
        d.getDouble(3), d.getDouble(4))), s"column $c drifted")
    }
  }
}
