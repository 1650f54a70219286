package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2SkewSpec extends SparkSpec {
  import spark.implicits._

  test("Scd2.fromHistory builds half-open ranges with one current version per key") {
    val hist = Seq(("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 30L, "c"), ("u2", 5L, "x"))
      .toDF("user_id", "ts", "payload")
    val dim = Scd2.fromHistory(hist, "user_id", "ts")
    val rows = dim.select("user_id", "version_seq", "effective_start", "effective_end", "is_current")
      .as[(String, Int, Long, Option[Long], Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq === Seq(
      ("u1", 1, 10L, Some(20L), false),
      ("u1", 2, 20L, Some(30L), false),
      ("u1", 3, 30L, None, true),
      ("u2", 1, 5L, None, true)))
  }

  test("Scd2.lookupJoin: facts pick the covering version; pre-history facts keep nulls") {
    val hist = Seq(("u1", 10L, "v1"), ("u1", 20L, "v2")).toDF("user_id", "ts", "payload")
    val dim = Scd2.fromHistory(hist, "user_id", "ts")
      .select("user_id", "payload", "effective_start", "effective_end")
    val facts = Seq(("f0", "u1", 5L), ("f1", "u1", 10L), ("f2", "u1", 15L),
      ("f3", "u1", 20L), ("f4", "u1", 99L), ("f5", "u9", 50L))
      .toDF("fact_id", "user_id", "fts")
    val out = Scd2.lookupJoin(facts, dim, "user_id", col("fts"))
      .select("fact_id", "payload").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "f0" -> None,          // before first version
      "f1" -> Some("v1"),    // inclusive start
      "f2" -> Some("v1"),
      "f3" -> Some("v2"),    // exclusive end of v1
      "f4" -> Some("v2"),    // open-ended current
      "f5" -> None))         // unknown key survives the left join
    assert(out.size === 6)   // no fan-out, no drops
  }

  test("Skew.saltedJoin equals the plain join on skewed data, and shuffles on (key, salt)") {
    import org.apache.spark.sql.functions._
    // 90% of probe rows share one hot key; build has multi-row keys
    // to pin multiplicity semantics
    val probe = spark.range(0, 2000)
      .select(when(col("id") % 10 =!= 0, "HOT").otherwise(concat(lit("k"), col("id"))).as("k"),
        col("id").as("v"))
    val build = Seq(("HOT", "a"), ("HOT", "b"), ("k10", "c"), ("missing", "d"))
      .toDF("k", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "attr").collect().map(_.toString).sorted.toSeq
    val plain = probe.join(build, Seq("k"))
    val salted = Skew.saltedJoin(probe, build, "k", salts = 8)
    assert(canon(salted) == canon(plain))
    // left-join parity incl. unmatched probe rows
    val plainLeft = probe.join(build, Seq("k"), "left")
    val saltedLeft = Skew.saltedJoin(probe, build, "k", salts = 8, joinType = "left")
    assert(canon(saltedLeft) == canon(plainLeft))
    // the exchange must carry the salt: hot key spread over 8 reducers
    assert(salted.queryExecution.sparkPlan.toString.contains("_salt"))
  }

  test("Skew.saltedSumCount equals direct aggregation, including a hot key") {
    val hot = (1 to 5000).map(i => ("hot", i.toLong))
    val cold = (1 to 100).map(i => (s"k$i", i.toLong))
    val df = (hot ++ cold).toDF("key", "v").repartition(8)
    val salted = Skew.saltedSumCount(df, Seq("key"), "v", salts = 8)
      .select("key", "sum_v", "row_count").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val direct = df.groupBy("key").agg(sum("v"), count(lit(1)))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(salted === direct)
    assert(salted("hot") === ((hot.map(_._2).sum, 5000L)))
  }

  test("salt spreads byte-identical duplicate rows within one partition") {
    // degenerate hot key: 4000 identical rows in a single partition —
    // a content-only hash would map them all to one salt/reducer
    val dupes = Seq.fill(4000)(("hot", 1L)).toDF("key", "v").repartition(1)
    val used = dupes.select(Skew.saltCol(dupes, 16).as("s"))
      .distinct().count()
    assert(used == 16, s"expected all 16 salts used, got $used")
  }
}
