package graft.plans

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class RewriteDotProductSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    (2L, Seq(10L, -2L, 7L), Seq(0L, 1L, 2L))
  ).toDF("id", "a", "b")

  test("optimizer rewrites the declarative dotQ pattern to graft_dot_long") {
    // parquet-backed source so ConvertToLocalRelation can't fold it away
    val q = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      .select(col("vec_id"), Similarity.dotQ(col("qv"), col("qv")).as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot_long"),
      s"expected native rewrite in optimized plan:\n$optimized")
    // and the local-literal variant still computes correctly
    val df = vecs.select(Similarity.dotQ(col("a"), col("b")).as("d"))
    assert(df.as[Long].collect().sorted.sameElements(Array(12L, 32L)))
  }

  test("native expression matches HOF semantics on nulls and unequal lengths") {
    val tricky = Seq(
      (1L, Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L), Some(4L)))), // 11
      (2L, Some(Seq(Some(1L), None)), Some(Seq(Some(3L), Some(4L)))),     // null elem
      (3L, Some(Seq(Some(1L))), Some(Seq(Some(3L), Some(4L)))),           // unequal len
      (4L, None, Some(Seq(Some(3L))))                                     // null array
    ).toDF("id", "a", "b")
    val native = tricky
      .select(col("id"), call_function("graft_dot_long", col("a"), col("b")).as("d"))
      .as[(Long, Option[Long])].collect().toMap
    val hof = tricky
      .select(col("id"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("d"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native === hof)
    assert(native(1L).contains(11L) && native(2L).isEmpty &&
      native(3L).isEmpty && native(4L).isEmpty)
  }

  test("rewritten ANSI arithmetic still raises on Long overflow") {
    val big = Seq((Seq(Long.MaxValue / 2), Seq(3L))).toDF("a", "b")
      .select(Similarity.dotQ(col("a"), col("b")).as("d"))
    // under ANSI mode (session default) the rule sets failOnOverflow,
    // so the native loop must raise like Multiply would have
    val e = intercept[Exception] { big.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq() else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] ||
      Option(c.getMessage).exists(_.toLowerCase.contains("overflow"))))
  }

  test("rewrite does not fire for non-long arrays or different folds") {
    val d = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val doublePlan = d.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
      .queryExecution.optimizedPlan.toString
    assert(!doublePlan.contains("graft_dot_long"))
    val maxFold = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => greatest(acc, x)).as("d"))
      .queryExecution.optimizedPlan.toString
    assert(!maxFold.contains("graft_dot_long"))
  }
}
