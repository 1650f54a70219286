package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: no false negatives, bounded false
  * positives, order/partitioning-independent build bytes, codegen'd
  * probe, and exact-join equivalence of the pruned plan. */
class BloomFilterSpec extends SparkSpec {

  import spark.implicits._

  private def bloomBytes(keys: Seq[Long], parts: Int): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(call_function("graft_bloom_agg", col("k"), lit(100000L)).as("bf"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives; FP rate near configured fpp") {
    val keys = (0L until 5000L).map(_ * 7L)
    val bytes = bloomBytes(keys, 1)
    val probesIn = keys.toDF("k")
      .filter(call_function("graft_might_contain", lit(bytes), col("k")))
    assert(probesIn.count() == keys.length, "bloom filters must never drop members")
    // disjoint probe set: odd multiples of 7 were never inserted
    val fp = (0L until 20000L).map(_ * 7L + 1L).toDF("k")
      .filter(call_function("graft_might_contain", lit(bytes), col("k"))).count()
    assert(fp < 20000 * 0.03 * 3, s"false-positive count $fp far above fpp budget")
  }

  test("build is deterministic across partitionings (merge = bitwise OR)") {
    val keys = (0L until 2000L).map(i => i * 31L)
    assert(java.util.Arrays.equals(bloomBytes(keys, 1), bloomBytes(keys, 7)))
  }

  test("probe expression stays inside whole-stage codegen") {
    val bytes = bloomBytes(Seq(1L, 2L, 3L), 1)
    // spark.range (not a LocalRelation, which would constant-fold the
    // whole filter away) keeps a real physical plan to inspect
    val plan = spark.range(100).toDF("k")
      .filter(call_function("graft_might_contain", lit(bytes), col("k")))
      .queryExecution.executedPlan
    val probeInCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("graft_might_contain") => w
    }
    assert(probeInCodegen.nonEmpty,
      s"expected the probe filter inside WholeStageCodegen, got:\n${plan.treeString.take(2000)}")
  }

  test("null probe value yields null (filter drops it), null handling in agg") {
    val bytes = Seq(Some(1L), None).toDF("k")
      .agg(call_function("graft_bloom_agg", col("k"), lit(100L)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val out = Seq[Option[Long]](Some(1L), None).toDF("k")
      .filter(call_function("graft_might_contain", lit(bytes), col("k")))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("3-arg SQL form accepts a decimal fpp literal") {
    spark.range(100).toDF("k").createOrReplaceTempView("bloom_keys")
    // 0.01 parses as a DecimalType literal, not a double — the
    // extension must unwrap Spark's Decimal
    val bytes = spark.sql(
      "SELECT graft_bloom_agg(k, 1000, 0.01) AS bf FROM bloom_keys")
      .head().getAs[Array[Byte]](0)
    val hits = spark.range(100).toDF("k")
      .filter(call_function("graft_might_contain", lit(bytes), col("k"))).count()
    assert(hits == 100)
  }

  test("bloom-pruned join result equals the plain join") {
    val dim = (0L until 100L).filter(_ % 3 == 0).toDF("key")
    val fact = (0L until 10000L).map(i => (i % 200L, i)).toDF("key", "payload")
    val bytes = dim.agg(call_function("graft_bloom_agg",
      xxhash64(col("key")), lit(1000L)).as("bf")).head().getAs[Array[Byte]](0)
    val pruned = fact
      .filter(call_function("graft_might_contain", lit(bytes), xxhash64(col("key"))))
      .join(dim, "key")
    val plain = fact.join(dim, "key")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // and the pruning actually removed non-joining rows before the join
    val kept = fact.filter(call_function("graft_might_contain",
      lit(bytes), xxhash64(col("key")))).count()
    assert(kept < fact.count(), "bloom prefilter should prune the fact side")
  }
}
