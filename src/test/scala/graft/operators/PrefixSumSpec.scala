package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(rows: Int, parts: Int) =
    spark.range(rows).select(
        (col("id") * 7919 % 10007).as("k"),   // unique, shuffled order
        (col("id") % 97 + 1).as("v"))
      .repartition(parts)

  test("two-phase prefix sum equals the windowed running sum") {
    val df = fixture(5000, 8)
    val expected = df
      .withColumn("cum", sum(col("v")).over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("k").select("k", "v", "cum").collect()
    val got = PrefixSum.withRunningSum(df, "k", "v", "cum")
      .orderBy("k").select("k", "v", "cum").collect()
    assert(got.toSeq === expected.toSeq)
  }

  test("result is independent of input partitioning and scan width") {
    val a = PrefixSum.withRunningSum(fixture(3000, 1), "k", "v", "cum", numPartitions = 3)
      .orderBy("k").collect()
    val b = PrefixSum.withRunningSum(fixture(3000, 17), "k", "v", "cum", numPartitions = 11)
      .orderBy("k").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("packTargets cuts ~equal byte chunks and never exceeds the partition count") {
    val df = fixture(1000, 6).withColumnRenamed("v", "bytes")
    val targets = PrefixSum.packTargets(df, "k", "bytes", 5)
    val perPart = targets.groupBy("_target")
      .agg(sum(col("bytes")).as("b")).select("b").as[Long].collect()
    assert(perPart.length === 5)
    val total = perPart.sum
    // contiguous packing: every chunk within one max-row of the ideal
    assert(perPart.forall(b => math.abs(b - total / 5) <= 97 + total / 5 / 10))
  }

  test("q200 shard packing is invariant to input partitioning") {
    // the epoch-shuffle packer must assign every doc the same
    // (shard, pos) whatever the scan's partitioning — the
    // reproducibility contract a resumable training job relies on.
    // q200 reads its own parquet scan, so invariance is driven at the
    // operator level: the same packing pipeline over 1 vs 13 input
    // partitions.
    def pack(parts: Int) = {
      val docs = spark.range(2000).select(
          col("id").as("doc_id"),
          (col("id") % 317 + 5).as("token_count"))
        .repartition(parts)
        .withColumn("shuffle_key", md5(concat_ws(":", lit(0), col("doc_id"))))
      PrefixSum.withRunningSum(docs, "shuffle_key", "token_count", "cum_tokens")
        .withColumn("shard",
          floor((col("cum_tokens") - col("token_count")) / 2000L).cast("bigint"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("shard").orderBy("shuffle_key")))
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id").collect().toSeq
    }
    assert(pack(1) === pack(13))
  }

  test("q59 plan has no unpartitioned window (the single-task funnel)") {
    val plan = graft.SparkEntry.queries("q59_token_packing")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unpartitioned WindowExec survived:\n$plan")
  }
}
