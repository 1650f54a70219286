package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Proof of the co-located-join scale claim (SURVEY.md §4): two
  * tables bucketed on the join key join WITHOUT any shuffle exchange
  * — at 100 TB this is the difference between a network-bound join
  * and a local merge.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("warehouse").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Tables.orders(spark, sfDir)
        .write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.customer(spark, sfDir)
        .withColumn("c_custkey", col("c_custkey").cast("bigint"))
        .write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected bucket-co-located join without shuffle, got:\n$plan")
      // and it computes the right thing
      val cnt = joined.count()
      assert(cnt === Tables.orders(spark, sfDir).count()) // every order has a customer
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
