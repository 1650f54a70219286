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

  test("q255: Bucketing operator joins exchange-free under the join and matches raw tables") {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    try {
      val got = graft.queries.TelecomOps.q255BucketedJoin(spark, sfDir)

      // the join subtree (before the aggregate, which legitimately
      // exchanges on c_mktsegment) must carry no shuffle: assert on
      // the bare bucketed join the query composes
      val o = spark.table(s"graft_b_orders_$tag").hint("merge")
      val c = spark.table(s"graft_b_customer_$tag")
      val join = o.join(c, col("o_custkey") === col("c_custkey"))
      val planStr = join.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin"), planStr)
      assert(!planStr.contains("Exchange hashpartitioning"),
        s"bucketed q255 join must not shuffle:\n$planStr")

      // result parity with the same aggregation over the raw parquet
      val raw = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("revenue_cents"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy("c_mktsegment")
      assert(got.collect().toSeq === raw.collect().toSeq)

      // idempotence: a second call reuses the catalog entry (no
      // rewrite) and the same rows come back
      val again = graft.queries.TelecomOps.q255BucketedJoin(spark, sfDir)
      assert(again.collect().toSeq === raw.collect().toSeq)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft_b_orders_$tag")
      spark.sql(s"DROP TABLE IF EXISTS graft_b_customer_$tag")
    }
  }

  test("concurrent ensureBucketed registrations: one write wins, refresh discipline holds") {
    import spark.implicits._
    val name = "graft_b_conc_test"
    try {
      val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
      // two threads race the first registration — without the
      // registration lock both pass the tableExists check and race
      // saveAsTable into the same catalog entry and location
      import java.util.concurrent.{Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (1 to 2).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit =
            try Bucketing.ensureBucketed(spark, df, name, "k", 4)
            catch { case t: Throwable => errs.add(t) }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS), "registration hung")
      assert(errs.isEmpty, s"concurrent registration failed: ${errs.peek()}")
      assert(spark.table(name).count() === 100L)

      // stale-layout refresh: a new session epoch (catalog entry gone,
      // external files still on disk) re-registers with FRESH data and
      // must serve the fresh rows, never the stale files
      spark.sql(s"DROP TABLE IF EXISTS $name") // external: files survive the drop
      val df2 = (1L to 50L).map(i => (i, s"w$i")).toDF("k", "v")
      Bucketing.ensureBucketed(spark, df2, name, "k", 4)
      assert(spark.table(name).count() === 50L,
        "stale on-disk layout served after a refresh registration")
      assert(spark.table(name).filter(col("v").startsWith("w")).count() === 50L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_b_conc_test")
  }
}
