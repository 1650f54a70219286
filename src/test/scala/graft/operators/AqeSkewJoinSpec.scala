package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** AQE skew-join evidence: the claim "skewed keys → AQE splits the
  * hot partition at runtime" (PLANS.md, the q115 salting note's
  * built-in alternative) asserted against the actual executed plan,
  * not prose. A 100×-hot key is joined under sort-merge with
  * thresholds scaled to fixture size; the executed plan must contain
  * an AQEShuffleReadExec marked `isSkewJoin` whose partition specs
  * split the hot key's shuffle partition into multiple reader slices.
  */
class AqeSkewJoinSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-scale thresholds: a partition is "skewed" past ~64 KB
      // and 2x the median; target slice ~16 KB
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force a shuffle join: broadcast would hide the skew entirely
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import spark.implicits._
      // left: 200k rows on ONE hot key + a uniform tail; right: tiny dim
      val left = spark.range(0, 200000)
        .select(
          when(col("id") % 4 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
          col("id").as("v"))
        .withColumn("pad", lpad(col("v").cast("string"), 64, "x"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution: a count() would plan (and adapt)
      // a separate aggregate query, leaving joined's own adaptive plan
      // un-executed and stat-free
      assert(joined.queryExecution.toRdd.count() === 200000L)
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an AdaptiveSparkPlan root")
      // TreeNode.collect treats QueryStageExec as a leaf — descend
      // into each stage's plan explicitly
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case q: QueryStageExec => allNodes(q.plan)
        case _ => p.children.flatMap(allNodes)
      })
      val skewReads = allNodes(adaptive.get.executedPlan).collect {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => r
      }
      assert(skewReads.nonEmpty,
        s"no skew-join shuffle read in:\n${adaptive.get.executedPlan}")
      // the hot partition must actually be split: more reader slices
      // than pre-shuffle partitions on at least one side
      assert(skewReads.exists(r => r.partitionSpecs.length > 4),
        "skew read did not split the hot partition")
    }
  }
}
