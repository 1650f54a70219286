package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

class RewriteBoundedLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed input: local Seq relations constant-fold to
  // LocalRelation at optimization time, which would hide the rewrite
  private def parts = Tables.part(spark, sfDir)
    .select(col("p_partkey"),
      // plant some nulls to pin null-propagation equivalence
      when(col("p_partkey") % 97 =!= 0, col("p_name")).as("name"))
  private val probe = "spring green yellow purple cornsilk"

  private def boundedCount(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
    var n = 0
    plan.foreach(_.expressions.foreach(_.foreach {
      case l: Levenshtein if l.threshold.isDefined => n += 1
      case _ => ()
    }))
    n
  }

  test("lev(a,b) <= k in a filter optimizes to the banded threshold form") {
    val filtered = parts.filter(levenshtein(col("name"), lit(probe)) <= 30)
    assert(boundedCount(filtered.queryExecution.optimizedPlan) >= 1)
  }

  test("rewritten filter keeps exactly the rows of the exact-distance filter") {
    val viaRule = parts.filter(levenshtein(col("name"), lit(probe)) <= 30)
      .select("p_partkey").as[Long].collect().toSet
    // projected distances are never rewritten — the exact reference
    val exact = parts.withColumn("d", levenshtein(col("name"), lit(probe)))
      .collect().filter(r => !r.isNullAt(2) && r.getInt(2) <= 30)
      .map(_.getLong(0)).toSet
    assert(viaRule.nonEmpty && viaRule == exact)
  }

  test("projected distance values are never rewritten (exactness preserved)") {
    val projected = parts.select(levenshtein(col("name"), lit(probe)).as("d"))
    assert(boundedCount(projected.queryExecution.optimizedPlan) == 0)
  }

  test("strict < and flipped >= comparisons also rewrite, with matching row sets") {
    val lt = parts.filter(levenshtein(col("name"), lit(probe)) < 31)
    val flipped = parts.filter(lit(30) >= levenshtein(col("name"), lit(probe)))
    val flippedStrict = parts.filter(lit(31) > levenshtein(col("name"), lit(probe)))
    assert(boundedCount(lt.queryExecution.optimizedPlan) >= 1)
    assert(boundedCount(flipped.queryExecution.optimizedPlan) >= 1)
    assert(boundedCount(flippedStrict.queryExecution.optimizedPlan) >= 1)
    assert(lt.select("p_partkey").as[Long].collect().toSet ===
      flipped.select("p_partkey").as[Long].collect().toSet)
    assert(lt.select("p_partkey").as[Long].collect().toSet ===
      flippedStrict.select("p_partkey").as[Long].collect().toSet)
  }
}
