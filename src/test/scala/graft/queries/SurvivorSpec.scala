package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for q220's quality-argmax survivor selection (the
  * DuckDB oracle certifies sf0.01 end to end; these pin the policy
  * laws on sf0.001 and the label agreement with q77's clustering). */
class SurvivorSpec extends SparkSpec {

  private lazy val rows = DedupOps.q220QualitySurvivor(spark, sfDir).collect()

  test("q220: exactly one survivor per cluster, and it is the quality argmax") {
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, docs) =>
      val survivors = docs.filter(_.getAs[Boolean]("is_survivor"))
      assert(survivors.length === 1, s"cluster $cid survivor count")
      val best = docs.minBy(r =>
        (-r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
      assert(survivors.head.getAs[Long]("doc_id") === best.getAs[Long]("doc_id"))
      assert(docs.forall(_.getAs[Long]("cluster_size") === docs.length.toLong))
    }
  }

  test("q220: covers the whole corpus and agrees with q77 on cluster labels") {
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong === n)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length.toLong === n)
    // q77 labels only clustered (non-singleton-component) docs; q220
    // must carry the identical labels for that subset
    val q77 = DedupOps.q77DedupClusters(spark, sfDir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q220 = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    q77.foreach { case (doc, cid) => assert(q220(doc) === cid) }
    assert(q77.nonEmpty, "fixture has no near-dup clusters to select over")
  }
}
