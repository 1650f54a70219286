package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** q225 (curation v3) invariants: its stage-3 survivor policy must
  * agree with q220 exactly (same clustering kernels, same
  * argmax(quality, doc_id) rule — verified on the FULL corpus where
  * both are defined), and the composed pipeline must differ from
  * q214 only through the survivor swap. */
class CurationV3Spec extends SparkSpec {
  import spark.implicits._

  test("stage-3 survivor filter == q220's is_survivor set on the same corpus") {
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val fromFilter = MixOps.qualityArgmaxSurvivors(d)
      .select("doc_id").as[Long].collect().toSet
    val fromReport = DedupOps.q220QualitySurvivor(spark, sfDir)
      .filter(col("is_survivor")).select("doc_id").as[Long].collect().toSet
    assert(fromFilter === fromReport)
    // the filter must actually drop something on this fixture —
    // otherwise the parity assertion is vacuous
    assert(fromFilter.size < d.count())
  }

  test("q225 output: distinct docs, valid packing, and the v2/v3 delta is the survivor policy") {
    val v3 = MixOps.q225CurationV3(spark, sfDir).collect()
    assert(v3.nonEmpty)
    val ids = v3.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === ids.length)
    // shard packing: shard_id non-decreasing in doc_id order (the
    // prefix sum orders by doc_id)
    val byDoc = v3.sortBy(_.getAs[Long]("doc_id"))
    val shards = byDoc.map(_.getAs[Long]("shard_id"))
    assert(shards.zip(shards.drop(1)).forall { case (a, b) => a <= b })
    // v3 survivors within a near-dup cluster need not be v2's min-id
    // pick; both pipelines share stages 1-2, so every v3 doc is
    // gate+decontamination-clean — i.e. it must appear in v2's
    // PRE-DEDUP universe. Cheap proxy: v2 and v3 agree on the
    // (source, lang) domain and on total uniqueness, and differ (or
    // not) only via survivor choice + its knock-on sampling rates.
    val v2 = MixOps.q214CurationV2(spark, sfDir).collect()
    val v2srcs = v2.map(r => (r.getAs[String]("source"), r.getAs[String]("lang"))).toSet
    val v3srcs = v3.map(r => (r.getAs[String]("source"), r.getAs[String]("lang"))).toSet
    assert(v3srcs.subsetOf(v2srcs))
    assert(v3.forall(_.getAs[String]("lang") == "en"))
  }
}
