package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("2-core strips chains/trees and keeps cycles") {
    // path 1-2-3-4-5 (tree: no 2-core) + triangle 10-11-12 (its own 2-core)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val core = KCore.peel(edges, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toSeq.sortBy(identity)
    assert(core === Seq((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("peel depth: a 2L-chain needs L rounds (endpoints only each round)") {
    val chain = (1L to 9L).sliding(2).map(p => (p.head, p.last)).toSeq.toDF("a", "b")
    // 8-edge path: rounds strip one edge per end → 4 rounds to empty
    assert(KCore.peel(chain, 2, 3).count() > 0)
    assert(KCore.peel(chain, 2, 4).count() === 0)
  }

  test("peelConverged early-exits at the fixpoint with output identical to fixed rounds") {
    // triangle (fixpoint after round 1 detected at round 2) + path
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val (core, rounds) = KCore.peelConverged(edges, k = 2, maxRounds = 50)
    assert(rounds < 50, "must exit early, not run out maxRounds")
    val got = core.as[(Long, Long)].collect().toSeq.sortBy(identity)
    val fixed = KCore.peel(edges, 2, rounds).as[(Long, Long)].collect().toSeq.sortBy(identity)
    assert(got === fixed)
    assert(got === Seq((10L, 11L), (10L, 12L), (11L, 12L)))
    // already-converged input exits after one confirming round
    val (_, r2) = KCore.peelConverged(core, k = 2, maxRounds = 50)
    assert(r2 === 1)
  }

  test("q203's fixture graph reaches its 2-core fixpoint within 12 rounds") {
    val d = Tables.documents(spark, sfDir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", k = 16, shingleN = 3)
    val cand = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 4)
    val edges = Dedup.verifyJaccard(cand, d, "doc_id", "text", shingleN = 3)
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    def pairs(rounds: Int) = KCore.peel(edges, 2, rounds)
      .as[(Long, Long)].collect().toSeq.sortBy(identity)
    // one extra round changes nothing → the 12-round constant is a
    // true fixpoint on this graph, not a truncation
    assert(pairs(12) === pairs(13))
  }
}
