package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic synchronous LPA on a hand-computed fixture: two
  * triangles {1,2,3} and {4,5,6} joined by the bridge (3,4). The
  * trajectory (min-label ties, neighbors-only update) settles by
  * round 4 at communities {1,2,3}→1 and {4,5,6}→3 — while connected
  * components would merge everything across the bridge into ONE
  * component, which is exactly the distinction q213 exists for. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L),
    (3L, 4L)).toDF("a", "b")

  test("bridged triangles: LPA separates the sides CC would merge") {
    val got = LabelProp.run(edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    val cc = Dedup.connectedComponents(
        edges.select(col("a").as("id_a"), col("b").as("id_b")))
      .select("cluster_id").distinct().count()
    assert(cc === 1L, "fixture must be one connected component")
  }

  test("earlyStop returns the fixed-round result and edge direction is irrelevant") {
    val fixed = LabelProp.run(edges, rounds = 10)
      .as[(Long, Long)].collect().toSet
    val early = LabelProp.run(edges, rounds = 10, earlyStop = true)
      .as[(Long, Long)].collect().toSet
    assert(early === fixed)
    val flipped = LabelProp.run(
        edges.select(col("b").as("a"), col("a").as("b")), rounds = 10)
      .as[(Long, Long)].collect().toSet
    assert(flipped === fixed)
  }
}
