package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skyline (2-D Pareto frontier): the two-phase operator must equal
  * the brute-force dominance definition at any partition count —
  * that equality IS the claim that the per-ord max + exclusive
  * running max decomposition loses nothing.
  */
class SkylineSpec extends SparkSpec {

  import spark.implicits._

  // (id, ord, value): minimize ord, maximize value
  private val pts = Seq(
    (1L, 10L, 5.0), // frontier: first ord
    (2L, 10L, 3.0), // dominated at same ord by id 1
    (3L, 12L, 7.0), // frontier: beats everything before it
    (4L, 12L, 7.0), // duplicate (ord,value) of id 3 — both survive
    (5L, 15L, 7.0), // dominated: id 3 has smaller ord, equal value
    (6L, 20L, 9.0), // frontier
    (7L, 25L, 9.0), // dominated by id 6 (earlier, equal)
    (8L, 30L, 1.0), // dominated by everyone earlier with higher value
    (9L, 31L, 9.5)) // frontier: latest but highest

  private def bruteForce(rows: Seq[(Long, Long, Double)]): Set[Long] =
    rows.filter { case (_, o, v) =>
      !rows.exists { case (_, o2, v2) =>
        o2 <= o && v2 >= v && (o2 < o || v2 > v)
      }
    }.map(_._1).toSet

  test("skyline equals the brute-force dominance definition") {
    val df = pts.toDF("id", "ord", "value")
    val got = Skyline.paretoMinMax(df, "ord", "value")
      .select("id").as[Long].collect().toSet
    assert(got === bruteForce(pts))
    assert(got === Set(1L, 3L, 4L, 6L, 9L))
  }

  test("partition-count invariance (1, 3, 8 partitions)") {
    val df = pts.toDF("id", "ord", "value")
    val expected = bruteForce(pts)
    for (n <- Seq(1, 3, 8)) {
      val got = Skyline.paretoMinMax(df, "ord", "value", numPartitions = n)
        .select("id").as[Long].collect().toSet
      assert(got === expected, s"numPartitions=$n")
    }
  }

  test("randomized: matches brute force on 300 md5-derived points") {
    // deterministic pseudo-random points via md5 on Spark, same rows
    // local — exercises hot ord-key collisions and value ties
    val df = spark.range(300)
      .select(col("id"),
        (conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 40).as("ord"),
        ((conv(substring(md5(col("id").cast("string")), 5, 4), 16, 10)
          .cast("long") % 17).cast("double") / 2.0).as("value"))
    val rows = df.as[(Long, Long, Double)].collect().toSeq
    val got = Skyline.paretoMinMax(df, "ord", "value")
      .select("id").as[Long].collect().toSet
    assert(got === bruteForce(rows))
    assert(got.nonEmpty)
  }
}
