package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two claims behind q125/q126 that the row-hash oracle states
  * only indirectly:
  *   - q125: the 3×3 grid probe is LOSSLESS — identical to the
  *     all-pairs join it replaces (the oracle compares against brute
  *     force at sf0.01; this pins the same equality in-engine).
  *   - q126: min-k union is exact — the sketch merged from daily
  *     sketches is element-identical to a sketch built directly from
  *     the week's rows, not merely a close estimate.
  */
class GridSketchSpec extends SparkSpec {

  test("q125: grid-blocked radius join equals the all-pairs join") {
    val grid = Breadth.q125RadiusJoin(spark, sfDir)
    val pts = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("id"),
      ((col("c_custkey") % 1000).cast("double") / 100.0).as("lat"),
      ((col("c_custkey") * 7 % 1000).cast("double") / 100.0).as("lon"))
    val dist = sqrt(
      (col("lat_a") - col("lat")) * (col("lat_a") - col("lat")) +
        (col("lon_a") - col("lon")) * (col("lon_a") - col("lon")))
    val brute = pts
      .select(col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"))
      .crossJoin(pts)
      .filter(col("id_a") < col("id") && dist <= 0.15)
      .select(col("id_a"), col("id").as("id_b"), round(dist, 6).as("dist_deg"))
    assert(grid.count() > 0, "no pairs within radius; vacuous fixture")
    assert(grid.exceptAll(brute).count() == 0, "grid emitted a non-neighbor pair")
    assert(brute.exceptAll(grid).count() == 0, "grid MISSED a true neighbor pair")
  }

  test("q126: sketch merged from daily sketches is identical to the direct weekly sketch") {
    val k = 256
    val ev = Tables.events(spark, sfDir).select(
      date_trunc("week", col("ts")).cast("date").as("week"),
      col("ts").cast("date").as("day"),
      md5(col("user_id").cast("string")).as("h"))
    val merged = ev.groupBy("week", "day")
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("sketch"))
      .groupBy("week")
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sketch"))))),
        1, k).as("merged"))
    val direct = ev.groupBy("week")
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("direct"))
    val joined = merged.join(direct, "week")
    assert(joined.count() > 0)
    val diverged = joined.filter(col("merged") =!= col("direct")).count()
    assert(diverged == 0, s"$diverged weeks where merged != direct sketch")
  }
}
