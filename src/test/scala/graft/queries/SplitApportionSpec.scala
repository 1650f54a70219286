package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Properties of the split/apportionment queries that the row-hash
  * oracle can't state directly:
  *   - q122: the split is leakage-free BY CONSTRUCTION — no verified
  *     near-dup pair may straddle a train/val/test boundary, and no
  *     exact-dup pair either (exact dups are Jaccard-1 near dups).
  *   - q124: Hamilton apportionment sums to EXACTLY the budget, and
  *     every source's allocation is its exact proportional share
  *     floored or floored+1 (the "quota rule").
  */
class SplitApportionSpec extends SparkSpec {
  import spark.implicits._

  test("q122: no near-dup pair straddles a split boundary") {
    val split = DedupOps.q122LeakageSplit(spark, sfDir)
      .select("doc_id", "split")
    val d = Tables.documents(spark, sfDir)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", k = 16, shingleN = 3)
    val cand = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 4)
    val pairs = Dedup.verifyJaccard(cand, d, "doc_id", "text", shingleN = 3)
      .filter(col("jaccard") >= 0.2)
      .select("id_a", "id_b")
    assert(pairs.count() > 0, "fixture has no near-dup pairs; vacuous test")
    val straddlers = pairs
      .join(split.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "split_a"), "id_a")
      .join(split.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "split_b"), "id_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(straddlers.count() == 0,
      s"near-dup pairs crossing splits: ${straddlers.collect().mkString(", ")}")
  }

  test("q122: every document is assigned exactly one split") {
    val split = DedupOps.q122LeakageSplit(spark, sfDir)
    val total = Tables.documents(spark, sfDir).count()
    assert(split.count() == total)
    assert(split.select("doc_id").distinct().count() == total)
    val splits = split.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("q124: allocations sum to exactly the budget and obey the quota rule") {
    val picks = CurationOps.q124QuotaApportion(spark, sfDir)
    assert(picks.count() == 200, "picks must sum to exactly the budget")
    // per-source allocation = floor(exact share) or floor + 1
    val counts = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n")).as[Long].head()
    val allocBySource = picks.groupBy("source")
      .agg(max("alloc").as("alloc"), count(lit(1)).as("picked"))
      .join(counts, "source")
      .as[(String, Long, Long, Long)].collect()
    allocBySource.foreach { case (source, alloc, picked, n) =>
      assert(picked == alloc, s"$source: picked $picked != alloc $alloc")
      val floorShare = 200L * n / total
      assert(alloc == floorShare || alloc == floorShare + 1,
        s"$source: alloc $alloc violates quota rule (floor share $floorShare)")
    }
  }

  test("q123: merged partials equal the single-pass rollup") {
    val merged = ScaleOps.q123IncrementalRollup(spark, sfDir)
    val single = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("event_date"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy("event_type", "event_date")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v")).cast("double").as("value_sum"),
        (sum(col("v")).cast("double") / count(lit(1))).cast("double").as("value_avg"),
        min(col("v")).cast("double").as("value_min"),
        max(col("v")).cast("double").as("value_max"))
    assert(merged.exceptAll(single).count() == 0 &&
      single.exceptAll(merged).count() == 0,
      "incremental merge diverged from single-pass rollup")
    assert(merged.count() > 0)
  }
}
