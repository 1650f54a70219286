package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Index lifecycle beyond the first build: (1) reuse must gate on the
  * completion marker + corpus fingerprint (aborted builds and
  * regenerated corpora force a rebuild instead of serving stale
  * lists), and (2) the frozen-codebook contract's retrain trigger —
  * a concentrated append inflates list-size skew past the threshold,
  * `rebuild` retrains the codebook from the persisted lists, skew
  * recovers, and recall against the brute-force ground truth on the
  * merged corpus does not regress. */
class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), Similarity.quantize(col("embedding")).as("query_vec"))

  test("isValid gates on completion marker and corpus fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("ivfvalid").toString
    val n = corpus.count()
    assert(!IvfIndex.isValid(spark, dir, n, 8), "empty dir must be invalid")
    IvfIndex.build(corpus, numCentroids = 8, dir)
    assert(IvfIndex.isValid(spark, dir, n, 8))
    assert(!IvfIndex.isValid(spark, dir, n + 1, 8),
      "regenerated corpus (different row count) must invalidate the index")
    assert(!IvfIndex.isValid(spark, dir, n, 16),
      "different codebook size must invalidate the index")
    // simulate an aborted build: lists exist but the marker is gone
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_GRAFT_BUILD_OK"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lists")))
    assert(!IvfIndex.isValid(spark, dir, n, 8),
      "lists without the marker (aborted build) must be invalid")
  }

  test("rebuild crash between its swap renames is repaired by reconcile (via isValid)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfswapcrash").toString + "/idx"
    IvfIndex.build(corpus, numCentroids = 8, dir)
    val n = corpus.count()
    val before = spark.read.parquet(s"$dir/lists")
      .agg(count(lit(1)), sum(col("vec_id"))).head()

    // crash in the window where the index exists ONLY at $dir.rebuild
    // (old renamed aside, new not yet renamed in) — the old shape
    // (delete-then-rename) made this window unrecoverable in code
    IvfIndex.failpointMidSwap = () => throw new RuntimeException("injected crash")
    try intercept[RuntimeException](IvfIndex.rebuild(spark, dir, numCentroids = 8))
    finally IvfIndex.failpointMidSwap = () => ()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_GRAFT_BUILD_OK")),
      "precondition: the crash left no completed index at the serving path")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.rebuild/_GRAFT_BUILD_OK")),
      "precondition: the rebuilt index is stranded at the tmp path")

    // the ensure gate self-heals: isValid reconciles (promotes the
    // stranded rebuild) and then reports a complete index
    assert(IvfIndex.isValid(spark, dir, n, 8),
      "isValid must promote the stranded rebuild and accept the index")
    val after = spark.read.parquet(s"$dir/lists")
      .agg(count(lit(1)), sum(col("vec_id"))).head()
    assert(after === before, "promoted index must carry the full corpus")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.rebuild")),
      "tmp dir must be consumed by the promotion")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir.old")),
      "the marker-bearing $dir.old sibling must be reaped on promotion — " +
        "left behind it is a stale valid index a later marker loss would " +
        "silently restore (round-10 advice)")
  }

  test("skewed append trips the retrain trigger; rebuild recovers skew without losing recall") {
    val dir = java.nio.file.Files.createTempDirectory("ivfskew").toString
    IvfIndex.build(corpus, numCentroids = 8, dir)
    val skew0 = IvfIndex.skewRatio(spark, dir)

    // A concentrated append: near-copies of the members of the
    // FULLEST existing list. Tiny offsets keep each copy's argmax on
    // the frozen codebook (the hot list balloons), but the members
    // are directionally DIVERSE — a retrained codebook draws several
    // centroids from inside the ballooned region and splits it.
    val hotCid = IvfIndex.listStats(spark, dir)
      .orderBy(col("list_rows").desc, col("cid").asc).head.getLong(0)
    val members = spark.read.parquet(s"$dir/lists")
      .filter(col("cid") === hotCid)
      .select("vec_id", "query_vec")
      .collect().map(_.getSeq[Long](1).toArray)
    val rnd = new scala.util.Random(7L)
    val appended = (0 until 1000).map { i =>
      val base = members(i % members.length)
      val v = base.indices.map(j => base(j) + (rnd.nextInt(41) - 20).toLong)
      (2000000L + i, v)
    }.toDF("vec_id", "query_vec")
    val cents = IvfIndex.centroids(spark, dir)
    IvfIndex.assignOnly(appended, cents)
      .write.partitionBy("cid").mode("append").parquet(s"$dir/lists")

    val skewHot = IvfIndex.skewRatio(spark, dir)
    assert(skewHot > skew0, s"append should raise skew ($skew0 -> $skewHot)")
    assert(IvfIndex.needsRetrain(spark, dir),
      s"concentrated append must trip the trigger (skew=$skewHot)")

    // recall before retrain, against brute force on the merged corpus
    val merged = spark.read.parquet(s"$dir/lists")
      .select(col("vec_id"), col("query_vec"))
    val qs = merged.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("query_vec").as("qvec"))
    def truth = Similarity.bruteForceTopK(merged, qs, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(hits: Set[(Long, Long)], t: Set[(Long, Long)]): Double =
      hits.intersect(t).size.toDouble / t.size
    val t0 = truth
    val mergedRows = merged.count()
    val qRows = qs.collect()
    val recallHot = recall(IvfIndex.topK(spark, dir, qs, k = 5, nprobe = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet, t0)

    IvfIndex.rebuild(spark, dir, numCentroids = 8)
    // pre-rebuild frames hold stale file listings; requery from rows
    val qs2 = spark.createDataFrame(
      spark.sparkContext.parallelize(qRows.toSeq), qs.schema)
    assert(IvfIndex.isValid(spark, dir, mergedRows, 8),
      "rebuild must land a complete, marker-stamped index")
    val skewAfter = IvfIndex.skewRatio(spark, dir)
    assert(skewAfter < skewHot * 0.75,
      s"retrain should materially reduce skew ($skewHot -> $skewAfter)")
    assert(!IvfIndex.needsRetrain(spark, dir),
      s"post-retrain skew must sit below the trigger (skew=$skewAfter)")
    val recallAfter = recall(IvfIndex.topK(spark, dir, qs2, k = 5, nprobe = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet, t0)
    assert(recallAfter >= recallHot - 0.05,
      s"retrain must not regress recall ($recallHot -> $recallAfter)")
    assert(recallAfter >= 0.7, s"post-retrain recall too low: $recallAfter")
  }
}
