package graft.streaming

import graft.SparkSpec
import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF ingest: appended vectors land in the same inverted
  * lists the batch path assigns (stream ≡ batch), occupancy skew
  * from drifted appends fires the retrain trigger, and the rebuild
  * swap restores balance. */
class IvfStreamIngestSpec extends SparkSpec {
  import spark.implicits._

  // base corpus: 4 well-separated 2-d directions x 10 vectors each
  private def baseCorpus() = {
    val dirs = Seq(Seq(1000L, 0L), Seq(0L, 1000L), Seq(-1000L, 0L), Seq(0L, -1000L))
    (0 until 40).map { i =>
      val d = dirs(i % 4)
      (i.toLong, d.map(x => x + (i / 4).toLong)) // slight spread, same quadrant
    }.toDF("vec_id", "query_vec")
  }

  test("stream appends assign like batch, skewed drift trips the retrain trigger, rebuild recovers") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivf-stream").toString
    val path = s"$dir/index"
    IvfIndex.build(baseCorpus(), numCentroids = 4, path)
    val baseSkew = IvfIndex.skewRatio(spark, path)
    assert(baseSkew < 2.0, s"base corpus should be near-balanced, got $baseSkew")

    val events = scala.collection.mutable.ArrayBuffer.empty[IvfStreamIngest.SkewEvent]
    val mem = MemoryStream[(Long, Seq[Long])]
    val q = IvfStreamIngest.start(
      mem.toDF().toDF("vec_id", "query_vec"), path, maxSkew = 2.0,
      checkpoint = s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(10),
      onRetrain = events += _)
    try {
      // batch 1: balanced appends -> no trigger
      mem.addData((100L, Seq(900L, 50L)), (101L, Seq(40L, 900L)),
        (102L, Seq(-900L, 30L)), (103L, Seq(20L, -900L)))
      q.processAllAvailable()
      assert(events.isEmpty, s"balanced append must not trigger: $events")
      // stream ≡ batch: the streamed rows sit in the lists the batch
      // assignment computes for them
      val cents = IvfIndex.centroids(spark, path)
      val expected = IvfIndex.assignOnly(
        Seq((100L, Seq(900L, 50L)), (101L, Seq(40L, 900L)),
          (102L, Seq(-900L, 30L)), (103L, Seq(20L, -900L)))
          .toDF("vec_id", "query_vec"), cents)
        .select(col("vec_id"), col("cid")).as[(Long, Long)].collect().toMap
      val onDisk = spark.read.parquet(s"$path/lists")
        .filter(col("vec_id") >= 100L)
        .select(col("vec_id"), col("cid").cast("long")).as[(Long, Long)]
        .collect().toMap
      assert(onDisk === expected)

      // batch 2: drift — every vector piles into one quadrant
      mem.addData((200 until 260).map(i => (i.toLong, Seq(1000L + i, i.toLong))): _*)
      q.processAllAvailable()
      assert(events.nonEmpty, "drifted append must trip the skew trigger")
      assert(events.head.skewRatio > 2.0)
    } finally q.stop()

    // the triggered remedy: retrain from the persisted lists, skew drops
    val skewBefore = IvfIndex.skewRatio(spark, path)
    IvfIndex.rebuild(spark, path, numCentroids = 4)
    val skewAfter = IvfIndex.skewRatio(spark, path)
    assert(skewAfter < skewBefore,
      s"rebuild must rebalance: before=$skewBefore after=$skewAfter")
  }

  test("micro-batch replay after a torn publish appends exactly one copy") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-replay").toString
    val path = s"$dir/index"
    IvfIndex.build(baseCorpus(), numCentroids = 4, path)
    val cents = IvfIndex.centroids(spark, path)
    // four quadrants -> all 4 cids non-empty -> >= 4 staged files, so
    // a crash after 2 renames is guaranteed to be a PARTIAL publish
    val quad = Seq(Seq(900L, 10L), Seq(10L, 900L), Seq(-900L, 10L), Seq(10L, -900L))
    val batch = (100 until 120).map(i =>
      (i.toLong, quad(i % 4).map(_ + (i % 7).toLong)))
      .toDF("vec_id", "query_vec")

    // attempt 1 crashes mid-publish: some staged files renamed into
    // the lists, the rest stranded in staging — the torn-append
    // window a bare mode(Append) replay would double up on
    IvfStreamIngest.failpointMidPublish = moved =>
      if (moved == 2) throw new RuntimeException("injected crash")
    try intercept[RuntimeException](
      IvfStreamIngest.appendBatch(spark, batch, cents, path, batchId = 7L))
    finally IvfStreamIngest.failpointMidPublish = _ => ()
    val torn = spark.read.parquet(s"$path/lists")
      .filter(col("vec_id") >= 100L).count()
    assert(torn > 0 && torn < 20,
      s"precondition: the crash must leave a PARTIAL publish, got $torn of 20")

    // replay (what Structured Streaming does after recovery): the
    // batch-id-keyed cleanup removes the torn files, then republishes
    IvfStreamIngest.appendBatch(spark, batch, cents, path, batchId = 7L)
    val rows = spark.read.parquet(s"$path/lists").filter(col("vec_id") >= 100L)
    assert(rows.count() === 20L, "replay must converge to exactly one copy")
    assert(rows.select("vec_id").distinct().count() === 20L)
    // and the replayed rows sit in the lists the batch path assigns
    import spark.implicits._
    val expected = IvfIndex.assignOnly(batch, cents)
      .select(col("vec_id"), col("cid")).as[(Long, Long)].collect().toMap
    val onDisk = rows.select(col("vec_id"), col("cid").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(onDisk === expected)

    // a SECOND replay of an already-complete batch is also a no-op
    // in effect (delete + republish the same 20 rows)
    IvfStreamIngest.appendBatch(spark, batch, cents, path, batchId = 7L)
    assert(spark.read.parquet(s"$path/lists")
      .filter(col("vec_id") >= 100L).count() === 20L)
  }
}
