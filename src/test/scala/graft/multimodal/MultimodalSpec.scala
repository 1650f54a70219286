package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary schema contract: content is BinaryType with typed metadata struct") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val schema = media.toDF().schema
    assert(schema("content").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
  }

  test("feature extraction: one row per media, deterministic features") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === 30)
    assert(f1.forall(_.feature.length === 8))
    assert(f1.forall(_.decoded_ok))
    f1.zip(f2).foreach { case (a, b) => assert(a.feature.sameElements(b.feature)) }
  }

  test("feature extraction is partition-count independent") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val a = Multimodal.extractFeatures(media.repartition(1)).collect()
      .sortBy(_.media_id).map(_.feature.toSeq)
    val b = Multimodal.extractFeatures(media.repartition(7)).collect()
      .sortBy(_.media_id).map(_.feature.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling: duration/interval frames per video, monotone timestamps") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, intervalMs = 500).collect()
    val videos = media.filter(_.meta.media_type == "video").collect()
    val expected = videos.map(v => (v.meta.duration_ms / 500).toInt).sum
    assert(frames.length === expected)
    frames.groupBy(_.media_id).values.foreach { fs =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.ts_ms).toSeq === sorted.indices.map(_ * 500L))
    }
  }

  test("repartitionBySize balances byte budget across partitions") {
    val media = Multimodal.syntheticMedia(spark, 100).toDF()
      .withColumn("byte_count", length(col("content")))
    val parts = Multimodal.repartitionBySize(media, "media_id", "byte_count", 4)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(sum("byte_count").as("bytes"))
      .select("bytes").as[Long].collect()
    assert(parts.length === 4)
    val (mx, mn) = (parts.max.toDouble, parts.min.toDouble)
    assert(mx / mn < 1.6, s"partition byte skew too high: $mx vs $mn")
  }
}
