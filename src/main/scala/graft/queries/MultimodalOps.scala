package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries over synthetic binary media (rows-only:
  * inputs are generated binaries, decode is the documented FakeCodec
  * stub — see graft.multimodal.Multimodal).
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  private def mediaCount(dir: String): Int =
    if (dir.contains("sf0.1")) 3000 else if (dir.contains("sf0.01")) 300 else 100

  /** Binary decode → per-media feature rows, aggregated per type. */
  def q70MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(s, mediaCount(dir))
    Multimodal.extractFeatures(media).toDF()
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("media_count"),
        sum("byte_count").as("total_bytes"),
        round(avg(element_at(col("feature"), 1)), 6).as("avg_feature_0"))
      .orderBy("media_type")
  }

  /** Video frame sampling: frames exploded per media at 500 ms. */
  def q71FrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(s, mediaCount(dir))
    Multimodal.sampleFrames(media, intervalMs = 500).toDF()
      .groupBy("media_id")
      .agg(count(lit(1)).as("frame_count"), max("ts_ms").as("last_frame_ts_ms"))
      .orderBy("media_id")
  }

  val queries: Map[String, Q] = Map(
    "q70_media_features" -> q70MediaFeatures _,
    "q71_frame_sample" -> q71FrameSample _,
  )
  val oracles: Map[String, String] = Map.empty
}
