package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media travels as an opaque `binary` column with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample
  * run as partition-local batch operators.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): [[FakeCodec]] is a clearly-marked deterministic stand-in
  * that derives "pixels" from the bytes. Everything AROUND the codec —
  * the schema contract, binary batching via mapPartitions, per-frame
  * explode, size-balanced repartitioning — is real, tested Spark
  * plumbing; swapping FakeCodec for a JNI/javacv decoder changes no
  * dataflow.
  *
  * Scale notes: blobs are the skew hazard (a 4 GB video next to 4 KB
  * thumbnails). [[repartitionBySize]] packs rows into byte-balanced
  * partitions so one executor never owns all the heavy blobs;
  * mapPartitions keeps decode allocation per-batch, not per-row.
  */
object Multimodal {

  case class MediaMeta(media_type: String, width: Int, height: Int,
                       duration_ms: Long, codec: String)
  case class MediaRow(media_id: Long, uri: String, meta: MediaMeta,
                      content: Array[Byte])
  case class MediaFeatures(media_id: Long, media_type: String,
                           decoded_ok: Boolean, byte_count: Int,
                           feature: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long,
                   frame_bytes: Array[Byte])

  /** STUB — deterministic fake codec. Replace with a real decoder
    * (e.g. javacv / libvips via JNI); the call sites only depend on
    * this signature. Features are dyadic-exact: integer byte-sums per
    * slot divided by 256 (a power of two), so the float32 division is
    * exact, any IEEE engine reproduces the value bit-for-bit, and
    * sums/averages of features downstream are order-independent
    * (each value is k/256 with k < 2^20 — no rounding anywhere). */
  object FakeCodec {
    def decodeFeature(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xFF)
        i += 1
      }
      acc.map(_ / 256.0f)
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      // fake: truncate/pad to w*h "pixels"
      java.util.Arrays.copyOf(bytes, w * h)
  }

  /** Deterministic synthetic media table: seeded binary blobs with
    * typed metadata — the fixture generator standing in for an object
    * store of real files. */
  def syntheticMedia(spark: SparkSession, n: Int = 100, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(seed + i) // per-row seed: order-independent
      val mtype = Seq("image", "audio", "video")(i % 3)
      val size = 256 + rnd.nextInt(4096)
      val bytes = new Array[Byte](size)
      rnd.nextBytes(bytes)
      MediaRow(i.toLong, s"mem://media/$mtype/$i",
        MediaMeta(mtype, 64 + (i % 8) * 16, 64 + (i % 8) * 16,
          if (mtype == "video") 1000L + i * 500L else 0L,
          if (mtype == "image") "fakepng" else if (mtype == "audio") "fakewav" else "fakemp4"),
        bytes)
    }
    rows.toDS()
  }

  /** Batched decode + feature extraction over the binary column.
    * mapPartitions = one decoder context per partition (the shape a
    * real codec needs), rows streamed through it. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (real codec handle)
      it.map { m =>
        val feat = FakeCodec.decodeFeature(m.content, dim)
        MediaFeatures(m.media_id, m.meta.media_type,
          decoded_ok = m.content.nonEmpty, m.content.length, feat)
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * at `intervalMs` — flatMap explode, no driver involvement. */
  def sampleFrames(media: Dataset[MediaRow], intervalMs: Long = 500L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.media_type == "video").flatMap { m =>
      val frames = (m.meta.duration_ms / intervalMs).toInt
      (0 until frames).map { f =>
        val tsMs = f * intervalMs
        // fake frame bytes: a deterministic slice of the blob
        val off = (tsMs % math.max(1, m.content.length - 16)).toInt
        Frame(m.media_id, f, tsMs,
          java.util.Arrays.copyOfRange(m.content, off, math.min(off + 16, m.content.length)))
      }
    }
  }

  /** Size-balanced repartitioning for skewed blob sizes: each output
    * partition receives ~equal total BYTES, not equal row counts.
    * The byte offsets come from the two-phase distributed prefix sum
    * (operators.PrefixSum) — per-partition subtotals + broadcast
    * offsets — so there is no unpartitioned window/rank and no task
    * ever sees more than its own slice, at any corpus size. A blob
    * heavier than one chunk overflows its own partition (a row cannot
    * split). `idCol` must be a unique column: it fixes the global
    * packing order. */
  def repartitionBySize(df: DataFrame, idCol: String, byteCol: String,
                        numPartitions: Int): DataFrame =
    graft.operators.PrefixSum.packTargets(df, idCol, byteCol, numPartitions)
      .repartitionByRange(numPartitions, col("_target"))
      .drop("_target")
}
