package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media travels as an opaque `binary` column with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample
  * run as partition-local batch operators.
  *
  * The codec layer is REAL, pure-JVM, and dependency-free ([[Codec]]):
  * BMP for images, RIFF/WAVE PCM for audio, YUV4MPEG2 (Y4M) for video
  * — three public-domain containers parsed header-and-payload. The
  * fixture generator writes genuine files in those formats, decode
  * sniffs the container magic, and frame sampling extracts actual Y4M
  * frame planes. Heavier formats (JPEG, MP4/H.264) would slot in
  * behind the same Option-returning signatures via JNI/javacv.
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

  /** Deterministic synthetic media table: seeded blobs in REAL
    * container formats (BMP / WAV / Y4M) with matching typed
    * metadata — the fixture generator standing in for an object store
    * of real files. Image widths are multiples of 4 so BMP scanlines
    * carry no padding (keeps the SQL oracle's offset arithmetic
    * trivial); videos run at 2 fps so each frame displays for exactly
    * 500 ms. */
  def syntheticMedia(spark: SparkSession, n: Int = 100, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(seed + i) // per-row seed: order-independent
      Seq("image", "audio", "video")(i % 3) match {
        case "image" =>
          val w = 8 + (i % 8) * 4
          val bgr = new Array[Byte](w * w * 3)
          rnd.nextBytes(bgr)
          MediaRow(i.toLong, s"mem://media/image/$i.bmp",
            MediaMeta("image", w, w, 0L, "bmp"),
            Codec.encodeBmp(w, w, bgr, topDown = true))
        case "audio" =>
          val nSamples = 128 + rnd.nextInt(2048)
          val pcm = new Array[Byte](2 * nSamples)
          rnd.nextBytes(pcm)
          MediaRow(i.toLong, s"mem://media/audio/$i.wav",
            MediaMeta("audio", 0, 0, nSamples * 1000L / 8000L, "pcm_s16le"),
            Codec.encodeWav(channels = 1, sampleRate = 8000, pcm))
        case _ =>
          val durationMs = 1000L + (i % 40) * 500L
          val nFrames = (durationMs / 500L).toInt // 2 fps
          val fs = Codec.y4mFrameSize(8, 8)
          val frames = Seq.fill(nFrames) {
            val f = new Array[Byte](fs); rnd.nextBytes(f); f
          }
          MediaRow(i.toLong, s"mem://media/video/$i.y4m",
            MediaMeta("video", 8, 8, durationMs, "y4m"),
            Codec.encodeY4m(8, 8, fpsNum = 2, fpsDen = 1, frames))
      }
    }
    rows.toDS()
  }

  /** Batched decode + feature extraction over the binary column: the
    * container is sniffed from its magic, the payload (pixels / PCM /
    * frame planes) feeds the feature. mapPartitions = one decoder
    * context per partition, rows streamed through it. Undecodable
    * rows surface as decoded_ok=false with a zero feature — never an
    * exception from deep inside a task. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        Codec.decodeFeature(m.content, dim) match {
          case Some(feat) =>
            MediaFeatures(m.media_id, m.meta.media_type,
              decoded_ok = true, m.content.length, feat)
          case None =>
            MediaFeatures(m.media_id, m.meta.media_type,
              decoded_ok = false, m.content.length, new Array[Float](dim))
        }
      }
    }
  }

  /** Frame sampling for video rows: decodes the Y4M container and
    * emits, for every `intervalMs` tick inside the clip, the frame
    * on display at that tick (idx = tick / frameMs) — so the sample
    * count is duration/intervalMs at ANY frame rate, not only rates
    * whose frame duration divides the interval (a modulo-grid test
    * would emit half the frames at 25 fps and only frame 0 at NTSC
    * rates). ts_ms is the tick (sample time); frame_idx is the source
    * frame index, repeated when sampling faster than the frame rate.
    * Real frame planes, flatMap explode, no driver involvement;
    * undecodable videos emit no rows. */
  def sampleFrames(media: Dataset[MediaRow], intervalMs: Long = 500L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.media_type == "video").flatMap { m =>
      Codec.decodeY4m(m.content).toSeq.flatMap { y =>
        val frameMs = y.frameMs
        val durationMs = y.frames.size * frameMs
        (0L until durationMs by intervalMs).map { tick =>
          val idx = (tick / frameMs).toInt
          Frame(m.media_id, idx, tick, y.frames(idx))
        }
      }
    }
  }

  case class ImageHash(media_id: Long, dhash: Long)

  /** 64-bit difference hash (dHash) of a decoded BGR image — the
    * standard perceptual fingerprint for image near-dup detection
    * (Krawetz 2013 "Kind of Like That"; the image-modality analogue
    * of SimHash for text). The image is sampled on a 9×8 grid by
    * nearest neighbor (sx = x·W/9, sy = y·H/8 — integer division,
    * matching [[Codec.resizeBmp]]'s kernel), grayscale is the raw
    * channel sum b+g+r (order-preserving, division-free, so the
    * DuckDB oracle replays it in exact integers), and bit (y·8+x)
    * is set iff gray(x+1,y) > gray(x,y). Row-adjacent gradients are
    * invariant to uniform brightness shifts and compress JPEG-ish
    * perturbations into a few flipped bits — near-dups land within
    * a small Hamming radius and pigeonhole banding
    * ([[graft.operators.Dedup.simhashNearDups]]) finds every pair
    * at radius ≤ 7 with zero false negatives. */
  def dhash64(width: Int, height: Int, bgr: Array[Byte]): Long = {
    val grays = new Array[Int](9 * 8)
    var gy = 0
    while (gy < 8) {
      val sy = gy * height / 8
      var gx = 0
      while (gx < 9) {
        val sx = gx * width / 9
        val o = (sy * width + sx) * 3
        grays(gy * 9 + gx) =
          (bgr(o) & 0xFF) + (bgr(o + 1) & 0xFF) + (bgr(o + 2) & 0xFF)
        gx += 1
      }
      gy += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) {
      val x = k % 8
      val y = k / 8
      if (grays(y * 9 + x + 1) > grays(y * 9 + x)) h |= (1L << k)
      k += 1
    }
    h
  }

  /** Per-image dHash over the binary column: BMP rows decode through
    * the real codec; non-image or undecodable rows are dropped (the
    * hash of garbage is noise, not signal). mapPartitions batch
    * decode, same shape as [[extractFeatures]]. */
  def imageDhash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.media_type == "image").mapPartitions { it =>
      it.flatMap { m =>
        Codec.decodeBmp(m.content).map { bmp =>
          ImageHash(m.media_id, dhash64(bmp.width, bmp.height, bmp.pixels))
        }
      }
    }
  }

  /** Deterministic image fixture WITH planted near-duplicates, for
    * perceptual dedup: groups of 4 where i%4 picks the variant —
    * 0 = base (random 16×16 BGR, channels in 16..231); 1 = noisy
    * copy (3 seeded grid-sampled pixels forced to an extreme — each
    * touches ≤2 comparison bits, so Hamming ≤ 6, inside the banding
    * guarantee); 2 = uniform brightness +8 on every channel (no
    * clipping by construction — dHash-invariant, byte-different);
    * 3 = an INDEPENDENT random image (the negative control). Every
    * group is derived from its own seed, so content is
    * order-independent and the parquet fixture is bit-stable across
    * runs. */
  def syntheticImageDups(spark: SparkSession, n: Int, seed: Long = 97L): Dataset[MediaRow] = {
    import spark.implicits._
    val w = 16
    val rows = (0 until n).map { i =>
      val g = i / 4
      val base = {
        val rnd = new scala.util.Random(seed + 1000L * g)
        Array.fill(w * w * 3)((16 + rnd.nextInt(216)).toByte)
      }
      val bgr = i % 4 match {
        case 0 => base
        case 1 =>
          val rnd = new scala.util.Random(seed + 1000L * g + 3L)
          val noisy = base.clone()
          (0 until 3).foreach { _ =>
            // a grid-sampled position (the only pixels dHash reads)
            val sx = (1 + rnd.nextInt(8)) * w / 9
            val sy = rnd.nextInt(8) * w / 8
            val o = (sy * w + sx) * 3
            noisy(o) = 250.toByte; noisy(o + 1) = 250.toByte; noisy(o + 2) = 250.toByte
          }
          noisy
        case 2 => base.map(b => ((b & 0xFF) + 8).toByte)
        case _ =>
          val rnd = new scala.util.Random(seed + 1000L * g + 7L)
          Array.fill(w * w * 3)((16 + rnd.nextInt(216)).toByte)
      }
      MediaRow(i.toLong, s"mem://media/dups/$i.bmp",
        MediaMeta("image", w, w, 0L, "bmp"),
        Codec.encodeBmp(w, w, bgr, topDown = true))
    }
    rows.toDS()
  }

  case class SceneDiff(media_id: Long, frame_idx: Int, ts_ms: Long,
                       sad: Long, is_cut: Boolean)

  /** Scene-structured synthetic videos for cut detection: each clip
    * is 8×8 C420 Y4M at 2 fps with 8 + i%20 frames; within a scene
    * every frame is the scene's base plane plus ±1 per-byte jitter
    * (SAD against the previous frame stays ≤ ySize), and a scene CUT
    * replaces the base with an independent random plane (expected
    * per-pixel |Δ| of two uniform bytes ≈ 85, SAD ≈ 85·ySize — two
    * orders above the jitter band, so the 16·ySize threshold cleanly
    * separates). Cut positions are seeded per clip (≈ every 4th
    * frame); all content derives from (seed, i), so the parquet
    * fixture is bit-stable across runs. */
  def syntheticScenes(spark: SparkSession, n: Int, seed: Long = 131L): Dataset[MediaRow] = {
    import spark.implicits._
    val w = 8; val h = 8
    val fs = Codec.y4mFrameSize(w, h)
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(seed + i)
      val nFrames = 8 + i % 20
      var base = { val b = new Array[Byte](fs); rnd.nextBytes(b); b }
      val frames = (0 until nFrames).map { k =>
        if (k > 0 && rnd.nextInt(4) == 0) { // scene cut
          base = { val b = new Array[Byte](fs); rnd.nextBytes(b); b }
        }
        base.map { b =>
          val v = (b & 0xFF) + rnd.nextInt(3) - 1
          math.max(0, math.min(255, v)).toByte
        }
      }
      MediaRow(i.toLong, s"mem://media/scenes/$i.y4m",
        MediaMeta("video", w, h, nFrames * 500L, "y4m"),
        Codec.encodeY4m(w, h, fpsNum = 2, fpsDen = 1, frames))
    }
    rows.toDS()
  }

  /** Scene-cut detection: per consecutive frame pair, the sum of
    * absolute Y-plane differences (SAD — the standard first-pass
    * shot-boundary feature, cf. ffmpeg's scene-change score and
    * PySceneDetect's content detector, both thresholded frame
    * deltas); a pair is a CUT when SAD exceeds 16 gray levels per
    * pixel (16·w·h). Integer arithmetic end to end, so the DuckDB
    * oracle replays the exact SADs from the blob's hex dump.
    * mapPartitions decode, flatMap explode — no driver involvement;
    * undecodable or single-frame clips emit no rows. */
  def sceneDiffs(media: Dataset[MediaRow]): Dataset[SceneDiff] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.media_type == "video").flatMap { m =>
      Codec.decodeY4m(m.content).toSeq.flatMap { y =>
        val ySize = y.width * y.height
        val cutSad = 16L * ySize
        (1 until y.frames.size).map { k =>
          val prev = y.frames(k - 1); val cur = y.frames(k)
          var sad = 0L; var p = 0
          while (p < ySize) {
            sad += math.abs((cur(p) & 0xFF) - (prev(p) & 0xFF)); p += 1
          }
          SceneDiff(m.media_id, k, k * y.frameMs, sad, sad > cutSad)
        }
      }
    }
  }

  case class AudioQa(media_id: Long, n_samples: Int, n_clipped: Long,
                     sum_sq: Long, max_abs: Int, longest_silence: Int)

  /** QA-structured synthetic audio: 8 kHz mono PCM16 WAV clips with a
    * PLANTED leading silence section (±2 dither), a noise body
    * (|s| ≤ 20000), and — on every third clip — a 10-sample full-scale
    * clipping burst (±32767/−32768). Sample counts are multiples of 8
    * so duration_ms·8 recovers them exactly (the oracle derives n from
    * the typed metadata). All content derives from (seed, i). */
  def syntheticAudioQa(spark: SparkSession, n: Int, seed: Long = 173L): Dataset[MediaRow] = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(seed + i)
      val nSamples = 400 + (i % 5) * 80
      val silLen = 50 + rnd.nextInt(100)
      val s = new Array[Short](nSamples)
      var k = 0
      while (k < nSamples) {
        s(k) = if (k < silLen) (rnd.nextInt(5) - 2).toShort
          else (rnd.nextInt(40001) - 20000).toShort
        k += 1
      }
      if (i % 3 == 0) {
        val p = silLen + 20 + rnd.nextInt(nSamples - silLen - 40)
        (0 until 10).foreach { j =>
          s(p + j) = if (j % 2 == 0) 32767.toShort else (-32768).toShort
        }
      }
      val bytes = new Array[Byte](2 * nSamples)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      s.foreach(bb.putShort)
      MediaRow(i.toLong, s"mem://media/audioqa/$i.wav",
        MediaMeta("audio", 0, 0, nSamples / 8L, "pcm_s16le"),
        Codec.encodeWav(channels = 1, sampleRate = 8000, bytes))
    }
    rows.toDS()
  }

  /** Per-clip audio QA panel — the audio modality's curation gate
    * (clipping and silence are the standard reject signals in speech
    * corpus pipelines, cf. librosa/ffmpeg silencedetect + astats
    * clip counts): clipped-sample count (|s| ≥ 32760), energy as the
    * exact integer sum of squares (no float RMS — the oracle replays
    * it exactly), max |s|, and the longest silence run (|s| ≤ 2).
    * mapPartitions decode; integer arithmetic end to end. */
  def audioQa(media: Dataset[MediaRow]): Dataset[AudioQa] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.media_type == "audio").flatMap { m =>
      Codec.decodeWav(m.content).toSeq.map { w =>
        val s = w.samples
        var clipped = 0L; var sumSq = 0L; var maxAbs = 0
        var run = 0; var best = 0
        var k = 0
        while (k < s.length) {
          val v = s(k).toInt
          val a = math.abs(v)
          if (a >= 32760) clipped += 1
          sumSq += v.toLong * v.toLong
          if (a > maxAbs) maxAbs = a
          if (a <= 2) { run += 1; if (run > best) best = run }
          else run = 0
          k += 1
        }
        AudioQa(m.media_id, s.length, clipped, sumSq, maxAbs, best)
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
    * packing order.
    *
    * Placement is an exact identity partitioner over `_target`, NOT
    * `repartitionByRange`: the range partitioner balances sampled ROW
    * counts, so byte-balanced buckets with skewed row counts (many
    * thumbnails vs few videos) can get merged into one partition —
    * exactly the hot-executor outcome this operator exists to
    * prevent. The RDD hop costs one serialization pass; the next
    * operator over blob content pays that anyway. */
  def repartitionBySize(df: DataFrame, idCol: String, byteCol: String,
                        numPartitions: Int): DataFrame = {
    val t = graft.operators.PrefixSum.packTargets(df, idCol, byteCol, numPartitions)
    val tIdx = t.schema.fieldIndex("_target")
    val np = numPartitions
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = np
      override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
    }
    val rdd = t.rdd.map(r => (r.getLong(tIdx), r)).partitionBy(part).values
    df.sparkSession.createDataFrame(rdd, t.schema).drop("_target")
  }
}
