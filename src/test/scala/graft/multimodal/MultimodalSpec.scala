package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("BMP: hand-built bottom-up padded file decodes byte-exactly") {
    // 3x2 bottom-up BMP built by hand: row size 3*3=9 → padded to 12.
    // logical top-down pixels (BGR): row0 = A B C, row1 = D E F
    val px = Array[Array[Byte]](
      Array(1, 2, 3), Array(4, 5, 6), Array(7, 8, 9),        // row 0
      Array(10, 11, 12), Array(13, 14, 15), Array(16, 17, 18)) // row 1
    val buf = java.nio.ByteBuffer.allocate(54 + 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + 24).putInt(0).putInt(54)
    buf.putInt(40).putInt(3).putInt(2) // width 3, height +2 = bottom-up
    buf.putShort(1).putShort(24).putInt(0).putInt(24)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    // file stores BOTTOM row first, 3 pad bytes per row
    buf.put(px(3)).put(px(4)).put(px(5)).put(Array[Byte](0, 0, 0))
    buf.put(px(0)).put(px(1)).put(px(2)).put(Array[Byte](0, 0, 0))
    val decoded = Codec.decodeBmp(buf.array()).get
    assert(decoded.width === 3 && decoded.height === 2 && !decoded.topDown)
    // decode normalizes to logical top-down order, padding stripped
    assert(decoded.pixels.toSeq === px.flatten.toSeq)
  }

  test("BMP: encode/decode round-trip in both scanline orders; resize picks real pixels") {
    val bgr = Array.tabulate(4 * 4 * 3)(i => (i * 7).toByte)
    for (topDown <- Seq(true, false)) {
      val enc = Codec.encodeBmp(4, 4, bgr, topDown)
      val dec = Codec.decodeBmp(enc).get
      assert(dec.pixels.toSeq === bgr.toSeq, s"topDown=$topDown")
    }
    val resized = Codec.resizeBmp(Codec.encodeBmp(4, 4, bgr), 2, 2).get
    val dec2 = Codec.decodeBmp(resized).get
    // nearest-neighbor at 2x downscale: source pixel (2x, 2y)
    val expected = for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3)
      yield bgr((2 * y * 4 + 2 * x) * 3 + c)
    assert(dec2.pixels.toSeq === expected)
  }

  test("BMP: randomized round-trips across widths exercise every padding remainder (0-3 bytes)") {
    val rnd = new scala.util.Random(11)
    for (w <- 1 to 9; topDown <- Seq(true, false)) {
      val h = 1 + rnd.nextInt(4)
      val bgr = new Array[Byte](w * h * 3)
      rnd.nextBytes(bgr)
      val dec = Codec.decodeBmp(Codec.encodeBmp(w, h, bgr, topDown)).get
      assert(dec.width === w && dec.height === h)
      assert(dec.pixels.toSeq === bgr.toSeq, s"w=$w h=$h topDown=$topDown")
    }
  }

  test("WAV: canonical file decodes to the exact PCM payload; chunk walk skips extras") {
    val pcm = Array.tabulate(32)(i => (i * 13).toByte)
    val wav = Codec.decodeWav(Codec.encodeWav(1, 8000, pcm)).get
    assert(wav.channels === 1 && wav.sampleRate === 8000 && wav.bitsPerSample === 16)
    assert(wav.data.toSeq === pcm.toSeq)
    assert(wav.samples.length === 16)
    assert(wav.samples(1) === ((pcm(2) & 0xFF) | (pcm(3) << 8)).toShort)
    // insert a LIST chunk between fmt and data: decoder must skip it
    val canonical = Codec.encodeWav(1, 8000, pcm)
    val extra = java.nio.ByteBuffer.allocate(canonical.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(canonical, 0, 36)                        // up to end of fmt
    extra.put("LIST".getBytes("US-ASCII")).putInt(4)
    extra.put("INFO".getBytes("US-ASCII"))
    extra.put(canonical, 36, canonical.length - 36)    // data chunk
    val wav2 = Codec.decodeWav(extra.array()).get
    assert(wav2.data.toSeq === pcm.toSeq)
  }

  test("Y4M: round-trip preserves frame planes; corrupt inputs decode to None") {
    val fs = Codec.y4mFrameSize(8, 8)
    assert(fs === 96)
    val frames = Seq.tabulate(3)(f => Array.tabulate(fs)(i => (f * 31 + i).toByte))
    val enc = Codec.encodeY4m(8, 8, 2, 1, frames)
    val dec = Codec.decodeY4m(enc).get
    assert(dec.width === 8 && dec.height === 8 && dec.frameMs === 500L)
    assert(dec.frames.size === 3)
    dec.frames.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // corrupt/unknown inputs: None, never an exception
    assert(Codec.decodeY4m(enc.dropRight(10)).isEmpty)      // truncated frame
    assert(Codec.decodeY4m("YUV4MPEG3".getBytes ++ enc.drop(9)).isEmpty)
    assert(Codec.decodePayload(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Codec.decodeBmp(Array.fill[Byte](60)('B')).isEmpty)
    assert(Codec.decodeWav("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(0)).isEmpty)
  }

  test("decodeFeature: slot sums over the decoded payload, not the container bytes") {
    val pcm = Array.tabulate(64)(i => (i * 3).toByte)
    val feat = Codec.decodeFeature(Codec.encodeWav(1, 8000, pcm), dim = 8).get
    val manual = new Array[Long](8)
    pcm.zipWithIndex.foreach { case (b, i) => manual(i % 8) += (b & 0xFF) }
    assert(feat.toSeq === manual.map(_ / 256.0f).toSeq)
    // garbage rows surface as decoded_ok=false with a zero feature
    val bad = Seq(Multimodal.MediaRow(99L, "mem://bad",
      Multimodal.MediaMeta("image", 0, 0, 0L, "?"), Array[Byte](9, 9, 9))).toDS()
    val f = Multimodal.extractFeatures(bad).collect().head
    assert(!f.decoded_ok && f.feature.forall(_ === 0f))
  }

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
    // the sampled bytes are REAL decoded frame planes (8x8 C420)
    assert(frames.forall(_.frame_bytes.length === Codec.y4mFrameSize(8, 8)))
    val v0 = videos.minBy(_.media_id)
    val firstPlanes = Codec.decodeY4m(v0.content).get.frames.head
    val sampled0 = frames.filter(f => f.media_id == v0.media_id && f.frame_idx == 0).head
    assert(sampled0.frame_bytes.toSeq === firstPlanes.toSeq)
  }

  test("frame sampling at a rate that does not divide the interval still covers the clip") {
    // 25 fps: frameMs=40 never lands on the 500 ms grid except at 0 —
    // tick-based sampling must still emit duration/interval frames
    val fs = Codec.y4mFrameSize(8, 8)
    val frames = Seq.tabulate(50)(f => Array.fill(fs)(f.toByte)) // 2000 ms
    val row = Seq(Multimodal.MediaRow(7L, "mem://v",
      Multimodal.MediaMeta("video", 8, 8, 2000L, "y4m"),
      Codec.encodeY4m(8, 8, 25, 1, frames))).toDS()
    val sampled = Multimodal.sampleFrames(row, intervalMs = 500L)
      .collect().sortBy(_.ts_ms)
    assert(sampled.map(_.ts_ms).toSeq === Seq(0L, 500L, 1000L, 1500L))
    // the frame on display at each tick: idx = tick / 40
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 12, 25, 37))
    assert(sampled.forall(f => f.frame_bytes(0) === f.frame_idx.toByte))
  }

  test("scene cuts: planted cuts separate cleanly from within-scene jitter") {
    val m = Multimodal.syntheticScenes(spark, 12)
    val got = Multimodal.sceneDiffs(m).collect()
    // every clip emits exactly nFrames-1 consecutive-pair rows
    val perClip = got.groupBy(_.media_id).view.mapValues(_.length).toMap
    (0 until 12).foreach { i =>
      assert(perClip(i.toLong) === (8 + i % 20) - 1, s"clip $i pair count")
    }
    val (cuts, within) = got.partition(_.is_cut)
    assert(cuts.nonEmpty && within.nonEmpty)
    // within-scene: prev/cur are base±1 jitters, so per-pixel |Δ| ≤ 2
    // and SAD ≤ 128 — structurally below the 1024 threshold
    assert(within.forall(_.sad <= 128), s"jitter SAD leaked: ${within.map(_.sad).max}")
    // cuts are independent planes: an order of magnitude above
    assert(cuts.forall(_.sad > 2000), s"weak cut: ${cuts.map(_.sad).min}")
  }

  test("audio QA: planted clipping bursts and silence sections surface exactly") {
    val qa = Multimodal.audioQa(Multimodal.syntheticAudioQa(spark, 12)).collect()
    assert(qa.length === 12)
    qa.foreach { r =>
      if (r.media_id % 3 == 0) {
        assert(r.n_clipped === 10L, s"clip ${r.media_id}: planted burst is 10 samples")
        assert(r.max_abs === 32768, s"clip ${r.media_id}: full-scale negative peak")
      } else {
        assert(r.n_clipped === 0L, s"clip ${r.media_id}: no clipping planted")
        assert(r.max_abs <= 20000, s"clip ${r.media_id}: body bounded")
      }
      // every clip opens with >= 50 dithered-silence samples
      assert(r.longest_silence >= 50, s"clip ${r.media_id}: planted silence missing")
      assert(r.n_samples === 400 + (r.media_id % 5).toInt * 80)
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
