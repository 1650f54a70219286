package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM encoders/decoders for three public-domain media
  * containers — no native libraries, no new dependencies:
  *
  *   - BMP  (Windows bitmap, BITMAPINFOHEADER, 24bpp uncompressed):
  *     54-byte header, little-endian fields, scanlines padded to
  *     4-byte boundaries, bottom-up by default (negative height =
  *     top-down, legal for uncompressed bitmaps).
  *   - WAV  (RIFF/WAVE, PCM integer format 1): chunk walk from offset
  *     12 — `fmt ` carries channels/rate/bits, `data` carries the PCM
  *     payload; unknown chunks are skipped, odd-sized chunks are
  *     word-aligned per the RIFF spec.
  *   - Y4M  (YUV4MPEG2): ASCII parameter header line, then per frame
  *     a `FRAME\n` marker followed by raw C420 planes
  *     (Y w·h, then U and V at ceil(w/2)·ceil(h/2)).
  *
  * Decoders return None on malformed input (magic, bounds, or
  * unsupported profile) — never throw. Encoders produce canonical
  * files the decoders round-trip byte-exactly; the synthetic fixture
  * generator and the DuckDB oracle both rely on those canonical
  * layouts (q70's oracle recomputes features from the blob with plain
  * offset arithmetic).
  */
object Codec {

  /** `pixels`: logical top-down row-major BGR triples, scanline
    * padding stripped (decode normalizes bottom-up files). */
  final case class Bmp(width: Int, height: Int, topDown: Boolean,
                       pixels: Array[Byte])
  /** `data`: the raw PCM payload of the data chunk. */
  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       data: Array[Byte]) {
    /** PCM16LE view of the payload. */
    def samples: Array[Short] = {
      val n = data.length / 2
      val out = new Array[Short](n)
      val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { out(i) = buf.getShort(2 * i); i += 1 }
      out
    }
  }
  /** `frames`: raw C420 plane bytes per frame, headers stripped. */
  final case class Y4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                       frames: Vector[Array[Byte]]) {
    /** Display duration of one frame in milliseconds (integral for
      * the fixture rates; rounds down otherwise). */
    def frameMs: Long = 1000L * fpsDen / fpsNum
  }

  // ------------------------------------------------------------ BMP

  def bmpRowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** `bgr`: top-down row-major BGR triples. `topDown=false` writes
    * the conventional bottom-up scanline order; `true` writes a
    * negative-height top-down file (payload order = logical order —
    * what the fixture uses so the SQL oracle needs no row flip). */
  def encodeBmp(width: Int, height: Int, bgr: Array[Byte],
                topDown: Boolean = false): Array[Byte] = {
    require(bgr.length == width * height * 3,
      s"pixel buffer ${bgr.length} != $width x $height x 3")
    val rowSize = bmpRowSize(width)
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize)                  // file size
    buf.putInt(0)                              // reserved
    buf.putInt(54)                             // pixel-data offset
    buf.putInt(40)                             // BITMAPINFOHEADER
    buf.putInt(width)
    buf.putInt(if (topDown) -height else height)
    buf.putShort(1)                            // planes
    buf.putShort(24)                           // bits per pixel
    buf.putInt(0)                              // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835)              // 72 DPI
    buf.putInt(0).putInt(0)                    // palette (none)
    val pad = new Array[Byte](rowSize - width * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      buf.put(bgr, srcRow * width * 3, width * 3)
      buf.put(pad)
      y += 1
    }
    buf.array()
  }

  def decodeBmp(bytes: Array[Byte]): Option[Bmp] = try {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val dibSize = buf.getInt(14)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (dibSize < 40 || width <= 0 || rawHeight == 0 || planes != 1 ||
      bpp != 24 || compression != 0) return None
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val rowSize = bmpRowSize(width)
    if (dataOffset < 54 ||
      dataOffset.toLong + rowSize.toLong * height > bytes.length) return None
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      System.arraycopy(bytes, dataOffset + srcRow * rowSize,
        out, y * width * 3, width * 3)
      y += 1
    }
    Some(Bmp(width, height, topDown, out))
  } catch { case _: Exception => None }

  /** Nearest-neighbor resample of a decoded BMP, re-encoded top-down. */
  def resizeBmp(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeBmp(bytes).map { bmp =>
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val sy = y * bmp.height / h
        var x = 0
        while (x < w) {
          val sx = x * bmp.width / w
          System.arraycopy(bmp.pixels, (sy * bmp.width + sx) * 3,
            out, (y * w + x) * 3, 3)
          x += 1
        }
        y += 1
      }
      encodeBmp(w, h, out, topDown = true)
    }

  // ------------------------------------------------------------ WAV

  /** Canonical 44-byte-header PCM16 WAV around `data` (raw PCM bytes). */
  def encodeWav(channels: Int, sampleRate: Int, data: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * 2
    val buf = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                            // PCM integer
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * blockAlign)        // byte rate
    buf.putShort(blockAlign.toShort)
    buf.putShort(16)                           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(data.length)
    buf.put(data)
    buf.array()
  }

  def decodeWav(bytes: Array[Byte]): Option[Wav] = try {
    if (bytes.length < 44) return None
    def str(o: Int, n: Int) = new String(bytes, o, n, "US-ASCII")
    if (str(0, 4) != "RIFF" || str(8, 4) != "WAVE") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[Array[Byte]] = None
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = str(off, 4)
      val size = buf.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16 || buf.getShort(off + 8) != 1) return None // PCM only
          // PCM16 only: accepting 8/24-bit files would let `samples`
          // silently pair misaligned bytes into garbage shorts
          if (buf.getShort(off + 22) != 16) return None
          fmt = Some((buf.getShort(off + 10).toInt, buf.getInt(off + 12),
            buf.getShort(off + 22).toInt))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size))
        case _ => () // skip LIST/INFO/fact/…
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    for { (ch, sr, bits) <- fmt; d <- data } yield Wav(ch, sr, bits, d)
  } catch { case _: Exception => None }

  // ------------------------------------------------------------ Y4M

  val Y4mMagic = "YUV4MPEG2"

  /** C420 frame payload size: Y plane + 2 quarter-res chroma planes. */
  def y4mFrameSize(w: Int, h: Int): Int =
    w * h + 2 * (((w + 1) / 2) * ((h + 1) / 2))

  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    val fs = y4mFrameSize(width, height)
    require(frames.forall(_.length == fs), s"every frame must be $fs bytes")
    val header =
      s"$Y4mMagic W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.size * (marker.length + fs))
    out.write(header)
    frames.foreach { f => out.write(marker); out.write(f) }
    out.toByteArray
  }

  def decodeY4m(bytes: Array[Byte]): Option[Y4m] = try {
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    val header = new String(bytes, 0, nl, "US-ASCII")
    val toks = header.split(" ")
    if (toks.head != Y4mMagic) return None
    var w = -1; var h = -1; var fn = 25; var fd = 1
    toks.tail.foreach { t =>
      if (t.nonEmpty) t.head match {
        case 'W' => w = t.tail.toInt
        case 'H' => h = t.tail.toInt
        case 'F' =>
          val p = t.tail.split(":")
          fn = p(0).toInt; fd = p(1).toInt
        case 'C' => // only the 4:2:0 family is supported
          if (!t.startsWith("C420")) return None
        case _ => () // interlacing / aspect params don't affect layout
      }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    val fs = y4mFrameSize(w, h)
    val frames = Vector.newBuilder[Array[Byte]]
    var off = nl + 1
    while (off < bytes.length) {
      if (off + 5 > bytes.length ||
        new String(bytes, off, 5, "US-ASCII") != "FRAME") return None
      val fnl = bytes.indexOf('\n'.toByte, off)
      if (fnl < 0 || fnl + 1 + fs > bytes.length) return None
      frames += java.util.Arrays.copyOfRange(bytes, fnl + 1, fnl + 1 + fs)
      off = fnl + 1 + fs
    }
    Some(Y4m(w, h, fn, fd, frames.result()))
  } catch { case _: Exception => None }

  // ----------------------------------------------- sniffed features

  private def startsWith(bytes: Array[Byte], ascii: String): Boolean =
    bytes.length >= ascii.length &&
      ascii.indices.forall(i => bytes(i) == ascii.charAt(i).toByte)

  /** Container-sniffed decode to the modality payload: BMP → pixel
    * bytes (padding stripped), WAV → PCM data bytes, Y4M →
    * concatenated frame planes. None for unknown or malformed input. */
  def decodePayload(bytes: Array[Byte]): Option[Array[Byte]] =
    if (startsWith(bytes, "BM")) decodeBmp(bytes).map(_.pixels)
    else if (startsWith(bytes, "RIFF")) decodeWav(bytes).map(_.data)
    else if (startsWith(bytes, Y4mMagic)) decodeY4m(bytes).map { y =>
      val out = new Array[Byte](y.frames.map(_.length).sum)
      var pos = 0
      y.frames.foreach { f =>
        System.arraycopy(f, 0, out, pos, f.length); pos += f.length
      }
      out
    }
    else None

  /** Decoded-payload feature: per-slot byte sums divided by 256.
    * Dyadic-exact — each value is k/256 with k < 2^20, so the float32
    * division is exact, any IEEE engine reproduces it bit-for-bit,
    * and downstream sums/averages are order-independent. */
  def decodeFeature(bytes: Array[Byte], dim: Int = 8): Option[Array[Float]] =
    decodePayload(bytes).map { payload =>
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xFF)
        i += 1
      }
      acc.map(_ / 256.0f)
    }
}
