package graft.multimodal

/** A REAL image decoder behind the [[Multimodal.MediaCodec]] seam — the
  * pixel twin of [[WavPcmCodec]], pure JVM (`java.util.zip.Inflater`, no
  * native imaging library): non-interlaced 8-bit PNG, grayscale (color
  * type 0) and truecolor (color type 2) — exactly the shapes the
  * synthesized fixtures emit. The decode is adversarial end to end:
  * every chunk CRC32 is verified, IDAT inflates under an explicit size
  * bound, the inflated stream must be exactly `height * (1 + width*bpp)`
  * bytes, and all five PNG filter types (None/Sub/Up/Average/Paeth,
  * RFC 2083 §6) are inverted per scanline. Anything else — bad
  * signature, wrong depth/color/interlace, truncated or over-long IDAT,
  * CRC mismatch — decodes to None: zeros out of the stats surface,
  * pass-through out of `resize`, never an exception (the parser
  * robustness contract).
  *
  * [[encode]] is the writer half (used by the fixture builder with a
  * caller-chosen filter per row so every filter type is live in the
  * gate, and by `resize` with filter None): real CRCs, one IDAT, the
  * same chunk grammar the decoder walks. The q_image_features oracle
  * re-derives pixel statistics from the fixture's value FORMULA — never
  * from these bytes — so encoder and decoder cannot agree their way
  * past it; PngCodecSpec additionally pins each filter inversion against
  * hand-computed byte vectors. */
object PngCodec extends Multimodal.MediaCodec {

  /** Decoded image: `raw` is the unfiltered pixel stream, row-major,
    * `channels` interleaved unsigned bytes per pixel. */
  final case class Img(width: Int, height: Int, channels: Int,
      raw: Array[Byte])

  private val MaxChunks = 64
  /** Bound on the unfiltered pixel stream — a 4 GB-claiming IHDR must
    * fail the walk, not the allocator. */
  private val MaxRawBytes = 1 << 26

  @inline private def u8(d: Array[Byte], i: Int): Int = d(i) & 0xff
  @inline private def be32(d: Array[Byte], i: Int): Long =
    (u8(d, i).toLong << 24) | (u8(d, i + 1).toLong << 16) |
      (u8(d, i + 2).toLong << 8) | u8(d, i + 3).toLong

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(d: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(d, off, len)
    c.getValue
  }

  /** Chunk walk + inflate + unfilter. None on anything out of contract. */
  def decode(d: Array[Byte]): Option[Img] = {
    if (d == null || d.length < 8) return None
    var k = 0
    while (k < 8) { if (d(k) != Signature(k)) return None; k += 1 }
    var i = 8
    var chunks = 0
    var w = 0
    var h = 0
    var ch = 0
    var sawIhdr = false
    var done = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!done && chunks < MaxChunks && i + 12 <= d.length) {
      chunks += 1
      val len = be32(d, i)
      if (len < 0L || i + 12 + len > d.length) return None
      // CRC covers type + payload
      if (crc32(d, i + 4, 4 + len.toInt) != be32(d, i + 8 + len.toInt))
        return None
      val isType = (a: Char, b: Char, c: Char, e: Char) =>
        u8(d, i + 4) == a && u8(d, i + 5) == b &&
          u8(d, i + 6) == c && u8(d, i + 7) == e
      if (isType('I', 'H', 'D', 'R')) {
        if (sawIhdr || len != 13L) return None
        sawIhdr = true
        w = be32(d, i + 8).toInt
        h = be32(d, i + 12).toInt
        val bitDepth = u8(d, i + 16)
        val colorType = u8(d, i + 17)
        val interlace = u8(d, i + 20)
        ch = colorType match { case 0 => 1; case 2 => 3; case _ => 0 }
        if (w <= 0 || h <= 0 || bitDepth != 8 || ch == 0 ||
            u8(d, i + 18) != 0 || u8(d, i + 19) != 0 || interlace != 0)
          return None
        if (h.toLong * (1L + w.toLong * ch) > MaxRawBytes) return None
      } else if (isType('I', 'D', 'A', 'T')) {
        if (!sawIhdr) return None
        idat.write(d, i + 8, len.toInt)
      } else if (isType('I', 'E', 'N', 'D')) {
        done = true
      }
      i += 12 + len.toInt
    }
    if (!done || !sawIhdr) return None
    val rowBytes = w * ch
    val expect = h * (1 + rowBytes)
    val filtered = new Array[Byte](expect)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(filtered, got, expect - got)
        // 0 progress with all input provided = truncated stream, a
        // preset-dictionary (FDICT) request, or any other stall — bail
        // on ALL of them or an adversarial zlib header spins this loop
        // forever inside a task
        if (n == 0) return None
        got += n
      }
      // exact size: a short stream is truncation, a longer one is not
      // the image the header declared
      if (got != expect || inf.inflate(new Array[Byte](1)) != 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // null = unknown filter type mid-stream: undecodable, not an
    // empty image (Some(empty raw) would crash sampleFrames and invent
    // zero pixels downstream)
    Option(unfilter(filtered, w, h, ch)).map(Img(w, h, ch, _))
  }

  /** Invert the per-scanline filters (RFC 2083 §6.3–6.9): byte math mod
    * 256, `bpp = channels` at 8-bit depth. Returns null on an unknown
    * filter type — the caller maps that to an undecodable image. */
  private def unfilter(filtered: Array[Byte], w: Int, h: Int,
      ch: Int): Array[Byte] = {
    val rowBytes = w * ch
    val out = new Array[Byte](h * rowBytes)
    var y = 0
    while (y < h) {
      val fRow = y * (1 + rowBytes) // filter byte position
      val oRow = y * rowBytes
      val t = filtered(fRow) & 0xff
      var x = 0
      while (x < rowBytes) {
        val f = filtered(fRow + 1 + x) & 0xff
        val a = if (x >= ch) out(oRow + x - ch) & 0xff else 0
        val b = if (y > 0) out(oRow - rowBytes + x) & 0xff else 0
        val c = if (x >= ch && y > 0) out(oRow - rowBytes + x - ch) & 0xff else 0
        val recon = t match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + ((a + b) >> 1)
          case 4 => f + paeth(a, b, c)
          case _ => return null // unknown filter: undecodable
        }
        out(oRow + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---- writer half -----------------------------------------------------

  private def be32w(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(chunkType: String, payload: Array[Byte]): Array[Byte] = {
    val body = chunkType.getBytes("US-ASCII") ++ payload
    be32w(payload.length) ++ body ++ be32w(crc32(body, 0, body.length).toInt)
  }

  /** Apply filter `t` to row `y` of `raw` — the encoder-side forward
    * transform the decoder inverts. */
  private def filterRow(raw: Array[Byte], y: Int, rowBytes: Int, ch: Int,
      t: Int, out: Array[Byte], outOff: Int): Unit = {
    val oRow = y * rowBytes
    out(outOff) = t.toByte
    var x = 0
    while (x < rowBytes) {
      val cur = raw(oRow + x) & 0xff
      val a = if (x >= ch) raw(oRow + x - ch) & 0xff else 0
      val b = if (y > 0) raw(oRow - rowBytes + x) & 0xff else 0
      val c = if (x >= ch && y > 0) raw(oRow - rowBytes + x - ch) & 0xff else 0
      val f = t match {
        case 0 => cur
        case 1 => cur - a
        case 2 => cur - b
        case 3 => cur - ((a + b) >> 1)
        case 4 => cur - paeth(a, b, c)
        case _ => throw new IllegalArgumentException(s"filter type $t")
      }
      out(outOff + 1 + x) = (f & 0xff).toByte
      x += 1
    }
  }

  /** A complete, decodable PNG: signature, IHDR, one deflated IDAT of
    * per-row-filtered scanlines, IEND — all CRCs live. `colorType` 0
    * (grayscale, 1 byte/px) or 2 (truecolor, 3 bytes/px); `raw` is the
    * row-major interleaved pixel stream; `filterOf(y)` picks each row's
    * filter type (0–4). */
  def encode(width: Int, height: Int, colorType: Int, raw: Array[Byte],
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    val ch = colorType match {
      case 0 => 1
      case 2 => 3
      case other => throw new IllegalArgumentException(s"color type $other")
    }
    val rowBytes = width * ch
    require(raw.length == height * rowBytes,
      s"raw length ${raw.length} != $height * $rowBytes")
    val filtered = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      filterRow(raw, y, rowBytes, ch, filterOf(y), filtered,
        y * (1 + rowBytes))
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    val bos = new java.io.ByteArrayOutputStream()
    try {
      defl.setInput(filtered)
      defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    } finally defl.end()
    val ihdr = chunk("IHDR", be32w(width) ++ be32w(height) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte))
    Signature ++ ihdr ++ chunk("IDAT", bos.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  // ---- MediaCodec surface ------------------------------------------------

  val FeatureDim = 12
  override def featureDim: Int = FeatureDim

  /** 12-dim pixel feature mirroring [[WavPcmCodec.decodeFeatures]]:
    * [mean, mean-distance-from-mid, min, max] normalized to [0, 1], then
    * an 8-bin intensity histogram — all from exact integer sums.
    * Undecodable input → the zero vector. */
  override def decodeFeatures(data: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    decode(data) match {
      case Some(img) if img.raw.nonEmpty =>
        var sum = 0L
        var sumDev = 0L
        var mn = 255
        var mx = 0
        val hist = new Array[Long](8)
        var k = 0
        while (k < img.raw.length) {
          val v = img.raw(k) & 0xff
          sum += v; sumDev += math.abs(v - 128)
          if (v < mn) mn = v
          if (v > mx) mx = v
          hist(v >> 5) += 1L
          k += 1
        }
        val n = img.raw.length
        out(0) = sum.toFloat / n / 255f
        out(1) = sumDev.toFloat / n / 128f
        out(2) = mn / 255f
        out(3) = mx / 255f
        var b = 0
        while (b < 8) { out(4 + b) = hist(b).toFloat / n; b += 1 }
        out
      case _ => out
    }
  }

  /** Real pixel framing: each frame is one unfiltered SCANLINE's bytes
    * (truncated to `frameBytes`), every `stride`-th row — the image twin
    * of video frame extraction. Undecodable input yields no frames. */
  override def sampleFrames(data: Array[Byte], frameBytes: Int,
      stride: Int): Seq[Array[Byte]] =
    decode(data) match {
      case Some(img) if frameBytes > 0 && stride > 0 =>
        val rowBytes = img.width * img.channels
        (0 until img.height by stride).map { y =>
          java.util.Arrays.copyOfRange(img.raw, y * rowBytes,
            y * rowBytes + math.min(frameBytes, rowBytes))
        }
      case _ => Seq.empty
    }

  /** No-upscale vertical crop: keep whole scanlines up to `targetBytes`
    * of raw pixel data and RE-ENCODE (filter None) — a real image resize
    * with the container invariants intact. Inputs already inside the
    * bound, or undecodable, pass through unchanged. */
  override def resize(data: Array[Byte], targetBytes: Int): Array[Byte] =
    decode(data) match {
      case Some(img) if img.raw.length > targetBytes =>
        val rowBytes = img.width * img.channels
        val rows = math.max(1, targetBytes / rowBytes)
        if (rows >= img.height) data
        else encode(img.width, rows, if (img.channels == 1) 0 else 2,
          java.util.Arrays.copyOfRange(img.raw, 0, rows * rowBytes))
      case _ => data
    }
}
