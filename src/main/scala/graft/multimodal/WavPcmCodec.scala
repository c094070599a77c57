package graft.multimodal

/** A REAL audio decoder behind the [[Multimodal.MediaCodec]] seam — pure
  * JVM, no native library: little-endian PCM RIFF/WAVE (the format
  * [[graft.functions.WavHeader]] frames), 8-bit unsigned and 16-bit
  * signed samples. This is the seam's existence proof: every
  * decode-shaped stage ([[Multimodal.extractFeatures]], resize,
  * frame-sampling) runs unchanged with actual sample decoding, and
  * [[Multimodal.audioStats]] exposes the integer-exact amplitude surface
  * the q_audio_features oracle re-derives arithmetically from the
  * fixture's synthesis formula. [[Multimodal.StubCodec]] stays only as
  * the spec fixture proving codec-independence of the plumbing.
  *
  * Amplitude convention (the WAV spec's): 16-bit samples are signed LE;
  * 8-bit samples are unsigned and re-centered by −128, so both widths
  * yield a signed amplitude around 0. Malformed, non-PCM, or
  * unsupported-width input decodes to an empty sample stream — zeros
  * out of `decodeFeatures`, pass-through out of `resize`, no frames —
  * never an exception (the parser robustness contract).
  */
object WavPcmCodec extends Multimodal.MediaCodec {

  /** Located PCM payload: fmt fields + the data chunk's byte window. */
  final case class Pcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
      blockAlign: Int, dataOffset: Int, dataSize: Int) {
    def bytesPerSample: Int = bitsPerSample / 8
    def nSamples: Int = dataSize / bytesPerSample
  }

  private val MaxChunks = 64

  @inline private def u8(d: Array[Byte], i: Int): Int = d(i) & 0xff
  @inline private def le16(d: Array[Byte], i: Int): Int =
    u8(d, i) | (u8(d, i + 1) << 8)
  @inline private def le32(d: Array[Byte], i: Int): Long =
    u8(d, i).toLong | (u8(d, i + 1).toLong << 8) |
      (u8(d, i + 2).toLong << 16) | (u8(d, i + 3).toLong << 24)
  @inline private def tag(d: Array[Byte], i: Int,
      a: Char, b: Char, c: Char, e: Char): Boolean =
    u8(d, i) == a && u8(d, i + 1) == b && u8(d, i + 2) == c && u8(d, i + 3) == e

  /** RIFF walk to the decodable payload: PCM format 1, 8 or 16 bits,
    * positive block align, data fully inside the buffer. None otherwise. */
  def locate(d: Array[Byte]): Option[Pcm] = {
    if (d == null || d.length < 12) return None
    if (!tag(d, 0, 'R', 'I', 'F', 'F') || !tag(d, 8, 'W', 'A', 'V', 'E')) return None
    var i = 12
    var chunks = 0
    var fmt: Option[(Int, Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (chunks < MaxChunks && i + 8 <= d.length && (fmt.isEmpty || data.isEmpty)) {
      chunks += 1
      val size = le32(d, i + 4)
      if (size < 0L || i + 8 + size > d.length) i = d.length
      else {
        if (tag(d, i, 'f', 'm', 't', ' ') && size >= 16L)
          fmt = Some((le16(d, i + 8), le16(d, i + 10), le32(d, i + 12).toInt,
            le16(d, i + 20), le16(d, i + 22)))
        else if (tag(d, i, 'd', 'a', 't', 'a'))
          data = Some((i + 8, size.toInt))
        i += 8 + size.toInt + (size.toInt & 1) // word-aligned chunks
      }
    }
    for {
      (audioFormat, channels, sampleRate, blockAlign, bits) <- fmt
      (off, sz) <- data
      if audioFormat == 1 && channels > 0 && sampleRate > 0 &&
        blockAlign > 0 && (bits == 8 || bits == 16) && sz % (bits / 8) == 0
    } yield Pcm(channels, sampleRate, bits, blockAlign, off, sz)
  }

  /** The k-th sample amplitude: signed 16-bit LE, or unsigned 8-bit
    * re-centered by −128. */
  @inline def sampleAt(d: Array[Byte], p: Pcm, k: Int): Int =
    if (p.bitsPerSample == 16) {
      val v = le16(d, p.dataOffset + 2 * k)
      if (v >= 0x8000) v - 0x10000 else v
    } else u8(d, p.dataOffset + k) - 128

  val FeatureDim = 12
  override def featureDim: Int = FeatureDim

  /** 12-dim amplitude feature: [mean, mean|amp|, min, max] normalized to
    * full scale, then an 8-bin histogram of normalized amplitude — every
    * value derived from exact integer sums so the vector is
    * deterministic. Undecodable input → the zero vector. */
  override def decodeFeatures(data: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    locate(data) match {
      case Some(p) if p.nSamples > 0 =>
        val full = if (p.bitsPerSample == 16) 32768f else 128f
        var k = 0
        var sum = 0L
        var sumAbs = 0L
        var mn = Int.MaxValue
        var mx = Int.MinValue
        val hist = new Array[Long](8)
        while (k < p.nSamples) {
          val a = sampleAt(data, p, k)
          sum += a; sumAbs += math.abs(a)
          if (a < mn) mn = a
          if (a > mx) mx = a
          // normalized amp in [-1, 1) -> bin 0..7
          val bin = math.min(7, math.max(0, ((a / full + 1f) * 4f).toInt))
          hist(bin) += 1L
          k += 1
        }
        out(0) = sum.toFloat / p.nSamples / full
        out(1) = sumAbs.toFloat / p.nSamples / full
        out(2) = mn / full
        out(3) = mx / full
        var b = 0
        while (b < 8) { out(4 + b) = hist(b).toFloat / p.nSamples; b += 1 }
        out
      case _ => out
    }
  }

  /** Real PCM framing: fixed-size byte windows cut from the DATA chunk
    * (aligned to whole samples by construction when `frameBytes` is a
    * block-align multiple), every `stride`-th window — the audio twin of
    * video frame extraction. Undecodable input yields no frames. */
  override def sampleFrames(data: Array[Byte], frameBytes: Int,
      stride: Int): Seq[Array[Byte]] =
    locate(data) match {
      case Some(p) if frameBytes > 0 && stride > 0 =>
        (0 until p.dataSize by frameBytes).zipWithIndex
          .collect { case (off, idx) if idx % stride == 0 =>
            java.util.Arrays.copyOfRange(data, p.dataOffset + off,
              p.dataOffset + math.min(off + frameBytes, p.dataSize))
          }
      case _ => Seq.empty
    }

  /** Duration clip: bound the DATA chunk to at most `targetBytes` of
    * sample bytes (whole blocks), rewriting the data-chunk and RIFF
    * sizes — a real no-upscale audio resize. Inputs already inside the
    * bound, or undecodable, pass through unchanged. */
  override def resize(data: Array[Byte], targetBytes: Int): Array[Byte] =
    locate(data) match {
      case Some(p) if p.dataSize > targetBytes =>
        val keep = math.max(0, targetBytes / p.blockAlign * p.blockAlign)
        val out = new Array[Byte](p.dataOffset + keep + (keep & 1))
        System.arraycopy(data, 0, out, 0, p.dataOffset)
        System.arraycopy(data, p.dataOffset, out, p.dataOffset, keep)
        // data chunk size field sits 4 bytes before the payload
        writeLe32(out, p.dataOffset - 4, keep)
        writeLe32(out, 4, out.length - 8) // RIFF size = file minus 8
        out
      case _ => data
    }

  @inline private def writeLe32(d: Array[Byte], i: Int, v: Int): Unit = {
    d(i) = (v & 0xff).toByte
    d(i + 1) = ((v >>> 8) & 0xff).toByte
    d(i + 2) = ((v >>> 16) & 0xff).toByte
    d(i + 3) = ((v >>> 24) & 0xff).toByte
  }
}
