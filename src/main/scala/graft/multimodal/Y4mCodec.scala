package graft.multimodal

/** A REAL video decoder behind the [[Multimodal.MediaCodec]] seam — the
  * frame twin of [[PngCodec]]/[[WavPcmCodec]], completing the codec
  * trio: YUV4MPEG2 (y4m, the mjpegtools interchange format — plain-text
  * stream header, `FRAME` markers, raw planar frames; a public format
  * that decodes without any native library). Supported colorspaces:
  * `Cmono` (one w×h luma plane), `C444` (three full planes), and
  * `C420jpeg` (4:2:0 — luma plus two half-resolution chroma planes,
  * even dimensions required). The reference stops at media metadata;
  * this is the training-pipeline upgrade: real frame extraction for
  * frame-sampling/feature stages (`videoTable`/Mp4Header remain the
  * header-parse leg for ISO-BMFF).
  *
  * Adversarial contract (the parser-robustness discipline): bad magic,
  * unknown colorspace, non-positive or 420-odd dimensions, missing or
  * malformed FRAME markers, truncated frame payloads, or over-bound
  * dimensions/frame counts all decode to None — zeros out of the stats
  * surface, pass-through out of `resize`, never an exception, never an
  * unbounded allocation. Header and frame-marker lines are
  * length-bounded before any tokenization.
  *
  * [[encode]] is the writer half (fixture builder + `resize`): the same
  * header grammar the decoder walks, one `FRAME` marker per frame. The
  * q_video_features oracle re-derives every pixel from the fixture's
  * value FORMULA — never from these bytes — so the encoder and decoder
  * cannot agree their way past it. */
object Y4mCodec extends Multimodal.MediaCodec {

  /** Decoded video: `frames` are raw planar frames, `frameBytes` each
    * (w*h for mono, 3*w*h for 444, 3*w*h/2 for 420). `channels` is the
    * plane count (1 or 3). */
  final case class Video(width: Int, height: Int, channels: Int,
      colorspace: String, frameBytes: Int, frames: IndexedSeq[Array[Byte]])

  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")
  private val FrameMagic = "FRAME".getBytes("US-ASCII")
  /** A header or FRAME line longer than this is hostile, not a video. */
  private val MaxLineBytes = 512
  private val MaxFrames = 4096
  /** Bound on ONE frame's payload — a 4 GB-claiming header must fail
    * the walk, not the allocator. */
  private val MaxFrameBytes = 1 << 26

  /** Bytes of one frame for a supported colorspace, or -1. */
  private def frameSize(w: Int, h: Int, cs: String): Long = cs match {
    case "mono" => w.toLong * h
    case "444" => 3L * w * h
    case "420jpeg" =>
      if ((w & 1) == 1 || (h & 1) == 1) -1L
      else w.toLong * h + 2L * (w / 2) * (h / 2)
    case _ => -1L
  }

  /** Header/frame-marker line: bytes from `from` up to the next LF,
    * decoded as ASCII — None if no LF lands within the bound. Returns
    * (line, index just past the LF). */
  private def line(d: Array[Byte], from: Int): Option[(String, Int)] = {
    var i = from
    val stop = math.min(d.length, from + MaxLineBytes)
    while (i < stop && d(i) != '\n') i += 1
    if (i >= stop || i >= d.length) None
    else Some((new String(d, from, i - from, "US-ASCII"), i + 1))
  }

  /** Stream walk: magic, parameter tokens, then FRAME-marker + payload
    * pairs to end-of-stream. None on anything out of contract. */
  def decode(d: Array[Byte]): Option[Video] = {
    if (d == null || d.length < Magic.length) return None
    var k = 0
    while (k < Magic.length) { if (d(k) != Magic(k)) return None; k += 1 }
    line(d, 0) match {
      case None => None
      case Some((header, bodyAt)) =>
        var w = 0
        var h = 0
        var cs = "420jpeg" // the format's default when C is absent
        // tokens are space-separated, each tagged by its first letter;
        // unknown tags (F, I, A, X, ...) are skipped by contract
        header.split(' ').drop(1).foreach { tok =>
          if (tok.nonEmpty) tok.charAt(0) match {
            case 'W' => w = tok.drop(1).toIntOption.getOrElse(-1)
            case 'H' => h = tok.drop(1).toIntOption.getOrElse(-1)
            case 'C' => cs = tok.drop(1)
            case _ => ()
          }
        }
        val fb = frameSize(w, h, cs)
        if (w <= 0 || h <= 0 || fb <= 0L || fb > MaxFrameBytes) return None
        val frames = Vector.newBuilder[Array[Byte]]
        var i = bodyAt
        var n = 0
        while (i < d.length) {
          if (n >= MaxFrames) return None
          // FRAME marker (optionally with its own parameters, skipped)
          var m = 0
          while (m < FrameMagic.length) {
            if (i + m >= d.length || d(i + m) != FrameMagic(m)) return None
            m += 1
          }
          line(d, i) match {
            case None => return None
            case Some((marker, dataAt)) =>
              // after "FRAME" only a space-separated param list may follow
              if (marker.length > 5 && marker.charAt(5) != ' ') return None
              if (dataAt + fb > d.length) return None // truncated payload
              frames += java.util.Arrays.copyOfRange(d, dataAt,
                dataAt + fb.toInt)
              i = dataAt + fb.toInt
              n += 1
          }
        }
        Some(Video(w, h, if (cs == "mono") 1 else 3, cs, fb.toInt,
          frames.result()))
    }
  }

  /** Writer half: `YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 C<cs>\n` then one
    * `FRAME\n` + payload per frame. Every frame must be exactly the
    * colorspace's size — a wrong-size frame would emit a stream the
    * validating decoder refuses. */
  def encode(w: Int, h: Int, cs: String, frames: Seq[Array[Byte]],
      headerExtra: String = "", frameExtra: String = ""): Array[Byte] = {
    val fb = frameSize(w, h, cs)
    require(fb > 0L && fb <= MaxFrameBytes, s"bad dims/colorspace: $w x $h C$cs")
    require(frames.forall(_.length.toLong == fb),
      s"every frame must be exactly $fb bytes")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C$cs$headerExtra\n"
      .getBytes("US-ASCII"))
    frames.foreach { f =>
      bos.write(s"FRAME$frameExtra\n".getBytes("US-ASCII"))
      bos.write(f)
    }
    bos.toByteArray
  }

  // ---- MediaCodec surface ------------------------------------------------

  val FeatureDim = 12
  override def featureDim: Int = FeatureDim

  /** 12-dim pixel feature mirroring [[PngCodec.decodeFeatures]], folded
    * over every plane byte of every frame. Undecodable input or a
    * zero-frame stream → the zero vector. */
  override def decodeFeatures(data: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    decode(data) match {
      case Some(v) if v.frames.nonEmpty =>
        var sum = 0L
        var sumDev = 0L
        var mn = 255
        var mx = 0
        val hist = new Array[Long](8)
        var n = 0L
        v.frames.foreach { f =>
          var k = 0
          while (k < f.length) {
            val px = f(k) & 0xff
            sum += px; sumDev += math.abs(px - 128)
            if (px < mn) mn = px
            if (px > mx) mx = px
            hist(px >> 5) += 1L
            k += 1
          }
          n += f.length
        }
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

  /** REAL frame extraction — the operation the whole seam was stubbed
    * for: every `stride`-th decoded frame's raw planar bytes (truncated
    * to `frameBytes`). Undecodable input yields no frames. */
  override def sampleFrames(data: Array[Byte], frameBytes: Int,
      stride: Int): Seq[Array[Byte]] =
    decode(data) match {
      case Some(v) if frameBytes > 0 && stride > 0 =>
        (0 until v.frames.length by stride).map { i =>
          val f = v.frames(i)
          java.util.Arrays.copyOf(f, math.min(frameBytes, f.length))
        }
      case _ => Seq.empty
    }

  /** No-upscale temporal crop: keep whole frames up to `targetBytes` of
    * payload and RE-ENCODE — a real video clip with the container
    * invariants intact. Inputs already inside the bound, or
    * undecodable, pass through unchanged. */
  override def resize(data: Array[Byte], targetBytes: Int): Array[Byte] =
    decode(data) match {
      case Some(v) if v.frames.length.toLong * v.frameBytes > targetBytes =>
        val keep = math.max(1, targetBytes / v.frameBytes)
        if (keep >= v.frames.length) data
        else encode(v.width, v.height, v.colorspace, v.frames.take(keep))
      case _ => data
    }
}
