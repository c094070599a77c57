package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** RIFF/WAVE header parse as a native codegen expression — the audio twin
  * of [[ImageHeader]]: `wav_header(data)` over a `binary` column returns
  * `struct<format, audio_format, channels, sample_rate, bits_per_sample,
  * n_frames, duration_ms>`, parsed per the public RIFF container layout
  * (little-endian `fmt ` fields; `n_frames = data_size / block_align`;
  * `duration_ms = n_frames * 1000 / sample_rate`, integer).
  *
  * Same contract as the image parser: corrupt/truncated/non-WAV bytes
  * yield `('unknown', -1, ...)` rather than an exception; the chunk walk
  * advances by declared sizes (plus RIFF's odd-size pad byte) under
  * explicit bounds checks and a chunk-count cap, so hostile lengths can
  * neither overrun nor spin. One bounded pass over header bytes inside
  * whole-stage codegen.
  */
case class WavHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WavHeader.outType
  override def prettyName: String = "wav_header"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    WavHeader.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.WavHeader.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): WavHeader =
    copy(child = newChild)
}

object WavHeader {

  val outType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("audio_format", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  private val MaxChunks = 64

  private val FmtWav = UTF8String.fromString("wav")
  private val FmtUnknown = UTF8String.fromString("unknown")

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, -1, -1, -1, -1, -1L, -1L))

  @inline private def u8(d: Array[Byte], i: Int): Int = d(i) & 0xff

  @inline private def le16(d: Array[Byte], i: Int): Int =
    u8(d, i) | (u8(d, i + 1) << 8)

  @inline private def le32(d: Array[Byte], i: Int): Long =
    u8(d, i).toLong | (u8(d, i + 1).toLong << 8) |
      (u8(d, i + 2).toLong << 16) | (u8(d, i + 3).toLong << 24)

  @inline private def tag(d: Array[Byte], i: Int, a: Char, b: Char, c: Char, e: Char): Boolean =
    u8(d, i) == a && u8(d, i + 1) == b && u8(d, i + 2) == c && u8(d, i + 3) == e

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(d: Array[Byte]): InternalRow = {
    if (d == null || d.length < 12) return unknown
    if (!tag(d, 0, 'R', 'I', 'F', 'F') || !tag(d, 8, 'W', 'A', 'V', 'E')) return unknown
    var i = 12
    var chunks = 0
    var audioFormat = -1
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var blockAlign = -1
    var dataSize = -1L
    var fmtSeen = false
    while (chunks < MaxChunks && i + 8 <= d.length && !(fmtSeen && dataSize >= 0L)) {
      chunks += 1
      val size = le32(d, i + 4)
      if (size < 0L || i + 8 + size > d.length) {
        // a data chunk whose declared size overruns the buffer is common
        // in streamed WAVs; accept it for frame counting iff it is the
        // LAST chunk (use the actual remaining bytes), else stop
        if (tag(d, i, 'd', 'a', 't', 'a') && size >= 0L) {
          dataSize = (d.length - (i + 8)).toLong
        }
        i = d.length // terminate
      } else {
        if (tag(d, i, 'f', 'm', 't', ' ') && size >= 16L) {
          audioFormat = le16(d, i + 8)
          channels = le16(d, i + 10)
          val sr = le32(d, i + 12)
          sampleRate = if (sr > Int.MaxValue) -1 else sr.toInt
          blockAlign = le16(d, i + 20)
          bits = le16(d, i + 22)
          fmtSeen = true
        } else if (tag(d, i, 'd', 'a', 't', 'a')) {
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size.toInt + (size.toInt & 1)
      }
    }
    if (!fmtSeen || channels <= 0 || sampleRate <= 0 || blockAlign <= 0 || dataSize < 0L)
      return unknown
    val nFrames = dataSize / blockAlign
    val durationMs = nFrames * 1000L / sampleRate
    new GenericInternalRow(Array[Any](
      FmtWav, audioFormat, channels, sampleRate, bits, nFrames, durationMs))
  }

  def wav_header(data: Column): Column =
    Bridge.column(WavHeader(Bridge.expression(data)))
}
