package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** ISO-BMFF (MP4) header parse as a native codegen expression — the video
  * leg of the multimodal codec triple ([[ImageHeader]], [[WavHeader]]):
  * `mp4_header(data)` over a `binary` column returns
  * `struct<format, major_brand, timescale, duration_ms, n_tracks, width,
  * height>`, parsed per the public ISO/IEC 14496-12 box layout:
  *
  *  - top-level box walk (big-endian u32 size + 4CC type; size 1 = u64
  *    largesize follows; size 0 = box extends to EOF) locating `ftyp`
  *    (major brand) and `moov`;
  *  - inside `moov`: `mvhd` (version 0 = u32 timescale/duration, version
  *    1 = u32 timescale / u64 duration; `duration_ms = duration * 1000 /
  *    timescale`, integer), `trak` count, and the first `trak` whose
  *    `tkhd` carries nonzero 16.16 fixed-point width/height (the video
  *    track — audio tracks encode 0x0).
  *
  * Same contract as its siblings: corrupt/truncated/non-MP4 bytes yield
  * `('unknown', ...)`, never an exception; every walk advances by
  * declared sizes under explicit bounds checks and box-count caps, so
  * hostile lengths can neither overrun nor spin. Nesting is bounded
  * structurally (top level → moov children → trak children), not
  * recursive. One bounded pass over header bytes inside whole-stage
  * codegen; `mdat` payloads are skipped by size, never read.
  */
case class Mp4Header(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp4Header.outType
  override def prettyName: String = "mp4_header"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    Mp4Header.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.Mp4Header.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): Mp4Header =
    copy(child = newChild)
}

object Mp4Header {

  val outType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("major_brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private val MaxBoxes = 64

  private val FmtMp4 = UTF8String.fromString("mp4")
  private val FmtUnknown = UTF8String.fromString("unknown")
  private val BrandNone = UTF8String.fromString("")

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, BrandNone, -1, -1L, -1, -1, -1))

  @inline private def u8(d: Array[Byte], i: Int): Int = d(i) & 0xff

  @inline private def be16(d: Array[Byte], i: Int): Int =
    (u8(d, i) << 8) | u8(d, i + 1)

  @inline private def be32(d: Array[Byte], i: Int): Long =
    (u8(d, i).toLong << 24) | (u8(d, i + 1) << 16) | (u8(d, i + 2) << 8) | u8(d, i + 3)

  @inline private def be64(d: Array[Byte], i: Int): Long =
    (be32(d, i) << 32) | be32(d, i + 4)

  @inline private def fourcc(d: Array[Byte], i: Int, a: Char, b: Char, c: Char, e: Char): Boolean =
    u8(d, i) == a && u8(d, i + 1) == b && u8(d, i + 2) == c && u8(d, i + 3) == e

  /** Walk boxes in [from, to); `visit(type-offset, payload-start,
    * payload-end)` per box. Returns false on malformed sizing. */
  @inline private def walk(d: Array[Byte], from: Int, to: Int)(
      visit: (Int, Int, Int) => Unit): Boolean = {
    var i = from
    var boxes = 0
    while (boxes < MaxBoxes && i + 8 <= to) {
      boxes += 1
      val size32 = be32(d, i)
      var payload = i + 8
      val size: Long =
        if (size32 == 1L) {
          if (i + 16 > to) return false
          payload = i + 16
          be64(d, i + 8)
        } else if (size32 == 0L) (to - i).toLong // box extends to the end
        else size32
      if (size < (payload - i).toLong || i + size > to) return false
      visit(i + 4, payload, i + size.toInt)
      i += size.toInt
    }
    true
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(d: Array[Byte]): InternalRow = {
    if (d == null || d.length < 16) return unknown
    // an MP4 stream MUST lead with ftyp (the sniffing rule every demuxer
    // applies); requiring it keeps arbitrary big-endian garbage out
    if (!fourcc(d, 4, 'f', 't', 'y', 'p')) return unknown

    var brand: UTF8String = BrandNone
    var timescale = -1
    var durationMs = -1L
    var nTracks = 0
    var width = -1
    var height = -1
    var sawMoov = false

    val okTop = walk(d, 0, d.length) { (t, p, e) =>
      if (fourcc(d, t, 'f', 't', 'y', 'p') && p + 4 <= e) {
        val b = new Array[Byte](4)
        System.arraycopy(d, p, b, 0, 4)
        brand = UTF8String.fromBytes(b)
      } else if (fourcc(d, t, 'm', 'o', 'o', 'v')) {
        sawMoov = true
        walk(d, p, e) { (t2, p2, e2) =>
          if (fourcc(d, t2, 'm', 'v', 'h', 'd') && p2 + 4 <= e2) {
            val version = u8(d, p2)
            if (version == 0 && p2 + 20 <= e2) {
              // v0: flags(3) ctime(4) mtime(4) timescale(4) duration(4)
              val ts = be32(d, p2 + 12)
              val dur = be32(d, p2 + 16)
              if (ts > 0L && ts <= Int.MaxValue) {
                timescale = ts.toInt
                durationMs = dur * 1000L / ts
              }
            } else if (version == 1 && p2 + 32 <= e2) {
              // v1: flags(3) ctime(8) mtime(8) timescale(4) duration(8)
              val ts = be32(d, p2 + 20)
              val dur = be64(d, p2 + 24)
              if (ts > 0L && ts <= Int.MaxValue && dur >= 0L) {
                timescale = ts.toInt
                durationMs = dur * 1000L / ts
              }
            }
          } else if (fourcc(d, t2, 't', 'r', 'a', 'k')) {
            nTracks += 1
            walk(d, p2, e2) { (t3, p3, e3) =>
              if (fourcc(d, t3, 't', 'k', 'h', 'd') && width < 0) {
                val version = u8(d, p3)
                // width/height are the LAST 8 payload bytes (16.16 fixed)
                // in both versions; read from the end, not a version-
                // dependent offset
                val need = if (version == 1) 4 + 32 + 8 + 52 else 4 + 20 + 8 + 52
                if (p3 + need <= e3) {
                  val w = be32(d, e3 - 8) >> 16
                  val h = be32(d, e3 - 4) >> 16
                  if (w > 0L && h > 0L) { width = w.toInt; height = h.toInt }
                }
              }
            }
          }
        }
      }
    }
    if (!okTop || !sawMoov || timescale <= 0) unknown
    else new GenericInternalRow(Array[Any](
      FmtMp4, brand, timescale, durationMs, nTracks, width, height))
  }

  def mp4_header(data: Column): Column =
    Bridge.column(Mp4Header(Bridge.expression(data)))
}
