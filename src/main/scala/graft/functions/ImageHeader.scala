package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container header parse as a native codegen expression:
  * `image_header(data)` over a `binary` column returns
  * `struct<format, width, height, bit_depth, color_type, orientation>`.
  * This is the production instance of the [[graft.multimodal.Multimodal]]
  * codec seam — unlike `StubCodec` it parses ACTUAL bytes per the public
  * container specs:
  *
  *  - PNG (ISO/IEC 15948): the 8-byte signature, then the mandatory
  *    first IHDR chunk — width/height as big-endian uint32, bit depth and
  *    color type as single bytes. PNG carries no EXIF orientation →
  *    `orientation = -1`.
  *  - JPEG/JFIF (ITU-T T.81): a bounded marker walk from SOI. Frame
  *    dimensions come from the first SOFn segment (precision byte,
  *    big-endian height/width uint16, component count — reported as
  *    `bit_depth`/`color_type`); EXIF orientation from an APP1 segment's
  *    embedded TIFF: both `II` (little-endian) and `MM` (big-endian)
  *    byte orders, IFD0 entry walk for tag 0x0112. Absent EXIF →
  *    `orientation = -1` (we report what the bytes say, never the
  *    "assume 1" display default).
  *
  * Anything else (truncated, corrupt, non-image) parses to
  * `('unknown', -1, -1, -1, -1, -1)` — never an exception, because at
  * 100 TB some payloads WILL be garbage and a poison row must not kill
  * the stage. Every loop is bounded: the marker walk advances by declared
  * segment lengths with explicit bounds checks and a segment-count cap,
  * and the IFD walk caps its entry count, so a hostile length field can
  * neither overrun the array nor spin.
  *
  * Per-row work is one pass over at most the header bytes (the walk stops
  * at SOS, before entropy-coded data), as a static call inside whole-stage
  * codegen — metadata extraction over millions of media rows stays
  * scan-shaped, with the binary column pruned away right after this
  * projection. Reference analog: the broker treats payloads as opaque
  * bytes end-to-end (`src/helpers/StreamMessage`); header extraction is
  * the training-pipeline extension where bytes stop being opaque.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageHeader.outType
  override def prettyName: String = "image_header"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    ImageHeader.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.ImageHeader.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): ImageHeader =
    copy(child = newChild)
}

object ImageHeader {

  val outType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("color_type", IntegerType, nullable = false),
    StructField("orientation", IntegerType, nullable = false)))

  /** Caps on attacker-controlled counts: segments a JPEG walk will visit
    * and entries an EXIF IFD walk will read. Real files sit far below
    * both; the caps only bound adversarial byte streams. */
  private val MaxSegments = 64
  private val MaxIfdEntries = 64

  private val FmtPng = UTF8String.fromString("png")
  private val FmtJpeg = UTF8String.fromString("jpeg")
  private val FmtUnknown = UTF8String.fromString("unknown")

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FmtUnknown, -1, -1, -1, -1, -1))

  @inline private def u8(d: Array[Byte], i: Int): Int = d(i) & 0xff

  @inline private def be16(d: Array[Byte], i: Int): Int =
    (u8(d, i) << 8) | u8(d, i + 1)

  @inline private def be32(d: Array[Byte], i: Int): Long =
    (u8(d, i).toLong << 24) | (u8(d, i + 1) << 16) | (u8(d, i + 2) << 8) | u8(d, i + 3)

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(data: Array[Byte]): InternalRow = {
    if (data == null || data.length < 4) return unknown
    if (isPngSignature(data)) parsePng(data)
    else if (u8(data, 0) == 0xff && u8(data, 1) == 0xd8) parseJpeg(data)
    else unknown
  }

  private def isPngSignature(d: Array[Byte]): Boolean =
    d.length >= 8 &&
      u8(d, 0) == 0x89 && u8(d, 1) == 0x50 && u8(d, 2) == 0x4e && u8(d, 3) == 0x47 &&
      u8(d, 4) == 0x0d && u8(d, 5) == 0x0a && u8(d, 6) == 0x1a && u8(d, 7) == 0x0a

  private def parsePng(d: Array[Byte]): InternalRow = {
    // signature(8) + IHDR length(4) + type(4) + 13 payload bytes = 29
    if (d.length < 29) return unknown
    // IHDR MUST be the first chunk, 13 bytes long
    if (be32(d, 8) != 13L) return unknown
    if (!(u8(d, 12) == 'I' && u8(d, 13) == 'H' && u8(d, 14) == 'D' && u8(d, 15) == 'R'))
      return unknown
    val w = be32(d, 16)
    val h = be32(d, 20)
    // uint32 dims above Int.MaxValue are not representable (nor real)
    if (w <= 0L || h <= 0L || w > Int.MaxValue || h > Int.MaxValue) return unknown
    new GenericInternalRow(Array[Any](
      FmtPng, w.toInt, h.toInt, u8(d, 24), u8(d, 25), -1))
  }

  private def parseJpeg(d: Array[Byte]): InternalRow = {
    var i = 2
    var segs = 0
    var width = -1
    var height = -1
    var precision = -1
    var components = -1
    var orientation = -1
    var sofFound = false
    var ok = true
    while (ok && !(sofFound && orientation >= 0) && segs < MaxSegments && i + 1 < d.length) {
      segs += 1
      if (u8(d, i) != 0xff) ok = false
      else {
        var m = u8(d, i + 1)
        // fill bytes: any number of 0xff may pad before a marker
        while (m == 0xff && i + 2 < d.length) { i += 1; m = u8(d, i + 1) }
        if (m == 0xd9 || m == 0xda) {
          // EOI / SOS: header region over (entropy-coded data follows SOS)
          ok = false
        } else if (m >= 0xd0 && m <= 0xd8) {
          i += 2 // standalone markers (RSTn, SOI) carry no length
        } else if (i + 3 >= d.length) {
          ok = false
        } else {
          val segLen = be16(d, i + 2)
          val segEnd = i + 2 + segLen
          if (segLen < 2 || segEnd > d.length) ok = false
          else {
            val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof && !sofFound && segLen >= 8) {
              precision = u8(d, i + 4)
              height = be16(d, i + 5)
              width = be16(d, i + 7)
              components = u8(d, i + 9)
              sofFound = true
            } else if (m == 0xe1 && segLen >= 16 && orientation < 0) {
              orientation = parseExifOrientation(d, i + 4, segEnd)
            }
            i = segEnd
          }
        }
      }
    }
    if (!sofFound) unknown
    else new GenericInternalRow(Array[Any](
      FmtJpeg, width, height, precision, components, orientation))
  }

  /** TIFF IFD0 walk for tag 0x0112 inside an APP1 EXIF payload spanning
    * [start, end). Returns -1 when absent or malformed. */
  private def parseExifOrientation(d: Array[Byte], start: Int, end: Int): Int = {
    // "Exif\0\0" preamble
    if (start + 6 > end) return -1
    if (!(u8(d, start) == 'E' && u8(d, start + 1) == 'x' && u8(d, start + 2) == 'i' &&
          u8(d, start + 3) == 'f' && u8(d, start + 4) == 0 && u8(d, start + 5) == 0)) return -1
    val t = start + 6 // TIFF header origin — all IFD offsets are relative to it
    if (t + 8 > end) return -1
    val little =
      if (u8(d, t) == 'I' && u8(d, t + 1) == 'I') true
      else if (u8(d, t) == 'M' && u8(d, t + 1) == 'M') false
      else return -1
    @inline def rd16(i: Int): Int =
      if (little) u8(d, i) | (u8(d, i + 1) << 8) else be16(d, i)
    @inline def rd32(i: Int): Long =
      if (little)
        u8(d, i).toLong | (u8(d, i + 1).toLong << 8) |
          (u8(d, i + 2).toLong << 16) | (u8(d, i + 3).toLong << 24)
      else be32(d, i)
    if (rd16(t + 2) != 42) return -1
    val ifdOff = rd32(t + 4)
    if (ifdOff < 8L || t + ifdOff + 2L > end) return -1
    val ifd = t + ifdOff.toInt
    val n = math.min(rd16(ifd), MaxIfdEntries)
    var k = 0
    while (k < n) {
      val e = ifd + 2 + 12 * k
      if (e + 12 > end) return -1
      if (rd16(e) == 0x0112) {
        // type 3 (SHORT), count 1: the value sits in the value field's
        // first two bytes, in the TIFF byte order
        if (rd16(e + 2) == 3 && rd32(e + 4) == 1L) return rd16(e + 8)
        return -1
      }
      k += 1
    }
    -1
  }

  def image_header(data: Column): Column =
    Bridge.column(ImageHeader(Bridge.expression(data)))
}
