package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) record framing as a native codegen expression — the
  * web-crawl ingest container (Common Crawl's on-disk format):
  * `warc_records(data)` over a `binary` column holding a concatenated
  * WARC stream returns
  * `array<struct<offset, warc_type, target_uri, content_length,
  * payload_md5>>`, one element per well-formed record in stream order.
  *
  * Framing per the public spec: each record is a `WARC/1.x` version
  * line, CRLF-terminated named header lines until an empty line, then
  * exactly `Content-Length` payload bytes, then the CRLFCRLF record
  * separator. The parser extracts the typed fields, SKIPS unknown
  * headers (real WARCs carry WARC-Record-ID / WARC-Date / many more),
  * and hops payloads by declared length — payload bytes are digested
  * (md5 hex, for dedup/integrity keying downstream) but never copied
  * out.
  *
  * Robustness contract (the [[ImageHeader]] family's): a malformed
  * region — bad version line, header without a colon, negative or
  * overrunning Content-Length, missing separator — ENDS the parse and
  * returns the records already framed, never an exception; header-line
  * length, header count per record, and total record count are capped,
  * so hostile bytes can neither overrun nor spin. At 100 TB this is one
  * crawl file per row (`spark.read.format("binaryFile")` or the store's
  * payload column) exploded into per-record rows — framing is one
  * bounded forward pass, the payload hop makes it O(headers), not
  * O(bytes), per record. */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WarcRecords.outType
  override def prettyName: String = "warc_records"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    WarcRecords.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.WarcRecords.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {

  val recordType: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false)))

  val outType: DataType = ArrayType(recordType, containsNull = false)

  private val MaxRecords = 65536
  private val MaxHeaders = 64
  private val MaxLineBytes = 8192

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(d: Array[Byte], from: Int, len: Int): UTF8String = {
    val md = digests.get()
    md.reset()
    md.update(d, from, len)
    val dig = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((dig(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(dig(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Index of the next CRLF at or after `from`, bounded by MaxLineBytes;
    * -1 when absent or over the cap. */
  private def eol(d: Array[Byte], from: Int): Int = {
    var i = from
    val cap = math.min(d.length - 1, from + MaxLineBytes)
    while (i < cap) {
      if (d(i) == '\r' && d(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def asciiLower(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b & 0xff

  /** Case-insensitive ASCII match of `name` at [from, to). */
  private def nameIs(d: Array[Byte], from: Int, to: Int, name: String): Boolean = {
    if (to - from != name.length) return false
    var i = 0
    while (i < name.length) {
      if (asciiLower(d(from + i)) != name.charAt(i).toInt) return false
      i += 1
    }
    true
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(d: Array[Byte]): ArrayData =
    frame(d, emitPayload = false)

  /** [[WarcPayloads]]' entry: same framing walk, payload bytes out. */
  def parsePayloads(d: Array[Byte]): ArrayData =
    frame(d, emitPayload = true)

  /** The one framing walk both expressions run: metadata rows
    * (offset/type/uri/length/digest) or raw payload copies. */
  private def frame(d: Array[Byte], emitPayload: Boolean): ArrayData = {
    if (d == null) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var ok = true
    while (ok && out.length < MaxRecords && i < d.length) {
      val recStart = i
      // version line: "WARC/1." + digit
      val ve = eol(d, i)
      if (ve < 0 || ve - i < 8 ||
          !(d(i) == 'W' && d(i + 1) == 'A' && d(i + 2) == 'R' && d(i + 3) == 'C' &&
            d(i + 4) == '/' && d(i + 5) == '1' && d(i + 6) == '.')) {
        ok = false
      } else {
        i = ve + 2
        var warcType: UTF8String = null
        var targetUri: UTF8String = null
        var contentLength = -1L
        var headers = 0
        var headersDone = false
        while (ok && !headersDone && headers < MaxHeaders) {
          headers += 1
          val le = eol(d, i)
          if (le < 0) ok = false
          else if (le == i) { headersDone = true; i += 2 } // empty line
          else {
            // "Name: value"
            var colon = i
            while (colon < le && d(colon) != ':') colon += 1
            if (colon >= le) ok = false
            else {
              var v = colon + 1
              while (v < le && d(v) == ' ') v += 1
              if (nameIs(d, i, colon, "warc-type")) {
                warcType = UTF8String.fromBytes(d, v, le - v)
              } else if (nameIs(d, i, colon, "warc-target-uri")) {
                targetUri = UTF8String.fromBytes(d, v, le - v)
              } else if (nameIs(d, i, colon, "content-length")) {
                var n = 0L
                var j = v
                var numOk = j < le
                while (numOk && j < le) {
                  val c = d(j)
                  if (c < '0' || c > '9' || n > (Long.MaxValue - 9) / 10) numOk = false
                  else { n = n * 10 + (c - '0'); j += 1 }
                }
                if (numOk) contentLength = n else ok = false
              } // unknown headers skip
              i = le + 2
            }
          }
        }
        if (ok && !headersDone) ok = false // header-count cap hit
        if (ok) {
          if (contentLength < 0L || i + contentLength + 4 > d.length) ok = false
          else {
            val payloadAt = i
            i += contentLength.toInt
            // record separator CRLFCRLF
            if (!(d(i) == '\r' && d(i + 1) == '\n' && d(i + 2) == '\r' && d(i + 3) == '\n'))
              ok = false
            else {
              i += 4
              if (emitPayload) {
                val p = new Array[Byte](contentLength.toInt)
                System.arraycopy(d, payloadAt, p, 0, contentLength.toInt)
                out += p
              } else {
                out += new GenericInternalRow(Array[Any](
                  recStart.toLong, warcType, targetUri, contentLength,
                  md5Hex(d, payloadAt, contentLength.toInt)))
              }
            }
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  def warc_records(data: Column): Column =
    Bridge.column(WarcRecords(Bridge.expression(data)))

  def warc_payloads(data: Column): Column =
    Bridge.column(WarcPayloads(Bridge.expression(data)))
}

/** Payload extraction twin of [[WarcRecords]]: `warc_payloads(data)`
  * returns `array<binary>` — the record payloads in stream order, framed
  * by the SAME bounded walk (same caps, same stop-at-malformed
  * contract). This is the step that feeds per-record processing
  * (HTTP parse, text extraction): explode it and the payloads become
  * rows immediately, so the blob is never retained past the scan. */
case class WarcPayloads(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "warc_payloads"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    WarcRecords.parsePayloads(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.WarcRecords.parsePayloads($d)")

  override protected def withNewChildInternal(newChild: Expression): WarcPayloads =
    copy(child = newChild)
}
