package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP/1.x response-head parse as a native codegen expression — the
  * protocol layer INSIDE a crawl record ([[WarcRecords]] frames the
  * container, this parses what a `response` record carries):
  * `http_head(data)` over a `binary` column returns
  * `struct<status, reason, content_type, content_length, body_offset,
  * body_md5>` per RFC 9112's message framing — the `HTTP/1.x SP status
  * SP reason` line, CRLF header lines until the empty line
  * (case-insensitive `Content-Type` / `Content-Length` extraction,
  * everything else skipped), then the body, digested in place (md5 hex)
  * and never copied.
  *
  * `content_length` is what the HEADER declared (−1 when absent);
  * `body_offset` and `body_md5` describe the ACTUAL bytes after the
  * blank line — a disagreement between the two is exactly the
  * truncated-response signal a crawl-quality pass filters on.
  *
  * Robustness contract (the [[ImageHeader]] family's): anything that is
  * not an HTTP response head — bad version prefix, non-numeric status,
  * colon-less header, missing blank line — parses to
  * `(-1, '', '', -1, -1, '')`, never an exception; header-line length
  * and header count are capped, so hostile bytes can neither overrun
  * nor spin. One bounded forward pass inside whole-stage codegen. */
case class HttpHead(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HttpHead.outType
  override def prettyName: String = "http_head"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    HttpHead.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.HttpHead.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): HttpHead =
    copy(child = newChild)
}

object HttpHead {

  val outType: StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("reason", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("body_offset", LongType, nullable = false),
    StructField("body_md5", StringType, nullable = false)))

  private val MaxHeaders = 128
  private val MaxLineBytes = 8192

  private val Empty = UTF8String.fromString("")

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](-1, Empty, Empty, -1L, -1L, Empty))

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

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
  def parse(d: Array[Byte]): InternalRow = {
    if (d == null || d.length < 12) return unknown
    // "HTTP/1." digit SP digit digit digit (SP reason)? CRLF
    if (!(d(0) == 'H' && d(1) == 'T' && d(2) == 'T' && d(3) == 'P' &&
          d(4) == '/' && d(5) == '1' && d(6) == '.')) return unknown
    val se = eol(d, 0)
    if (se < 0) return unknown
    // status: the 3 digits after the first space
    var sp = 7
    while (sp < se && d(sp) != ' ') sp += 1
    if (sp + 4 > se) return unknown
    var status = 0
    var j = sp + 1
    while (j < sp + 4) {
      val c = d(j)
      if (c < '0' || c > '9') return unknown
      status = status * 10 + (c - '0')
      j += 1
    }
    val reason =
      if (j < se && d(j) == ' ') UTF8String.fromBytes(d, j + 1, se - j - 1)
      else Empty

    var i = se + 2
    var contentType: UTF8String = Empty
    var contentLength = -1L
    var headers = 0
    var headersDone = false
    while (!headersDone && headers < MaxHeaders) {
      headers += 1
      val le = eol(d, i)
      if (le < 0) return unknown
      else if (le == i) { headersDone = true; i += 2 }
      else {
        var colon = i
        while (colon < le && d(colon) != ':') colon += 1
        if (colon >= le) return unknown
        var v = colon + 1
        while (v < le && d(v) == ' ') v += 1
        if (nameIs(d, i, colon, "content-type")) {
          contentType = UTF8String.fromBytes(d, v, le - v)
        } else if (nameIs(d, i, colon, "content-length")) {
          var n = 0L
          var k = v
          var numOk = k < le
          while (numOk && k < le) {
            val c = d(k)
            if (c < '0' || c > '9' || n > (Long.MaxValue - 9) / 10) numOk = false
            else { n = n * 10 + (c - '0'); k += 1 }
          }
          if (numOk) contentLength = n
        }
        i = le + 2
      }
    }
    if (!headersDone) return unknown // header-count cap hit
    new GenericInternalRow(Array[Any](
      status, reason, contentType, contentLength, i.toLong,
      md5Hex(d, i, d.length - i)))
  }

  def http_head(data: Column): Column =
    Bridge.column(HttpHead(Bridge.expression(data)))
}
