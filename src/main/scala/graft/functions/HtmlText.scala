package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML text extraction as a native codegen expression — the content
  * layer of the crawl stack ([[GzipMembers]] → [[WarcRecords]] →
  * [[HttpHead]] → this): `html_text(data)` over UTF-8 HTML bytes returns
  * `struct<title, body, n_tags>` from ONE bounded forward pass:
  *
  *  - text nodes concatenate into `body` verbatim (no whitespace
  *    collapsing — the transform is reversible and engine-exact), with
  *    `<script>`/`<style>` element CONTENT excluded (code is not
  *    training text) and `<title>` captured separately;
  *  - character references decode per the public HTML syntax: the five
  *    predefined named entities (`&amp; &lt; &gt; &quot; &apos;`) and
  *    numeric forms (`&#NNN;` / `&#xHH;`) re-encoded as UTF-8; an
  *    unterminated or unknown reference passes through literally (the
  *    browser's forgiving behavior, and the only choice that never
  *    loses bytes);
  *  - comments (`<!-- -->`) skip entirely; every other `<...>` construct
  *    counts into `n_tags` and its attributes are ignored (quoted `>`
  *    inside attribute values is honored).
  *
  * Never throws on hostile input: unterminated tags/comments/script
  * blocks consume to end-of-input under the single-pass bound; entity
  * names cap at 12 bytes, numeric code points clamp to the Unicode
  * range (invalid → literal passthrough). This is the tag-stripper
  * BASELINE of content extraction (boilerplate removal is the separate,
  * statistical [[graft.text.TextAnalysis]] concern) — at 100 TB it runs
  * inside the scan that exploded the crawl records, emitting text rows
  * that never co-exist with the markup. */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HtmlText.outType
  override def prettyName: String = "html_text"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    HtmlText.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.HtmlText.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {

  val outType: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("n_tags", IntegerType, nullable = false)))

  private val MaxEntityBytes = 12
  private val MaxTagNameBytes = 64

  @inline private def lower(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b & 0xff

  /** Write codepoint `cp` as UTF-8 into `out`. */
  private def writeCp(out: java.io.ByteArrayOutputStream, cp: Int): Unit = {
    if (cp < 0x80) out.write(cp)
    else if (cp < 0x800) {
      out.write(0xc0 | (cp >> 6)); out.write(0x80 | (cp & 0x3f))
    } else if (cp < 0x10000) {
      out.write(0xe0 | (cp >> 12)); out.write(0x80 | ((cp >> 6) & 0x3f))
      out.write(0x80 | (cp & 0x3f))
    } else {
      out.write(0xf0 | (cp >> 18)); out.write(0x80 | ((cp >> 12) & 0x3f))
      out.write(0x80 | ((cp >> 6) & 0x3f)); out.write(0x80 | (cp & 0x3f))
    }
  }

  /** Decode the character reference starting at `i` (which points at
    * '&'). Returns the index AFTER the reference and writes the decoded
    * bytes — or writes '&' and returns i+1 when it is not a valid
    * reference (literal passthrough). */
  private def entity(d: Array[Byte], i: Int, out: java.io.ByteArrayOutputStream): Int = {
    val end = math.min(d.length, i + 1 + MaxEntityBytes)
    var semi = -1
    var j = i + 1
    while (semi < 0 && j < end) {
      if (d(j) == ';') semi = j
      j += 1
    }
    if (semi < 0) { out.write('&'); return i + 1 }
    val len = semi - (i + 1)
    def is(s: String): Boolean = {
      if (len != s.length) return false
      var k = 0
      while (k < len) {
        if (lower(d(i + 1 + k)) != s.charAt(k).toInt) return false
        k += 1
      }
      true
    }
    if (is("amp")) { out.write('&'); semi + 1 }
    else if (is("lt")) { out.write('<'); semi + 1 }
    else if (is("gt")) { out.write('>'); semi + 1 }
    else if (is("quot")) { out.write('"'); semi + 1 }
    else if (is("apos")) { out.write('\''); semi + 1 }
    else if (len >= 2 && d(i + 1) == '#') {
      val hex = len >= 3 && (d(i + 2) == 'x' || d(i + 2) == 'X')
      var cp = 0L
      var k = i + (if (hex) 3 else 2)
      var valid = k < semi
      while (valid && k < semi) {
        val c = lower(d(k))
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else -1
        if (v < 0) valid = false
        else { cp = cp * (if (hex) 16 else 10) + v; if (cp > 0x10ffff) valid = false }
        k += 1
      }
      // Surrogate code points are not scalar values: writeCp would emit
      // CESU-style invalid UTF-8 that corrupts downstream digests. Treat
      // them like any other invalid reference (literal '&' passthrough),
      // matching the spec's refusal to decode &#xD800;..&#xDFFF;.
      if (cp >= 0xd800L && cp <= 0xdfffL) valid = false
      if (valid && cp > 0) { writeCp(out, cp.toInt); semi + 1 }
      else { out.write('&'); i + 1 }
    }
    else { out.write('&'); i + 1 }
  }

  /** True when the bytes at `i` case-insensitively match `s`. */
  private def matches(d: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > d.length) return false
    var k = 0
    while (k < s.length) {
      if (lower(d(i + k)) != s.charAt(k).toInt) return false
      k += 1
    }
    true
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(d: Array[Byte]): InternalRow = {
    if (d == null) return new GenericInternalRow(
      Array[Any](UTF8String.EMPTY_UTF8, UTF8String.EMPTY_UTF8, 0))
    val body = new java.io.ByteArrayOutputStream(d.length / 2 + 16)
    val title = new java.io.ByteArrayOutputStream(64)
    var sink = body
    var inTitle = false
    var nTags = 0
    var i = 0
    while (i < d.length) {
      val b = d(i)
      if (b == '<') {
        if (matches(d, i, "<!--")) {
          // comment: skip to --> (or EOF)
          i += 4
          var close = -1
          while (close < 0 && i < d.length) {
            if (d(i) == '-' && matches(d, i, "-->")) close = i
            else i += 1
          }
          i = if (close < 0) d.length else close + 3
        } else {
          // tag: name, then attributes until '>' honoring quotes
          val nameStart = i + 1
          var n = nameStart
          if (n < d.length && d(n) == '/') n += 1
          val nameEnd0 = math.min(d.length, n + MaxTagNameBytes)
          while (n < nameEnd0 && { val c = lower(d(n))
            (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') }) n += 1
          // scan to the closing '>'
          var q = 0 // 0 none, '"' or '\''
          var gt = -1
          var j = n
          while (gt < 0 && j < d.length) {
            val c = d(j)
            if (q != 0) { if (c == q) q = 0 }
            else if (c == '"' || c == '\'') q = c
            else if (c == '>') gt = j
            j += 1
          }
          val tagEnd = if (gt < 0) d.length else gt + 1
          nTags += 1
          if (matches(d, nameStart, "title") && nameStart + 5 == n) {
            inTitle = true; sink = title
          } else if (matches(d, nameStart, "/title") && nameStart + 6 == n) {
            inTitle = false; sink = body
          } else if ((matches(d, nameStart, "script") && nameStart + 6 == n) ||
                     (matches(d, nameStart, "style") && nameStart + 5 == n)) {
            // raw-text element: content skips to the matching close tag
            val closeTag = if (lower(d(nameStart)) == 's' && lower(d(nameStart + 1)) == 'c')
              "</script" else "</style"
            var at = tagEnd
            var found = -1
            while (found < 0 && at < d.length) {
              if (d(at) == '<' && matches(d, at, closeTag)) found = at
              else at += 1
            }
            if (found < 0) i = d.length
            else {
              // consume the close tag through its '>'
              var e = found + closeTag.length
              while (e < d.length && d(e) != '>') e += 1
              nTags += 1
              i = math.min(d.length, e + 1)
            }
            // fallthrough: i already set
            if (found >= 0 || i >= d.length) { /* positioned */ }
          } else {
            // plain tag consumed
          }
          if (!((matches(d, nameStart, "script") && nameStart + 6 == n) ||
                (matches(d, nameStart, "style") && nameStart + 5 == n)))
            i = tagEnd
        }
      } else if (b == '&') {
        i = entity(d, i, sink)
      } else {
        sink.write(b)
        i += 1
      }
    }
    // an unterminated <title> must not swallow the rest of the document
    // into the title silently — it already did textually; both buffers
    // are returned as parsed
    val _ = inTitle
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(title.toByteArray),
      UTF8String.fromBytes(body.toByteArray),
      nTags))
  }

  def html_text(data: Column): Column =
    Bridge.column(HtmlText(Bridge.expression(data)))
}
