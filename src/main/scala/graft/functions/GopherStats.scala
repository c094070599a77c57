package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The four integer counters of the Gopher word-quality gate
  * ([[graft.text.TextAnalysis.gopherQuality]]) in ONE native codegen byte
  * walk: `gopher_stats(text)` returns
  * `struct<n_words, word_chars, n_alpha_words, n_symbols>`, value-identical
  * to the declarative chain it replaces —
  *
  *   - `n_words`       = `size(split(text, " "))` — one more than the
  *     count of 0x20 bytes (`split` keeps empty tokens, including
  *     leading/trailing ones);
  *   - `word_chars`    = `length(regexp_replace(text, " ", ""))` — the
  *     CHARACTER count (UTF-8 sequence starts, i.e. non-continuation
  *     bytes) minus the space count;
  *   - `n_alpha_words` = `size(filter(tokens, t -> t rlike '[A-Za-z]'))`
  *     — tokens containing at least one ASCII letter byte (ASCII bytes
  *     never occur inside a multibyte UTF-8 sequence, so the byte test
  *     is exact);
  *   - `n_symbols`     = `regexp_count(text, '[#]|[.][.][.]')` — the
  *     regex engine's left-to-right non-overlapping scan: at each
  *     position `#` matches and advances one char, else `...` matches
  *     and advances three, else advance one. `#`/`.` are single bytes,
  *     so the byte replay is exact.
  *
  * Why: the declarative form paid an interpreted higher-order `filter`
  * with a per-token `rlike` (regex machinery per word), a full-string
  * `regexp_replace` copy, and a `regexp_count` scan — three passes, two
  * of them outside whole-stage codegen, measured at ~11 CPU-s inside
  * every crawl-curation landing at sf0.1 (r18 event logs). This is one
  * branchy byte loop, no allocation beyond the result row.
  * GopherStatsSpec pins the equivalence against the declarative replay,
  * including multi-space, empty-token, unicode and symbol-overlap edges.
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStats.outType
  override def prettyName: String = "gopher_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(text: Any): Any =
    GopherStats.stats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.GopherStats.stats($t)")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {

  val outType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("word_chars", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_symbols", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code. */
  def stats(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var spaces = 0L
    var chars = 0L
    var alphaWords = 0L
    var symbols = 0L
    var tokenHasAlpha = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      // UTF-8 continuation bytes (10xxxxxx) are not character starts
      if ((b & 0xc0) != 0x80) chars += 1
      if (b == 0x20) {
        spaces += 1
        if (tokenHasAlpha) { alphaWords += 1; tokenHasAlpha = false }
        i += 1
      } else {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z'))
          tokenHasAlpha = true
        if (b == '#') { symbols += 1; i += 1 }
        else if (b == '.' && i + 2 < n && bytes(i + 1) == '.' &&
            bytes(i + 2) == '.') {
          symbols += 1
          // the two consumed dots are character starts too
          chars += 2
          i += 3
        } else i += 1
      }
    }
    if (tokenHasAlpha) alphaWords += 1
    new GenericInternalRow(Array[Any](
      spaces + 1L, chars - spaces, alphaWords, symbols))
  }

  def gopher_stats(text: Column): Column =
    Bridge.column(GopherStats(Bridge.expression(text)))

  /** The combined pass/fail verdict over the same counters, in one walk:
    * exactly `gopherQuality`'s `passes_gopher = 1` predicate (same IEEE
    * double divisions and comparisons, null text → null → row drops
    * under a filter). Shared by interpreted eval and generated code. */
  def passes(text: UTF8String, minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolRatio: Double, minAlphaFrac: Double): Boolean = {
    val r = stats(text)
    val nWords = r.getLong(0)
    val meanLen = r.getLong(1).toDouble / nWords.toDouble
    val symbolRatio = r.getLong(3).toDouble / nWords.toDouble
    val alphaFrac = r.getLong(2).toDouble / nWords.toDouble
    nWords >= minWords && nWords <= maxWords &&
      meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
      symbolRatio <= maxSymbolRatio && alphaFrac >= minAlphaFrac
  }

  def gopher_pass(text: Column, minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolRatio: Double, minAlphaFrac: Double): Column =
    Bridge.column(GopherPass(Bridge.expression(text), minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, minAlphaFrac))
}

/** `gopher_pass(text)` → boolean: [[GopherStats.passes]] as ONE
  * expression with the thresholds as literals-in-the-node, so a filter
  * on the verdict evaluates the byte walk exactly once per row — a
  * struct-column + multi-field predicate gets its alias substituted by
  * predicate pushdown into one `gopher_stats(text)` call PER FIELD
  * REFERENCE (nine in the full verdict; observed in the q_pipeline plan
  * before this expression existed). */
case class GopherPass(child: Expression, minWords: Int, maxWords: Int,
    minMeanWordLen: Double, maxMeanWordLen: Double,
    maxSymbolRatio: Double, minAlphaFrac: Double) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "gopher_pass"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(text: Any): Any =
    GopherStats.passes(text.asInstanceOf[UTF8String], minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, minAlphaFrac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.GopherStats.passes($t, $minWords, $maxWords, " +
        s"$minMeanWordLen, $maxMeanWordLen, $maxSymbolRatio, $minAlphaFrac)")

  override protected def withNewChildInternal(newChild: Expression): GopherPass =
    copy(child = newChild)
}
