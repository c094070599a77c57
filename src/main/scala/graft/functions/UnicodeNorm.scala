package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (`java.text.Normalizer`) as a native codegen
  * expression: `unicode_norm(text, 'NFC'|'NFD'|'NFKC'|'NFKD')`. Spark has
  * no built-in for this, yet it is the FIRST transform of any web-scale
  * text pipeline — the same logical text arrives from crawls as composed
  * ("é") and decomposed ("e" + U+0301) byte sequences, and every
  * downstream exact/near-duplicate key ([[graft.text.TextAnalysis]]
  * shingles, [[Md5Int]] hashes, BPE merges) silently treats them as
  * different documents unless canonicalized first.
  *
  * The form argument must be a foldable string, so the `Normalizer.Form`
  * is resolved once at plan time and the per-row path is a single static
  * call. The hot path is the ASCII fast-path: a pure-ASCII value (the
  * overwhelming majority of crawl bytes) is already normalized under
  * every form and is returned as-is — no String materialization, no
  * Normalizer walk, just one byte scan. Non-ASCII values take
  * `Normalizer.isNormalized` (cheap verification pass, again
  * allocation-free when already normalized) before paying for the
  * normalize-and-copy.
  *
  * Accent stripping composes declaratively on top — see
  * [[graft.text.TextAnalysis.stripMarks]]: NFD, drop `\p{Mn}`, NFC —
  * value-identical to DuckDB's `strip_accents(nfc_normalize(x))` for
  * combining-mark accents (the oracle-gated subset; single-codepoint
  * folds like ø→o are a lookup-table policy outside Unicode
  * normalization and intentionally NOT implied).
  */
case class UnicodeNorm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  // the foldable form argument, resolved ONCE per plan: interpreted eval
  // and generated code both reference this object, so no row pays the
  // enum parse (checkInputDataTypes has already guaranteed validity)
  @transient private lazy val resolvedForm: Normalizer.Form =
    Normalizer.Form.valueOf(right.eval().toString)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) if right.foldable =>
        val f = right.eval()
        if (f != null && UnicodeNorm.formNames.contains(f.toString))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName form must be one of ${UnicodeNorm.formNames.mkString(", ")}, got $f")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable string form) inputs, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(s: Any, form: Any): Any =
    UnicodeNorm.normalize(s.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the resolved Form rides the references array (source-form class
    // name — the binary Normalizer$Form would not compile as Java source)
    val formRef =
      ctx.addReferenceObj("unicodeForm", resolvedForm, "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev,
      (s, _) => s"graft.functions.UnicodeNorm.normalize($s, $formRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNorm =
    copy(left = newLeft, right = newRight)
}

object UnicodeNorm {

  private[functions] val formNames =
    Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static entry point shared by interpreted eval and generated code.
    * The Form arrives pre-resolved from the expression's plan-time
    * lazy val — no per-row enum parse. */
  def normalize(s: UTF8String, f: Normalizer.Form): UTF8String = {
    // ASCII fast-path: every normalization form fixes ASCII, and almost
    // all crawl text is ASCII — return the original buffer untouched
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def unicode_norm(c: Column, form: String): Column =
    Bridge.column(UnicodeNorm(
      Bridge.expression(c),
      Bridge.expression(org.apache.spark.sql.functions.lit(form))))
}
