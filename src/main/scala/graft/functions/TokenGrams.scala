package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-gram STRINGS of a single-space-tokenized text as ONE native
  * codegen expression: `array<string>` of every window of `k`
  * consecutive `split(text, " ")` tokens joined by single spaces, in
  * document order (multiset — [[graft.dedup.Dedup.shinglesAll]]'s
  * contract), empty array below `k` tokens.
  *
  * Same byte-slice identity as [[Md5Shingles]]: each gram is a
  * CONTIGUOUS slice of the text's UTF-8 payload (split delimits on every
  * single space, `concat_ws(" ", ...)` re-joins with single spaces), so
  * every gram is a zero-copy `UTF8String` view over the input buffer —
  * no token array, no string building, no interpreted higher-order
  * functions (the declarative `transform(sequence(...), slice/concat_ws)`
  * chain paid a closure call and gram allocation per window, outside
  * whole-stage codegen).
  */
case class TokenGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val k = right.eval().asInstanceOf[Int]
        if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs positive k, got $k")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int) inputs, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(text: Any, k: Any): Any =
    TokenGrams.grams(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.functions.TokenGrams.grams($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenGrams =
    copy(left = newLeft, right = newRight)
}

object TokenGrams {

  /** Static entry point shared by interpreted eval and generated code. */
  def grams(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) nTokens += 1
      i += 1
    }
    val nGrams = nTokens - (k - 1)
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) {
        ends(t) = i
        t += 1
        starts(t) = i + 1
      }
      i += 1
    }
    ends(t) = bytes.length
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      out(g) = UTF8String.fromBytes(bytes, from, ends(g + k - 1) - from)
      g += 1
    }
    new GenericArrayData(out)
  }

  def token_grams(text: Column, k: Int): Column =
    Bridge.column(TokenGrams(
      Bridge.expression(text),
      Bridge.expression(org.apache.spark.sql.functions.lit(k))))
}
