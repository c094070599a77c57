package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Rolling polynomial fingerprint of a token array as one native codegen
  * expression: `acc = (acc*31 + md5_int(token, 8)) mod P` folded
  * left-to-right, `acc0 = 0` — the per-document near-exact-dup key
  * ([[graft.text.TextAnalysis.fingerprint]]). The declarative equivalent
  * (`aggregate(tokens, 0L, lambda)`) runs as an interpreted higher-order
  * function — a closure call and boxed Long per token in the hottest text
  * path; this is one primitive loop sharing [[Md5Int.prefix]]'s digest,
  * inside whole-stage codegen.
  *
  * `mod` must be a foldable positive BIGINT small enough that
  * `(mod-1)*31 + 2^32` cannot overflow int64 (every intermediate stays
  * exact on any engine — the same bound the SQL oracle relies on). Null
  * tokens are rejected at runtime: the fold's semantics over a null are
  * engine-dependent, and the engine's tokenizers (`split`) never produce
  * them.
  */
case class FingerprintFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint_fold"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), LongType) if right.foldable =>
        val p = right.eval().asInstanceOf[Long]
        // (p-1)*31 + max md5_int(tok, 8) must stay inside int64
        if (p > 0 && p <= (Long.MaxValue - (1L << 32)) / 31L)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName modulus out of the overflow-safe range: $p")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable bigint) inputs, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(toks: Any, mod: Any): Any =
    FingerprintFold.fold(toks.asInstanceOf[ArrayData], mod.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.functions.FingerprintFold.fold($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FingerprintFold =
    copy(left = newLeft, right = newRight)
}

object FingerprintFold {

  /** Static entry point shared by interpreted eval and generated code. */
  def fold(toks: ArrayData, mod: Long): Long = {
    val n = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t == null) throw new IllegalArgumentException(
        "fingerprint_fold: null token at index " + i)
      acc = (acc * 31L + Md5Int.prefix(t, 8)) % mod
      i += 1
    }
    acc
  }

  def fingerprint_fold(tokens: Column, mod: Long): Column =
    Bridge.column(FingerprintFold(
      Bridge.expression(tokens),
      Bridge.expression(org.apache.spark.sql.functions.lit(mod))))
}
