package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` quantized vectors as a
  * native codegen expression — the hot inner loop of the similarity-search
  * family (SURVEY §2.9 extension surface).
  *
  * The declarative equivalent (`aggregate(zip_with(a, b, _*_), 0L, _+_)`)
  * runs as interpreted higher-order functions: three lambda closures and an
  * intermediate array per row. This expression is one primitive loop over
  * the unboxed ArrayData, participates in whole-stage codegen via a static
  * call, and allocates nothing.
  *
  * Mismatched lengths score only the common prefix (callers quantize both
  * sides from the same pipeline, so lengths agree by construction).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  /** Analysis-time contract: both sides must be `array<bigint>` — the
    * SQL-registered function over e.g. array<int>/array<double> would
    * otherwise pass analysis and fail (or silently mis-read) inside
    * `ArrayData.getLong` at execution. Narrower inputs need an explicit
    * `CAST(v AS ARRAY<BIGINT>)`, making the quantization step visible at
    * the call site. */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>) inputs, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QuantizedDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {

  /** Static entry point shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def quantized_dot(a: Column, b: Column): Column =
    Bridge.column(QuantizedDot(Bridge.expression(a), Bridge.expression(b)))
}
