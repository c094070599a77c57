package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** `with_size(array<bigint>)` → `array<struct<v bigint, n int>>`: each
  * element paired with the ARRAY's length, in one pass.
  *
  * Why it exists (plan shape, not convenience): a consumer that needs
  * both `explode(arr)` and `size(arr)` must either reference `arr` twice
  * — and `InferFiltersFromGenerate` then rewrites the attribute-rooted
  * explode into a `size(arr) > 0 AND isnotnull(arr)` filter that
  * predicate pushdown re-substitutes through the producing Project,
  * re-evaluating the (expensive, e.g. [[Md5Shingles]]) array builder 2×
  * per row below the explode — or route the array through this wrapper:
  * the generator input is no longer a bare attribute, the infer rule
  * skips it (exactly as it skips `explode(md5_shingles(text))` itself),
  * and the builder runs once per row. The struct wrapper costs one
  * 12-byte row per element, dwarfed by the hashing it de-triplicates. */
case class WithSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WithSize.outType
  override def prettyName: String = "with_size"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(arr: Any): Any =
    WithSize.wrap(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WithSize.wrap($a)")

  override protected def withNewChildInternal(newChild: Expression): WithSize =
    copy(child = newChild)
}

object WithSize {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("n", IntegerType, nullable = false))), containsNull = false)

  /** Static entry point shared by interpreted eval and generated code. */
  def wrap(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = new GenericInternalRow(Array[Any](arr.getLong(i), n))
      i += 1
    }
    new GenericArrayData(out)
  }

  def with_size(arr: Column): Column =
    Bridge.column(WithSize(Bridge.expression(arr)))
}
