package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of two dimension values into one 62-bit
  * sort key: bit i of `left` lands at position 2i, bit i of `right` at
  * 2i+1. Sorting or range-bucketing by the z-value clusters rows that are
  * close in BOTH dimensions into the same file/bucket, so a scan filtered
  * on either dimension (or a box on both) prunes most files by their
  * min/max footer stats — the multi-dimensional data-layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed here as a plain codegen
  * expression so any writer (`repartitionByRange(zorder2(x, y))` +
  * sortWithinPartitions) gets the layout without a new operator.
  *
  * Inputs must be non-negative and < 2^31 (dimension values are expected
  * to be bucketized/normalized first — minutes-since-epoch, id spaces,
  * quantized doubles); the result then occupies bits 0..61, keeping the
  * BIGINT sign bit clear so numeric order IS z-curve order on every
  * engine. Out-of-range values throw rather than silently fold: a wrapped
  * dimension would scatter the curve and corrupt the layout invisibly.
  *
  * The bit spread is the classic five-step mask-shift sequence — O(1),
  * branch-free, inside whole-stage codegen; the SQL oracle replays the
  * identical masks with BIGINT bitwise ops.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) inputs, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder2.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 31 bits of `v` to even bit positions 0,2,..,60. */
  def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def interleave(a: Long, b: Long): Long = {
    if (a < 0L || a >= (1L << 31) || b < 0L || b >= (1L << 31))
      throw new IllegalArgumentException(
        s"zorder2: dimension out of [0, 2^31): ($a, $b) — bucketize first")
    spread(a) | (spread(b) << 1)
  }

  def zorder2(x: Column, y: Column): Column =
    Bridge.column(ZOrder2(Bridge.expression(x), Bridge.expression(y)))
}
