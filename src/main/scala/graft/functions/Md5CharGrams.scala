package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character q-gram md5 hashes of a text as ONE native codegen
  * expression: `array<bigint>` of `md5_int(substring(text, i, q), 15)`
  * for every 1-based character position, document order; with
  * `distinct = true` grams dedupe by STRING value keeping
  * first-occurrence order (the `array_distinct(transform(...))` +
  * per-gram [[Md5Int]] chain this replaces — that chain ran as
  * interpreted higher-order functions with a substring allocation per
  * position). Texts shorter than `q` characters yield an empty array.
  * Character-based slicing: multi-byte UTF-8 grams hash exactly the
  * bytes of the character substring ([[WinnowFps]]' offset walk).
  */
case class Md5CharGrams(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_chargrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, BooleanType)
          if second.foldable && third.foldable =>
        val q = second.eval().asInstanceOf[Int]
        if (q >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs positive q, got $q")
      case (t, qq, dd) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int, foldable boolean), " +
          s"got (${t.catalogString}, ${qq.catalogString}, ${dd.catalogString})")
    }

  override def nullSafeEval(text: Any, q: Any, distinct: Any): Any =
    Md5CharGrams.hashes(text.asInstanceOf[UTF8String],
      q.asInstanceOf[Int], distinct.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, q, d) => s"graft.functions.Md5CharGrams.hashes($t, $q, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Md5CharGrams =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Md5CharGrams {

  /** Static entry point shared by interpreted eval and generated code. */
  def hashes(text: UTF8String, q: Int, distinct: Boolean): ArrayData = {
    val bytes = text.getBytes
    val nChars = text.numChars()
    val nGrams = nChars - (q - 1)
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (ci < nChars) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bytes.length
    val md = Md5Int.digest()
    val out = new Array[Long](nGrams)
    val seen =
      if (distinct) new java.util.HashSet[UTF8String](nGrams * 2) else null
    var n = 0
    var g = 0
    while (g < nGrams) {
      val from = offs(g)
      val until = offs(g + q)
      // dedupe on raw bytes (zero-copy wrapper) — array_distinct's binary
      // UTF8String equality, not the lossy java.lang.String decode
      if (seen == null ||
          seen.add(UTF8String.fromBytes(bytes, from, until - from))) {
        md.reset()
        md.update(bytes, from, until - from)
        val d = md.digest()
        var acc = 0L
        var j = 0
        while (j < 15) {
          val b = d(j >> 1)
          val nibble = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
          acc = (acc << 4) | nibble
          j += 1
        }
        out(n) = acc
        n += 1
      }
      g += 1
    }
    new GenericArrayData(if (n == nGrams) out else out.take(n))
  }

  def md5_chargrams(text: Column, q: Int, distinct: Boolean): Column =
    Bridge.column(Md5CharGrams(
      Bridge.expression(text),
      Bridge.expression(org.apache.spark.sql.functions.lit(q)),
      Bridge.expression(org.apache.spark.sql.functions.lit(distinct))))
}
