package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-gram shingle hashes of a single-space-tokenized text as ONE
  * native codegen expression: `array<bigint>` of
  * `md5_int(shingle, 15)` values, where the shingles are exactly
  * [[graft.dedup.Dedup.shinglesAll]]'s — every window of `k` consecutive
  * `split(text, " ")` tokens joined by single spaces, in document order,
  * empty array below `k` tokens. With `distinct = true` the windows
  * dedupe by raw-byte value (UTF8String binary equality)
  * keeping first-occurrence order
  * ([[graft.dedup.Dedup.shingles]]' `array_distinct` semantics — the
  * dedupe happens before hashing, so a (cryptographically negligible)
  * md5-prefix collision between distinct grams still yields two array
  * entries, exactly as the declarative form).
  *
  * Key byte-level identity this exploits: `split` delimits on EVERY
  * single space (empty tokens between consecutive spaces included), and
  * `concat_ws(" ", ...)` re-joins with single spaces — so each shingle's
  * UTF-8 bytes are a CONTIGUOUS slice of the original text, from the
  * start of token `i` to the end of token `i+k-1`. The digest is fed
  * that slice in place: no token array, no per-gram string, no
  * interpreted higher-order functions (the declarative chain paid a
  * closure call + `k` `element_at`s + a `concat_ws` allocation per
  * window and ran outside whole-stage codegen; r18 measured it as the
  * dominant map cost of every shingle-keyed operator).
  */
case class Md5Shingles(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, IntegerType, BooleanType, IntegerType)
          if second.foldable && third.foldable && fourth.foldable =>
        val k = second.eval().asInstanceOf[Int]
        val digits = fourth.eval().asInstanceOf[Int]
        if (k >= 1 && digits >= 1 && digits <= 15) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs positive k and digits in [1, 15], got k=$k digits=$digits")
      case (t, kk, dd, gg) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int, foldable boolean, " +
          s"foldable int), got (${t.catalogString}, ${kk.catalogString}, " +
          s"${dd.catalogString}, ${gg.catalogString})")
    }

  override def nullSafeEval(text: Any, k: Any, distinct: Any, digits: Any): Any =
    Md5Shingles.hashes(text.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], distinct.asInstanceOf[Boolean], digits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k, d, g) => s"graft.functions.Md5Shingles.hashes($t, $k, $d, $g)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Md5Shingles =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object Md5Shingles {

  /** Static entry point shared by interpreted eval and generated code:
    * `digits` = md5 hex-prefix nibbles kept (15 = the md5Int60 key, 8 =
    * the md5Int32 feature hash). */
  def hashes(text: UTF8String, k: Int, distinct: Boolean, digits: Int): ArrayData = {
    val bytes = text.getBytes
    // token start offsets: a token begins at 0 and after every 0x20 byte
    // (space is a single UTF-8 byte, never part of a multibyte sequence);
    // token i spans [starts(i), ends(i)) with ends(i) = next space or EOF
    var nTokens = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) nTokens += 1
      i += 1
    }
    val nShingles = nTokens - (k - 1)
    if (nShingles <= 0) return new GenericArrayData(Array.emptyLongArray)
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
    val md = Md5Int.digest()
    val out = new Array[Long](nShingles)
    val seen =
      if (distinct) new java.util.HashSet[UTF8String](nShingles * 2) else null
    var n = 0
    var s = 0
    while (s < nShingles) {
      val from = starts(s)
      val until = ends(s + k - 1)
      // distinct on the gram's RAW BYTES (zero-copy UTF8String wrapper) —
      // `array_distinct` compares UTF8String binary content, and a
      // java.lang.String decode is LOSSY there: distinct invalid-UTF-8
      // byte sequences collapse to U+FFFD-equal strings and would merge
      if (seen == null ||
          seen.add(UTF8String.fromBytes(bytes, from, until - from))) {
        md.reset()
        md.update(bytes, from, until - from)
        val d = md.digest()
        var acc = 0L
        var j = 0
        while (j < digits) {
          val b = d(j >> 1)
          val nibble = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
          acc = (acc << 4) | nibble
          j += 1
        }
        out(n) = acc
        n += 1
      }
      s += 1
    }
    new GenericArrayData(if (n == nShingles) out else out.take(n))
  }

  def md5_shingles(text: Column, k: Int, distinct: Boolean,
      digits: Int = 15): Column =
    Bridge.column(Md5Shingles(
      Bridge.expression(text),
      Bridge.expression(org.apache.spark.sql.functions.lit(k)),
      Bridge.expression(org.apache.spark.sql.functions.lit(distinct)),
      Bridge.expression(org.apache.spark.sql.functions.lit(digits))))
}
