package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as ONE native codegen expression: all `k`-char-gram md5 hashes of
  * `text` plus the rightmost-minimum selection over every `w`-gram
  * window, returning `array<struct<pos bigint, fp bigint>>` — one entry
  * per window position `j` (1-based): the window's minimum hash and the
  * 1-based gram position of its RIGHTMOST occurrence.
  *
  * Value-identical to the declarative form this replaces
  * (`transform(sequence...)` of [[Md5Int]] grams, then a per-window
  * min/rightmost-position fold): gram hashes are
  * `md5_int(substring(text, i, k), 15)` — same character-based substring
  * semantics, same digest-prefix arithmetic — and ties select the latest
  * position, exactly the `array_min` + rightmost `array_position` rule.
  * The win is mechanical, not semantic: the higher-order-function chain
  * ran interpreted (a closure call and boxed struct per window STEP —
  * O(n·w) lambda evaluations; r18 measured 73 CPU-seconds on the sf0.1
  * consensus sweep), while this is one primitive loop per document with
  * an O(n) ascending-minima deque, inside whole-stage codegen.
  *
  * `k`/`w` must be foldable positive ints. Documents shorter than
  * `w + k − 1` characters yield an empty array (the caller's filter
  * drops them anyway — the paper's guarantee threshold).
  */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = WinnowFps.outType
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        val k = second.eval().asInstanceOf[Int]
        val w = third.eval().asInstanceOf[Int]
        if (k >= 1 && w >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs positive k and w, got k=$k w=$w")
      case (t, kk, ww) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int, foldable int), " +
          s"got (${t.catalogString}, ${kk.catalogString}, ${ww.catalogString})")
    }

  override def nullSafeEval(text: Any, k: Any, w: Any): Any =
    WinnowFps.select(text.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) => s"graft.functions.WinnowFps.select($t, $k, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFps =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowFps {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  /** Static entry point shared by interpreted eval and generated code. */
  def select(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    // character boundaries of the UTF-8 payload, so gram slicing matches
    // the character-based substring(text, i, k) the declarative form used
    val nChars = text.numChars()
    val nGrams = nChars - (k - 1)
    val nWins = nGrams - (w - 1)
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (ci < nChars) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bytes.length
    // gram hashes: md5 prefix over the gram's UTF-8 bytes (== md5_int of
    // the character substring, digest fed in place — no per-gram copies)
    val md = Md5Int.digest()
    val h = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      md.reset()
      md.update(bytes, offs(g), offs(g + k) - offs(g))
      val d = md.digest()
      // first 15 nibbles big-endian — Md5Int.prefix(key, 15)
      var acc = 0L
      var i = 0
      while (i < 15) {
        val b = d(i >> 1)
        val nibble = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
        acc = (acc << 4) | nibble
        i += 1
      }
      h(g) = acc
      g += 1
    }
    // ascending-minima deque over 0-based gram indices: values strictly
    // increasing front→back; pops on `>=` keep the RIGHTMOST tied minimum
    // at the front — the array_min + rightmost array_position rule
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Any](nWins)
    var p = 0
    while (p < nGrams) {
      while (tail > head && h(deque(tail - 1)) >= h(p)) tail -= 1
      deque(tail) = p
      tail += 1
      val j = p - (w - 1) // 0-based window start whose window just completed
      if (j >= 0) {
        if (deque(head) < j) head += 1
        val m = deque(head)
        // 1-based (pos, fp) struct, window order
        out(j) = InternalRow((m + 1).toLong, h(m))
      }
      p += 1
    }
    new GenericArrayData(out)
  }

  def winnow_fps(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(
      Bridge.expression(text),
      Bridge.expression(org.apache.spark.sql.functions.lit(k)),
      Bridge.expression(org.apache.spark.sql.functions.lit(w))))
}
