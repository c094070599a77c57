package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full BPE merge-table application to one word as ONE native codegen
  * expression: split the word into code-point symbols, then apply every
  * merge of `merges` IN ORDER with BPE's greedy left-to-right,
  * non-overlapping fold (`aaa` under `(a,a)` → `[aa, a]`) — exactly
  * [[graft.text.Bpe]]'s `applyMerge` chain over
  * `filter(split(w, ""), _ =!= "")`, which ran as K nested interpreted
  * `aggregate` higher-order functions, each step COPYING the accumulator
  * array (O(len²) allocations per word per merge). Here: one symbol
  * buffer, K in-place passes.
  *
  * `merges` is operator configuration (the fixed merge table), carried
  * on the expression like a literal — both engines' tables come from the
  * same [[graft.SparkEntry]] constant, so equality/canonicalization over
  * it is exact.
  */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_word"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.catalogString}")
    }

  @transient private lazy val mergesArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(word: Any): Any =
    BpeEncodeWord.encode(word.asInstanceOf[UTF8String], mergesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", mergesArr, "scala.Tuple2[]")
    defineCodeGen(ctx, ev, w => s"graft.functions.BpeEncodeWord.encode($w, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}

object BpeEncodeWord {

  /** Static entry point shared by interpreted eval and generated code. */
  def encode(word: UTF8String, merges: Array[(String, String)]): ArrayData = {
    // code-point symbols: split(w, "") positions at code-point boundaries,
    // which are exactly the UTF-8 lead-byte boundaries
    val s = word.toString
    var syms = new Array[String](s.codePointCount(0, s.length))
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val len = Character.charCount(cp)
      syms(n) = s.substring(i, i + len)
      n += 1
      i += len
    }
    var m = 0
    while (m < merges.length) {
      val a = merges(m)._1
      val b = merges(m)._2
      val merged = a + b
      // greedy left-to-right, non-overlapping: glue b onto a matching
      // previous symbol, in place (out index trails the scan index)
      var out = 0
      var j = 0
      while (j < n) {
        if (out > 0 && syms(out - 1) == a && syms(j) == b) {
          syms(out - 1) = merged
        } else {
          syms(out) = syms(j)
          out += 1
        }
        j += 1
      }
      n = out
      m += 1
    }
    val res = new Array[Any](n)
    var r = 0
    while (r < n) { res(r) = UTF8String.fromString(syms(r)); r += 1 }
    new GenericArrayData(res)
  }

  def bpe_encode_word(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeWord(Bridge.expression(word), merges))
}
