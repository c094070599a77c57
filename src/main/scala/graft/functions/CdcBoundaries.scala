package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries as one native codegen expression:
  * the Rabin-Karp rolling-hash cut rule behind content-defined chunking
  * (Muthitacharoen et al. 2001, "A low-bandwidth network file system";
  * FastCDC) — the segmenter that makes segment-level dedup robust to
  * insertions, where fixed-stride chunks ([[graft.text.TextAnalysis.chunk]],
  * `Dedup.segmentDedup`'s token windows) shift all downstream segment
  * hashes after a single inserted character.
  *
  * A window of `w` code points slides over the text; position `i` (1-based,
  * `i >= w`) is a boundary when the window hash `Σ_{j<w} cp(c_{i-j})·B^j
  * mod M` is ≡ 0 mod `mask` (B = 31, M = 1e9+7 — every intermediate stays
  * inside int64, the overflow-safe-bound discipline of
  * [[FingerprintFold]]). The expected chunk length is `mask` characters;
  * production deployments clamp chunks to a [min, max] band on top of
  * this rule — a post-pass over the boundary array that callers compose
  * when needed.
  *
  * Why native: the rolling form is O(n) per document — each step adds one
  * code point and evicts one (`B^w mod M` precomputed at bind time) —
  * where the declarative higher-order-function equivalent recomputes the
  * O(w) window sum per position through boxed-lambda interpretation. The
  * oracle replays the O(n·w) direct sum in HUGEINT; same residues, same
  * boundaries.
  */
case class CdcBoundaries(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (org.apache.spark.sql.types.StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        val w = second.eval().asInstanceOf[Int]
        val mask = third.eval().asInstanceOf[Int]
        if (w >= 2 && w <= 256 && mask >= 2)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires 2 <= w <= 256 and mask >= 2, got ($w, $mask)")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int, foldable int), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def nullSafeEval(text: Any, w: Any, mask: Any): Any =
    CdcBoundaries.boundaries(text.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], mask.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, w, m) => s"graft.functions.CdcBoundaries.boundaries($t, $w, $m)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CdcBoundaries =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcBoundaries {

  val Base = 31L
  val Mod = 1000000007L

  /** Static entry point shared by interpreted eval and generated code.
    * Returns the 1-based end positions (in code points) of every window
    * whose hash ≡ 0 (mod mask). */
  def boundaries(text: UTF8String, w: Int, mask: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.emptyIntArray)
    // B^w mod M for the eviction term
    var bw = 1L
    var k = 0
    while (k < w) { bw = (bw * Base) % Mod; k += 1 }
    val out = new java.util.ArrayList[Integer]()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * Base + cps(i)) % Mod
      if (i >= w) {
        // evict cps(i-w): its weight after w more multiplies is B^w
        h = (h - (cps(i - w) * bw) % Mod + Mod) % Mod
      }
      if (i >= w - 1 && h % mask == 0) out.add(i + 1)
      i += 1
    }
    val arr = new Array[Int](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  def cdc_boundaries(text: Column, w: Int, mask: Int): Column =
    Bridge.column(CdcBoundaries(
      Bridge.expression(text),
      Bridge.expression(org.apache.spark.sql.functions.lit(w)),
      Bridge.expression(org.apache.spark.sql.functions.lit(mask))))
}
