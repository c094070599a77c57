package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Flattened byte-level Aho–Corasick DFA (Aho & Corasick, CACM 1975).
  *
  * `next` is the failure-function-flattened transition table
  * (`states × 256`, indexed `state << 8 | byte`), `outs(state)` the pattern
  * ids ending at `state` — own matches plus everything inherited through
  * dictionary-suffix links, pre-merged at build time so the scan loop never
  * chases links. Matching runs over raw UTF-8 bytes: a byte-level occurrence
  * of a valid UTF-8 pattern coincides exactly with a character-level
  * occurrence (a multi-byte lead byte can never match inside another
  * code point's continuation bytes), so counts agree with the
  * character-based SQL oracle.
  *
  * Plain top-level class with array fields → Java-serializable, and its
  * name is directly spellable in generated Java (no `$` nesting), which
  * [[MultiPatternCount.doGenCode]] relies on via `addReferenceObj`.
  */
final class AcAutomaton(
    val next: Array[Int],
    val outs: Array[Array[Int]],
    val numPatterns: Int) extends Serializable {

  /** All-occurrence counts per pattern — every (pattern, end-position)
    * match is counted, including overlapping ones. Shared by interpreted
    * eval and generated code. */
  def count(text: UTF8String): GenericArrayData = {
    val counts = new Array[Long](numPatterns)
    val n = text.numBytes()
    var s = 0
    var i = 0
    while (i < n) {
      s = next((s << 8) | (text.getByte(i) & 0xff))
      val o = outs(s)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object AcAutomaton {

  /** Trie + BFS failure links, then flatten to a dense DFA. Build cost is
    * O(total pattern bytes × 256) — paid once per executor, not per row. */
  def build(patterns: Seq[String]): AcAutomaton = {
    require(patterns.nonEmpty, "multi_pattern_count: empty pattern set")
    require(patterns.forall(_.nonEmpty), "multi_pattern_count: empty pattern")
    require(patterns.distinct.length == patterns.length,
      "multi_pattern_count: duplicate patterns")
    val pats = patterns.map(_.getBytes(StandardCharsets.UTF_8))

    val goto = mutable.ArrayBuffer(Array.fill(256)(-1))
    val own = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    pats.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (goto(s)(c) < 0) {
          goto += Array.fill(256)(-1)
          own += mutable.ArrayBuffer.empty[Int]
          goto(s)(c) = goto.length - 1
        }
        s = goto(s)(c)
      }
      own(s) += pid
    }

    val states = goto.length
    val fail = new Array[Int](states)
    val outs = own.map(_.toArray).toArray
    val next = new Array[Int](states * 256)
    val queue = mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val ch = goto(0)(c)
      if (ch < 0) next(c) = 0
      else { next(c) = ch; fail(ch) = 0; queue += ch }
      c += 1
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      if (outs(fail(s)).nonEmpty) outs(s) = outs(s) ++ outs(fail(s))
      c = 0
      while (c < 256) {
        val ch = goto(s)(c)
        if (ch < 0) next((s << 8) | c) = next((fail(s) << 8) | c)
        else {
          fail(ch) = next((fail(s) << 8) | c)
          next((s << 8) | c) = ch
          queue += ch
        }
        c += 1
      }
    }
    new AcAutomaton(next, outs, pats.length)
  }
}

/** Per-pattern all-occurrence substring counts over a text column in ONE
  * scan — the blocklist/contamination-phrase kernel of a C4-style corpus
  * filter, part of the training-data extension surface (SURVEY §2.9)
  * rather than the reference's own API.
  *
  * The declarative spelling — one `regexp_count`/`replace` pass PER
  * pattern — scans the corpus N times and can't count overlapping
  * occurrences; this expression walks the flattened Aho–Corasick DFA once
  * per row (O(bytes + matches), independent of pattern count), inside
  * whole-stage codegen, with the automaton riding along as a codegen
  * reference object exactly like [[CentroidRank]]'s centroid table.
  *
  * Semantics (oracle parity): element `i` of the result is the number of
  * distinct character positions at which `patterns(i)` occurs —
  * overlapping occurrences all count ("aa" occurs twice in "aaa").
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_pattern_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  @transient private lazy val automaton: AcAutomaton = AcAutomaton.build(patterns)

  override def nullSafeEval(t: Any): Any =
    automaton.count(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("graftAc", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, t => s"$ac.count($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {

  /** `array<bigint>` of per-pattern overlapping occurrence counts. */
  def multi_pattern_count(text: Column, patterns: Seq[String]): Column = {
    AcAutomaton.build(patterns) // fail fast on invalid pattern sets
    Bridge.column(MultiPatternCount(Bridge.expression(text), patterns))
  }
}
