package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First `hexDigits` nibbles of `md5(key)` as a non-negative int64 — the
  * engine's fixed-width hash key maker, equal by construction to the
  * declarative `conv(substring(md5(c), 1, n), 16, 10)` and to DuckDB's
  * `('0x' || substr(md5(c), 1, n))::BIGINT`, but computed straight from the
  * digest bytes: no 32-char hex string materialized, no substring copy, no
  * base-16 parse per value. The md5-prefix trick is the reference's own
  * partitioner idiom (`src/helpers/partition.ts:10-12`).
  *
  * This sits in the hottest extension paths — one evaluation per shingle
  * (×16 per shingle under MinHash), per token for SimHash/fingerprints — so
  * it is a native codegen expression like [[Md5Partition]].
  *
  * `hexDigits` must be a foldable integer in [1, 15] (15 nibbles = 60 bits
  * keeps the value inside signed int64, matching the SQL forms).
  */
case class Md5Int(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_int"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val n = right.eval().asInstanceOf[Int]
        if (n >= 1 && n <= 15) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName digits must be in [1, 15], got $n")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int) inputs, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(key: Any, n: Any): Any =
    Md5Int.prefix(key.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) => s"graft.functions.Md5Int.prefix($k, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Int =
    copy(left = newLeft, right = newRight)
}

object Md5Int {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Shared per-thread digest for sibling native expressions that hash
    * many byte slices per row (e.g. [[WinnowFps]]) without re-allocating
    * a MessageDigest per value. Callers must `reset()` before use. */
  private[functions] def digest(): MessageDigest = digests.get()

  /** Static entry point shared by interpreted eval and generated code:
    * accumulate the first `hexDigits` nibbles of the digest big-endian,
    * exactly the value of parsing the hex-prefix string base 16. */
  def prefix(key: UTF8String, hexDigits: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(key.getBytes)
    var acc = 0L
    var i = 0
    while (i < hexDigits) {
      val b = d(i >> 1)
      val nibble = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      acc = (acc << 4) | nibble
      i += 1
    }
    acc
  }

  def md5_int(key: Column, hexDigits: Int): Column =
    Bridge.column(Md5Int(
      Bridge.expression(key),
      Bridge.expression(org.apache.spark.sql.functions.lit(hexDigits))))
}
