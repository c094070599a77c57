package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's md5 stream partitioner as a native Catalyst expression:
  * `abs(int32LE(md5(key))) % partitionCount`, with the `partitionCount == 1`
  * fast path returning 0 (reference: `src/helpers/partition.ts:3-17`; golden
  * vectors: `test/unit/Partitioner.test.ts:18-38`).
  *
  * Codegen-friendly (participates in whole-stage codegen via a static call,
  * no interpreted fallback). Null key => null, letting callers decide the
  * fallback (the reference picks a random partition for a missing key, which
  * a caller reproduces with `coalesce(md5_partition(k, n), (rand()*n).cast)`).
  */
case class Md5Partition(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs are coerced in the md5_partition Column wrapper (STRING, INT).
  override def dataType: DataType = IntegerType
  override def prettyName: String = "md5_partition"

  override def nullSafeEval(key: Any, n: Any): Any =
    Md5Partition.partition(key.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) => s"graft.functions.Md5Partition.partition($k, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Partition =
    copy(left = newLeft, right = newRight)
}

object Md5Partition {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def partition(key: UTF8String, partitionCount: Int): Int = {
    if (partitionCount == 1) return 0 // fast path, partition.ts:6-8
    require(partitionCount > 0, "partitionCount must be positive")
    val md = digests.get()
    md.reset()
    val d = md.digest(key.getBytes)
    // signed little-endian int32 of the first 4 digest bytes
    // (Node Buffer.readInt32LE, partition.ts:10-12)
    val intLE = (d(0) & 0xff) | ((d(1) & 0xff) << 8) |
      ((d(2) & 0xff) << 16) | ((d(3) & 0xff) << 24)
    // abs in Long space: JS Math.abs never overflows; JVM Int.MinValue would.
    (math.abs(intLE.toLong) % partitionCount).toInt
  }

  def md5_partition(key: Column, partitionCount: Column): Column =
    Bridge.column(Md5Partition(
      Bridge.expression(key.cast("string")),
      Bridge.expression(partitionCount.cast("int"))))
}
