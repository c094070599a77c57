package graft.functions

import java.security.MessageDigest
import java.util.zip.CRC32C

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** TFRecord shard framing as a native codegen expression — the third
  * training-container leg next to `.warc.gz` ([[GzipMembers]]) and
  * WebDataset tar ([[TarEntries]]): `tfrecord_entries(data)` over a
  * concatenated TFRecord stream returns
  * `array<struct<offset, length, payload_md5>>`, one element per record.
  *
  * Framing per the public TensorFlow format: each record is
  * `length (u64 LE) · masked-crc32c(length) (u32 LE) · payload ·
  * masked-crc32c(payload) (u32 LE)`, where the mask is the published
  * `((crc >> 15) | (crc << 17)) + 0xa282ead8`. BOTH checksums are
  * VALIDATED — a corrupted length field cannot mis-frame the stream and
  * a corrupted payload is caught, exactly the guarantees the format was
  * designed for. `offset` points at the payload bytes; payloads are
  * digested in place, never copied out.
  *
  * Robustness contract (the container-family standard): a malformed
  * region — overrunning length, failed checksum — ends the parse with
  * the records already framed, never an exception; record count and
  * per-record length are capped, so hostile lengths can neither overrun
  * nor spin. At 100 TB each shard is one `binaryFile` row exploding to
  * per-record rows inside the scan. */
case class TfRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TfRecords.outType
  override def prettyName: String = "tfrecord_entries"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    TfRecords.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.TfRecords.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): TfRecords =
    copy(child = newChild)
}

object TfRecords {

  val entryType: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false)))

  val outType: DataType = ArrayType(entryType, containsNull = false)

  private val MaxRecords = 1 << 20

  /** Per-record length cap — far above real example sizes, a guard
    * against hostile length fields. */
  val MaxRecordBytes: Long = 256L * 1024 * 1024

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(d: Array[Byte], from: Int, len: Int): UTF8String = {
    val md = digests.get()
    md.reset()
    md.update(d, from, len)
    val dig = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((dig(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(dig(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  @inline private def u8(d: Array[Byte], i: Int): Int = d(i) & 0xff

  @inline private def le32(d: Array[Byte], i: Int): Long =
    u8(d, i).toLong | (u8(d, i + 1).toLong << 8) |
      (u8(d, i + 2).toLong << 16) | (u8(d, i + 3).toLong << 24)

  @inline private def le64(d: Array[Byte], i: Int): Long =
    le32(d, i) | (le32(d, i + 4) << 32)

  /** The published TFRecord CRC mask. */
  def maskedCrc32c(d: Array[Byte], from: Int, len: Int): Long = {
    val c = new CRC32C
    c.update(d, from, len)
    val crc = c.getValue // already unsigned in a long
    val rotated = ((crc >>> 15) | (crc << 17)) & 0xffffffffL
    (rotated + 0xa282ead8L) & 0xffffffffL
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(d: Array[Byte]): ArrayData = {
    if (d == null) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var ok = true
    while (ok && out.length < MaxRecords && i + 12 <= d.length) {
      val len = le64(d, i)
      if (len < 0L || len > MaxRecordBytes || i + 12 + len + 4 > d.length) ok = false
      else if (maskedCrc32c(d, i, 8) != le32(d, i + 8)) ok = false // length crc
      else {
        val payloadAt = i + 12
        val n = len.toInt
        if (maskedCrc32c(d, payloadAt, n) != le32(d, payloadAt + n)) ok = false
        else {
          out += new GenericInternalRow(Array[Any](
            payloadAt.toLong, len, md5Hex(d, payloadAt, n)))
          i = payloadAt + n + 4
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  def tfrecord_entries(data: Column): Column =
    Bridge.column(TfRecords(Bridge.expression(data)))
}
