package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** POSIX ustar (tar) archive framing as a native codegen expression —
  * the WebDataset container (multimodal training data ships as `.tar`
  * files whose member files pair into samples by filename stem):
  * `tar_entries(data)` returns
  * `array<struct<name, type_flag, size, offset, payload_md5>>`, one
  * element per archive member in order.
  *
  * Framing per the public ustar layout: 512-byte header blocks — name
  * (100 bytes, NUL-padded), size (12 bytes octal), typeflag, `ustar`
  * magic — each followed by `ceil(size/512)` data blocks; the archive
  * ends at two zero blocks or end-of-input. The header CHECKSUM is
  * validated (unsigned byte sum with the checksum field read as
  * spaces), so bit rot in a header is caught, not mis-framed. Payload
  * bytes are digested in place and never copied out.
  *
  * Robustness contract (the [[WarcRecords]] family's): a malformed
  * header — bad magic, non-octal size, checksum mismatch, data blocks
  * overrunning the buffer — ends the parse with the members already
  *framed, never an exception; entry count is capped. At 100 TB each
  * `.tar` shard is one `binaryFile` row exploding into member rows
  * inside the scan — the WebDataset reader's shape, declaratively. */
case class TarEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TarEntries.outType
  override def prettyName: String = "tar_entries"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    TarEntries.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.TarEntries.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): TarEntries =
    copy(child = newChild)
}

object TarEntries {

  val entryType: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("type_flag", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false)))

  val outType: DataType = ArrayType(entryType, containsNull = false)

  private val MaxEntries = 65536
  private val Block = 512

  /** Per-entry payload cap (the [[TfRecords.MaxRecordBytes]] pattern): a
    * ustar size field can encode up to 8^11-1 ≈ 8.5e9, far past what one
    * in-memory shard blob can hold — a forged header claiming more than
    * this stops the walk instead of driving offset arithmetic. */
  val MaxEntryBytes: Long = 256L * 1024 * 1024

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

  /** Parse a NUL/space-terminated octal field; -1 when malformed. */
  private def octal(d: Array[Byte], from: Int, len: Int): Long = {
    var i = from
    val end = from + len
    while (i < end && (d(i) == ' ')) i += 1
    var v = 0L
    var any = false
    while (i < end && d(i) != 0 && d(i) != ' ') {
      val c = d(i)
      if (c < '0' || c > '7' || v > (Long.MaxValue - 7) / 8) return -1L
      v = v * 8 + (c - '0')
      any = true
      i += 1
    }
    if (any) v else -1L
  }

  private def nulString(d: Array[Byte], from: Int, len: Int): UTF8String = {
    var n = 0
    while (n < len && d(from + n) != 0) n += 1
    UTF8String.fromBytes(d, from, n)
  }

  private def zeroBlock(d: Array[Byte], at: Int): Boolean = {
    var i = at
    val end = at + Block
    while (i < end) {
      if (d(i) != 0) return false
      i += 1
    }
    true
  }

  /** Header checksum: unsigned sum of all 512 bytes with the checksum
    * field (148..155) read as ASCII spaces. */
  private def headerSum(d: Array[Byte], at: Int): Long = {
    var s = 0L
    var i = 0
    while (i < Block) {
      s += (if (i >= 148 && i < 156) 32 else d(at + i) & 0xff)
      i += 1
    }
    s
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(d: Array[Byte]): ArrayData = {
    if (d == null) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var ok = true
    while (ok && out.length < MaxEntries && i + Block <= d.length) {
      if (zeroBlock(d, i)) ok = false // end-of-archive marker
      else {
        // ustar magic at 257: "ustar" NUL (POSIX) or "ustar " (GNU)
        val magicOk = d(i + 257) == 'u' && d(i + 258) == 's' && d(i + 259) == 't' &&
          d(i + 260) == 'a' && d(i + 261) == 'r'
        val size = octal(d, i + 124, 12)
        val chksum = octal(d, i + 148, 8)
        if (!magicOk || size < 0L || size > MaxEntryBytes || chksum < 0L ||
          headerSum(d, i) != chksum) ok = false
        else {
          // Long arithmetic throughout: a valid-checksum header can still
          // claim ~8.5e9 bytes, which wraps Int offsets negative and would
          // break the never-throw contract on the md5 slice below.
          val dataBlocks = (size + Block - 1) / Block
          val end = i.toLong + Block + dataBlocks * Block
          if (end > d.length) ok = false
          else {
            val typeFlag = {
              val t = d(i + 156)
              // NUL typeflag means regular file in old archives
              if (t == 0) UTF8String.fromString("0")
              else UTF8String.fromBytes(Array(t))
            }
            out += new GenericInternalRow(Array[Any](
              nulString(d, i, 100), typeFlag, size, (i + Block).toLong,
              md5Hex(d, i + Block, size.toInt)))
            i = end.toInt
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  def tar_entries(data: Column): Column =
    Bridge.column(TarEntries(Bridge.expression(data)))
}
