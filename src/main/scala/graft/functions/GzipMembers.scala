package graft.functions

import java.util.zip.{CRC32, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** Concatenated-gzip member splitting WITH real inflation — the
  * compression layer under the crawl stack: Common Crawl ships
  * `.warc.gz` files as one gzip member PER RECORD (the multi-member
  * form RFC 1952 §2.2 allows), so `gzip_members(data)` returns
  * `array<binary>` of the INFLATED members in stream order — feed each
  * to [[WarcRecords]]/[[HttpHead]] and the whole container chain runs
  * off the compressed bytes.
  *
  * Each member is validated end-to-end per RFC 1952: magic + CM=8,
  * FLG-driven skips (FEXTRA/FNAME/FCOMMENT/FHCRC), raw-DEFLATE
  * inflation (`Inflater(nowrap)`), then the trailer — CRC32 and ISIZE
  * are CHECKED against the inflated bytes, so a corrupted member is
  * caught by checksum, not by luck. A malformed or failed-checksum
  * member ends the parse with the members already recovered (the
  * [[WarcRecords]] stop-at-malformed contract), never an exception.
  * Member count and per-member inflated size are capped, so a
  * decompression bomb terminates the parse instead of the executor.
  *
  * Inflation cost is the real work here and it is per-row scan work —
  * at 100 TB each `.warc.gz` is one `binaryFile` row inflated once
  * inside the scan stage, records exploding to rows immediately; no
  * shuffle ever carries compressed AND inflated copies together. */
case class GzipMembers(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "gzip_members"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(data: Any): Any =
    GzipMembers.parse(data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.GzipMembers.parse($d)")

  override protected def withNewChildInternal(newChild: Expression): GzipMembers =
    copy(child = newChild)
}

object GzipMembers {

  private val MaxMembers = 65536

  /** Per-member inflated-size cap: a member claiming/producing more than
    * this terminates the parse (decompression-bomb guard). */
  val MaxMemberBytes: Int = 64 * 1024 * 1024

  @inline private def u8(d: Array[Byte], i: Int): Int = d(i) & 0xff

  @inline private def le32(d: Array[Byte], i: Int): Long =
    u8(d, i).toLong | (u8(d, i + 1).toLong << 8) |
      (u8(d, i + 2).toLong << 16) | (u8(d, i + 3).toLong << 24)

  /** Skip the RFC 1952 member header starting at `i`; returns the offset
    * of the DEFLATE data, or -1 when malformed/truncated. */
  private def skipHeader(d: Array[Byte], i0: Int): Int = {
    var i = i0
    if (i + 10 > d.length) return -1
    if (!(u8(d, i) == 0x1f && u8(d, i + 1) == 0x8b && u8(d, i + 2) == 8)) return -1
    val flg = u8(d, i + 3)
    i += 10
    if ((flg & 0x04) != 0) { // FEXTRA: u16 LE length + payload
      if (i + 2 > d.length) return -1
      val xlen = u8(d, i) | (u8(d, i + 1) << 8)
      i += 2 + xlen
      if (i > d.length) return -1
    }
    if ((flg & 0x08) != 0) { // FNAME: NUL-terminated
      while (i < d.length && d(i) != 0) i += 1
      if (i >= d.length) return -1
      i += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT: NUL-terminated
      while (i < d.length && d(i) != 0) i += 1
      if (i >= d.length) return -1
      i += 1
    }
    if ((flg & 0x02) != 0) { // FHCRC: u16
      i += 2
      if (i > d.length) return -1
    }
    i
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def parse(d: Array[Byte]): ArrayData = {
    if (d == null) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var ok = true
    while (ok && out.length < MaxMembers && i < d.length) {
      val deflateAt = skipHeader(d, i)
      if (deflateAt < 0) ok = false
      else {
        val inf = new Inflater(true) // raw DEFLATE (gzip wraps it)
        try {
          inf.setInput(d, deflateAt, d.length - deflateAt)
          val bos = new java.io.ByteArrayOutputStream(1024)
          val buf = new Array[Byte](8192)
          var done = false
          while (ok && !done) {
            val n = try inf.inflate(buf)
              catch { case _: java.util.zip.DataFormatException => ok = false; 0 }
            if (n > 0) {
              if (bos.size() + n > MaxMemberBytes) ok = false // bomb guard
              else bos.write(buf, 0, n)
            }
            if (inf.finished()) done = true
            else if (n == 0 && !ok) done = true
            else if (n == 0 && inf.needsInput()) { ok = false; done = true } // truncated
          }
          if (ok) {
            val member = bos.toByteArray
            val trailerAt = deflateAt + ((d.length - deflateAt) - inf.getRemaining)
            if (trailerAt + 8 > d.length) ok = false
            else {
              // RFC 1952 trailer: CRC32 and ISIZE over the INFLATED bytes
              val crc = new CRC32
              crc.update(member)
              val wantCrc = le32(d, trailerAt)
              val wantIsize = le32(d, trailerAt + 4)
              if ((crc.getValue & 0xffffffffL) != wantCrc ||
                  (member.length.toLong & 0xffffffffL) != wantIsize) ok = false
              else {
                out += member
                i = trailerAt + 8
              }
            }
          }
        } finally inf.end()
      }
    }
    new GenericArrayData(out.toArray)
  }

  def gzip_members(data: Column): Column =
    Bridge.column(GzipMembers(Bridge.expression(data)))
}
