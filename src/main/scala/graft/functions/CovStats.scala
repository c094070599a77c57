package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Covariance sufficient statistics of a quantized vector column as a
  * native `TypedImperativeAggregate` — the second imperative aggregate
  * next to [[QuantileSketchAgg]] (SURVEY §2.9), and the scale answer for
  * [[graft.similarity.Similarity.embedCovariance]]: the declarative
  * two-posexplode form materializes n·d(d+1)/2 ROWS into the aggregate
  * (a d²× row amplification — 4.2M rows for 2,000 64-dim vectors), while
  * this accumulates the same integers in a d(d+1)/2-long buffer per
  * partition and shuffles ONE buffer per partition, never a row stream.
  * This is the tall-skinny covariance pattern: O(n·d²) multiply-adds are
  * inherent; what the aggregate removes is the per-product row overhead.
  *
  * Emits `array<struct<i, j, n, sx, sy, sxy>>` over the upper triangle —
  * the same exact integers the declarative form aggregates, so the
  * derived covariance hash-gates identically.
  *
  * Overflow discipline: every accumulation is `Math.addExact` /
  * `multiplyExact` — loud, never wrapped (the chiSquareTokens int64
  * rule). At the shared 1e-6 quantization a unit-norm corpus bounds
  * Σq_iq_j per pair by ~n·10¹²/d on average, so the int64 headroom is
  * ~10⁸–10⁹ rows per aggregate at d = 64; past that, sample the frame or
  * quantize coarser — the error raises, it does not understate.
  *
  * Dimension contract: every vector must share one dimension; a ragged
  * corpus raises rather than silently mis-pairing coordinates. */
case class CovStatsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = CovStatsAgg.outType
  override def prettyName: String = "cov_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): CovState = new CovState

  override def update(buf: CovState, input: InternalRow): CovState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // loud-error contract: toLongArray reads a null element as 0 from
      // UnsafeArrayData, which would silently accumulate a phantom zero
      // coordinate — scan and raise instead (O(d) vs the O(d²) insert)
      var k = 0
      val m = arr.numElements()
      while (k < m) {
        if (arr.isNullAt(k)) throw new IllegalArgumentException(
          s"cov_stats: null vector element at index $k")
        k += 1
      }
      buf.insert(arr.toLongArray())
    }
    buf
  }

  override def merge(buf: CovState, other: CovState): CovState = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: CovState): Any = {
    val d = buf.dim
    val out = new Array[Any](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(idx) = new GenericInternalRow(Array[Any](
          i.toLong, j.toLong, buf.n, buf.sx(i), buf.sx(j), buf.sxy(idx)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: CovState): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CovState = CovState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CovStatsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovStatsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovStatsAgg =
    copy(child = newChildren.head)
}

object CovStatsAgg {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", LongType, nullable = false),
    StructField("sy", LongType, nullable = false),
    StructField("sxy", LongType, nullable = false))), containsNull = false)

  def cov_stats(q: Column): Column =
    Bridge.column(CovStatsAgg(Bridge.expression(q))
      .toAggregateExpression(isDistinct = false))
}

/** Mutable sufficient-stat buffer: n, per-dim sums, upper-triangle
  * (row-major) cross sums. Dimension fixed by the first vector seen. */
final class CovState extends Serializable {
  private[graft] var dim: Int = 0
  private[graft] var n: Long = 0L
  private[graft] var sx: Array[Long] = Array.emptyLongArray
  private[graft] var sxy: Array[Long] = Array.emptyLongArray

  private def init(d: Int): Unit = {
    dim = d
    sx = new Array[Long](d)
    sxy = new Array[Long](d * (d + 1) / 2)
  }

  def insert(q: Array[Long]): Unit = {
    if (dim == 0) init(q.length)
    require(q.length == dim,
      s"cov_stats: ragged vector dims ($dim vs ${q.length})")
    n = Math.addExact(n, 1L)
    var idx = 0
    var i = 0
    while (i < dim) {
      val qi = q(i)
      sx(i) = Math.addExact(sx(i), qi)
      var j = i
      while (j < dim) {
        sxy(idx) = Math.addExact(sxy(idx), Math.multiplyExact(qi, q(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeWith(other: CovState): Unit = {
    if (other.dim == 0) return
    if (dim == 0) init(other.dim)
    require(other.dim == dim,
      s"cov_stats: ragged vector dims ($dim vs ${other.dim})")
    n = Math.addExact(n, other.n)
    var i = 0
    while (i < dim) { sx(i) = Math.addExact(sx(i), other.sx(i)); i += 1 }
    var k = 0
    while (k < sxy.length) { sxy(k) = Math.addExact(sxy(k), other.sxy(k)); k += 1 }
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(dim); out.writeLong(n)
    sx.foreach(out.writeLong)
    sxy.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }
}

object CovState {
  def fromBytes(bytes: Array[Byte]): CovState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new CovState
    val d = in.readInt()
    st.n = in.readLong()
    if (d > 0) {
      st.dim = d
      st.sx = Array.fill(d)(in.readLong())
      st.sxy = Array.fill(d * (d + 1) / 2)(in.readLong())
    }
    st
  }
}
