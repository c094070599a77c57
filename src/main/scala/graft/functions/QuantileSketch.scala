package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable KLL-style quantile sketch as a native aggregate
  * (`TypedImperativeAggregate`): estimate any set of quantiles of a
  * double column in ONE pass with O(k·log(n/k)) memory per group, fully
  * mergeable across partitions — the aggregation-surface answer to
  * percentiles at 100 TB, where `percentile_approx`'s interpolation or an
  * exact sort-based percentile is either engine-specific or a global
  * sort. (SURVEY §2.9 — extends the engine's extension surface from
  * scalar codegen expressions to the imperative-aggregate tier, the same
  * tier Spark implements HyperLogLog++ in.)
  *
  * Structure (Karnin–Lall–Liberty, FOCS 2016, simplified to the classic
  * uniform-capacity compactor hierarchy): level h holds items of weight
  * 2^h; when a level overflows its capacity `k`, the buffer is sorted and
  * every other item is promoted to level h+1 (the survivors alternate
  * between odd and even positions on successive compactions of that
  * level — deterministic, no RNG, which keeps the sketch reproducible for
  * a fixed insertion order and keeps the classic GK-style rank-error
  * analysis: each compaction of level h perturbs any rank by ≤ 2^h, and a
  * level compacts at most n/(k·2^h) times, telescoping to ε ≈ O(log²(n/k)/k)
  * for the uniform-capacity variant).
  *
  * Rank semantics at eval: nearest-rank over the weighted item multiset —
  * quantile p is the smallest item whose cumulative weight ≥ max(1,
  * ceil(p·W)). With `k` at or above the group size no compaction ever
  * fires and the estimate IS the exact nearest-rank percentile (the
  * property the spec pins).
  *
  * Scale shape: per-group state is bounded (≈ k·log₂(n/k) doubles),
  * partial aggregation is a sketch merge (map-side combine works), and
  * the shuffle carries one serialized sketch per (partition, group) —
  * never the data. Merge order across partitions is engine-scheduled, so
  * two runs may emit different estimates WITHIN the same error bound
  * (exactly like `approx_count_distinct`) — hence the rows-only gate with
  * the exact hash-gated twin q_percentiles.
  */
case class QuantileSketchAgg(
    child: Expression,
    probs: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) {
      if (k >= 8 && probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k >= 8 and probs within [0, 1]")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllSketch, other: KllSketch): KllSketch = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: KllSketch): Any =
    new GenericArrayData(probs.map(buf.quantile).toArray)

  override def serialize(buf: KllSketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

/** The compactor hierarchy. Level h's items carry weight 2^h. */
final class KllSketch(val k: Int) extends Serializable {

  private[functions] var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  // per-level compaction counter: survivors alternate odd/even positions,
  // the deterministic stand-in for KLL's coin flip
  private[functions] var compactions: ArrayBuffer[Long] = ArrayBuffer(0L)
  private[graft] var count: Long = 0L

  def insert(v: Double): Unit = {
    levels(0) += v
    count += 1L
    if (levels(0).length > k) compact(0)
  }

  private def compact(h: Int): Unit = {
    if (h + 1 >= levels.length) {
      levels += ArrayBuffer.empty[Double]
      compactions += 0L
    }
    val buf = levels(h)
    val sorted = buf.sorted
    val offset = (compactions(h) % 2L).toInt // alternate survivor parity
    compactions(h) += 1L
    var i = offset
    while (i < sorted.length) {
      levels(h + 1) += sorted(i)
      i += 2
    }
    // an odd-size buffer with offset 1 drops its last item — that single
    // item's weight is the bounded per-compaction rank perturbation
    levels(h) = ArrayBuffer.empty[Double]
    if (levels(h + 1).length > k) compact(h + 1)
  }

  def mergeWith(other: KllSketch): Unit = {
    require(other.k == k, s"cannot merge sketches with k=$k and k=${other.k}")
    count += other.count
    var h = 0
    while (h < other.levels.length) {
      if (h >= levels.length) {
        levels += ArrayBuffer.empty[Double]
        compactions += 0L
      }
      levels(h) ++= other.levels(h)
      h += 1
    }
    h = 0
    while (h < levels.length) {
      if (levels(h).length > k) compact(h)
      h += 1
    }
  }

  /** Nearest-rank quantile over the weighted multiset: the smallest item
    * whose cumulative weight ≥ max(1, ceil(p·W)). NaN on an empty sketch. */
  def quantile(p: Double): Double = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val weight = 1L << h
      levels(h).foreach(v => items += ((v, weight)))
      h += 1
    }
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(p * total).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  /** Retained items across all levels (memory/telemetry). */
  def retained: Int = levels.iterator.map(_.length).sum

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(count)
    out.writeInt(levels.length)
    var h = 0
    while (h < levels.length) {
      out.writeLong(compactions(h))
      out.writeInt(levels(h).length)
      levels(h).foreach(out.writeDouble)
      h += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object KllSketch {

  def fromBytes(bytes: Array[Byte]): KllSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new KllSketch(in.readInt())
    sk.count = in.readLong()
    val nLevels = in.readInt()
    sk.levels = ArrayBuffer.empty
    sk.compactions = ArrayBuffer.empty
    var h = 0
    while (h < nLevels) {
      sk.compactions += in.readLong()
      val n = in.readInt()
      val buf = new ArrayBuffer[Double](n)
      var i = 0
      while (i < n) { buf += in.readDouble(); i += 1 }
      sk.levels += buf
      h += 1
    }
    sk
  }

  /** Column API: `kll_quantiles(value, Seq(0.5, 0.95), k = 200)`. */
  def kll_quantiles(value: Column, probs: Seq[Double], k: Int = 200): Column =
    Bridge.column(
      QuantileSketchAgg(Bridge.expression(value), probs, k).toAggregateExpression())
}
