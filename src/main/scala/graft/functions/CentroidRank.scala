package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Centroid ids ordered by ascending (squared L2 distance, id) from a
  * quantized `array<bigint>` vector to a fixed literal centroid table — the
  * per-row kernel of the learned-centroid IVF path
  * ([[graft.similarity.Similarity.ivfKmeansTopK]]).
  *
  * The declarative spelling (`least`/`array_sort` over k structs, each a
  * dims-term arithmetic fold) builds an O(k × dims) Catalyst tree —
  * ~1,500 nodes at k=8, dims=64 — that every iteration's plan re-analyzes,
  * re-optimizes, and re-compiles (centroid literals change per iteration,
  * so nothing caches). This expression is one tree node wrapping one
  * primitive loop; the centroid table rides along as a codegen reference
  * object.
  *
  * Arithmetic contract (oracle parity): distances accumulate `(v[i]-c[i])²`
  * left-to-right over the dims in IEEE doubles — the same association the
  * DuckDB oracle's unrolled `+` chain uses — and ordering ties break on
  * centroid id.
  */
case class CentroidRank(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "centroid_rank"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> input, got ${t.catalogString}")
  }

  @transient private lazy val table: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    CentroidRank.rank(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", table, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.CentroidRank.rank($v, $cents)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidRank =
    copy(child = newChild)
}

object CentroidRank {

  /** Static entry point shared by interpreted eval and generated code. */
  def rank(v: ArrayData, cents: Array[Array[Double]]): ArrayData = {
    val k = cents.length
    val dist = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val t = v.getLong(i).toDouble - c(i)
        acc += t * t
        i += 1
      }
      dist(j) = acc
      j += 1
    }
    // insertion sort of ids by (dist, id) — k is small by construction
    val ids = new Array[Long](k)
    j = 0
    while (j < k) { ids(j) = j.toLong; j += 1 }
    j = 1
    while (j < k) {
      val dj = dist(j); val idj = ids(j)
      var p = j - 1
      while (p >= 0 && dist(p) > dj) {
        dist(p + 1) = dist(p); ids(p + 1) = ids(p); p -= 1
      }
      dist(p + 1) = dj; ids(p + 1) = idj
      j += 1
    }
    new GenericArrayData(ids)
  }

  /** Ranked centroid-id column for a quantized vector column. */
  def centroid_rank(v: Column, centroids: Seq[Seq[Double]]): Column =
    Bridge.column(CentroidRank(Bridge.expression(v), centroids))
}
