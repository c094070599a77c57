package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** As-of (point-in-time) join: for each left row, attach the single most
  * recent right row with the same key and `ts <= left.ts`. Spark has no
  * built-in as-of operator; the naive formulation is a range join
  * (`l.ts >= r.ts` non-equi condition) whose fan-out is O(|left| ×
  * matching-right) before the per-row max is taken — unusable at scale.
  *
  * This is the merge-sort formulation instead: tag both sides, union them,
  * and take a running `last(right value, ignoreNulls)` over a per-key
  * window ordered by (ts, side). ONE shuffle on the key, no fan-out, no
  * range-join explosion; each key's partition is processed in a single
  * ordered pass, which is exactly how a time-series store would execute it.
  * At 100 TB the shuffle is the unavoidable co-location of the two inputs
  * and everything after it is narrow.
  *
  * Tie policy: a right row at exactly the left row's timestamp IS visible
  * ("at or before", inclusive) — right rows order before left rows at an
  * equal timestamp. Among equal-timestamp right rows the greatest
  * `rightTie` wins, making the result deterministic on any engine.
  */
object AsofJoin {

  /** Backward as-of join.
    *
    * @param left      left rows; keeps all its columns. Must not contain
    *                  any of `rightVals`.
    * @param right     right rows; must contain `keys`, `ts` and `rightVals`
    *                  (already renamed to their output names).
    * @param keys      equality keys present on both sides
    * @param ts        ordering column name present on both sides (same type)
    * @param rightTie  column of `rightVals` that breaks equal-ts ties among
    *                  right rows (ascending — the greatest value wins)
    * @param rightVals right-side payload columns to attach to each left row
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, rightTie: String, rightVals: Seq[String]): DataFrame =
    asofImpl(left, right, keys, ts, rightTie, rightVals, backward = true)

  /** Forward as-of join: the single EARLIEST right row with the same key
    * and `ts >= left.ts` ("next purchase after this click" — conversion
    * attribution). Same merge-sort shape, traversed in descending time;
    * a right row at exactly the left row's timestamp is visible, and among
    * equal-ts right rows the SMALLEST `rightTie` wins (the mirror of
    * backward's greatest-wins, keeping both deterministic). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, rightTie: String, rightVals: Seq[String]): DataFrame =
    asofImpl(left, right, keys, ts, rightTie, rightVals, backward = false)

  /** Nearest as-of join: for each left row, the right row with the same
    * key whose timestamp is CLOSEST in either direction — the
    * sensor-alignment variant (align a reading to the nearest calibration
    * sample, a trade to the nearest quote) where pure backward would drop
    * the leading edge and pure forward the trailing edge.
    *
    * Composition of [[asofBackward]] and [[asofForward]] (so the scale
    * shape is two merge-sort passes on the SAME key shuffle — still no
    * range-join fan-out) followed by a per-row pick: the backward
    * candidate wins ties (`Δback ≤ Δfwd`), and within each direction the
    * parent operators' tie policy applies. `matched_dir` reports which
    * side won (null when the key has no right rows at all).
    *
    * `ts` and `rightTs` must be the SAME numeric epoch type on both
    * sides — deltas are exact integer subtraction, so the pick is
    * engine-reproducible. `rightTs` is the right side's own timestamp
    * under its output name and must be listed in `rightVals`. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, rightTie: String, rightVals: Seq[String],
      rightTs: String): DataFrame = {
    require(rightVals.contains(rightTs), s"rightTs $rightTs must be one of rightVals")
    def renamed(suffix: String) = rightVals.foldLeft(right)(
      (df, v) => df.withColumnRenamed(v, v + suffix))
    val bVals = rightVals.map(_ + "__b")
    val fVals = rightVals.map(_ + "__f")
    val withB = asofBackward(left, renamed("__b"), keys, ts, rightTie + "__b", bVals)
    val both = asofForward(withB, renamed("__f"), keys, ts, rightTie + "__f", fVals)
    val bt = col(rightTs + "__b")
    val ft = col(rightTs + "__f")
    val useB = bt.isNotNull && (ft.isNull || (col(ts) - bt) <= (ft - col(ts)))
    rightVals.foldLeft(both)((d, v) =>
        d.withColumn(v, when(useB, col(v + "__b")).otherwise(col(v + "__f"))))
      .withColumn("matched_dir",
        when(col(rightTs).isNull, lit(null).cast("string"))
          .otherwise(when(useB, lit("backward")).otherwise(lit("forward"))))
      .drop(bVals ++ fVals: _*)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, rightTie: String, rightVals: Seq[String],
      backward: Boolean): DataFrame = {
    require(rightVals.contains(rightTie), s"rightTie $rightTie must be one of rightVals")
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
    require(leftOnly.intersect(rightVals).isEmpty,
      s"left columns ${leftOnly.intersect(rightVals).mkString(",")} collide with rightVals")
    def typed(df: DataFrame, c: String): StructField = df.schema(df.schema.fieldIndex(c))
    // common layout: keys ++ ts ++ leftOnly (null on right rows) ++
    // rightVals (null on left rows) ++ side
    val l = left.select(
      (keys :+ ts).map(col) ++
        leftOnly.map(col) ++
        rightVals.map(c => lit(null).cast(typed(right, c).dataType).as(c)) :+
        lit(1).as("_side"): _*)
    val r = right.select(
      (keys :+ ts).map(col) ++
        leftOnly.map(c => lit(null).cast(typed(left, c).dataType).as(c)) ++
        rightVals.map(col) :+
        lit(0).as("_side"): _*)
    // null-first tiebreak pinned explicitly: left rows carry null rightTie,
    // and engines disagree on default null order (Spark NULLS FIRST asc,
    // DuckDB NULLS LAST) — the choice is irrelevant to the result (sides
    // already separate null from non-null) but pinning it documents that.
    // Forward mirrors the traversal: descending time, right still before
    // left at an equal ts, tie DESC so the running last lands on the
    // smallest rightTie among equal-ts rights.
    val order =
      if (backward) Seq(col(ts).asc, col("_side").asc, col(rightTie).asc_nulls_first)
      else Seq(col(ts).desc, col("_side").asc, col(rightTie).desc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the running last is taken over ONE struct of the whole right payload,
    // not per column — per-column last(ignoreNulls) would tear the matched
    // row apart when a payload field is legitimately null (each column
    // independently falling back to an older right row, emitting a
    // combination that exists in no input row)
    val rv = when(col("_side") === 0, struct(rightVals.map(col): _*))
    l.unionByName(r)
      .select(
        (keys :+ ts).map(col) ++
          leftOnly.map(col) :+
          last(rv, ignoreNulls = true).over(w).as("_rv") :+
          col("_side"): _*)
      .filter(col("_side") === 1)
      .select(
        (keys :+ ts).map(col) ++
          leftOnly.map(col) ++
          rightVals.map(c => col("_rv").getField(c).as(c)): _*)
  }
}
