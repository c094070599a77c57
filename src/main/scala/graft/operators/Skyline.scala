package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction: the rows not dominated in both
  * dimensions — the multi-criteria selection primitive curation pipelines
  * use to pick documents that are best trade-offs (e.g. quality vs.
  * length, freshness vs. price) rather than best on a single score.
  *
  * Algorithm: the classic two-phase distributed skyline. Dominance is
  * closed under subsetting — a point dominated inside ANY subset is
  * dominated globally — so phase 1 computes a local skyline per hash
  * bucket with a bucket-partitioned window (a keyed shuffle, never a
  * global sort of the input), and phase 2 runs the same filter once more
  * over the union of local skylines. For n points in B buckets the
  * survivor set is bounded by B × (expected local skyline size, O(log n)
  * for independent dims), so the final single-partition window runs over
  * an index-sized remnant, not the data — the same reduced-set discipline
  * as the salted two-phase top-k in [[graft.similarity.Similarity]].
  *
  * The per-bucket filter itself is one window pass: with DISTINCT points
  * sorted (x desc, y desc), every dominator of a row precedes it, and a
  * row is dominated iff the running max of y over strictly-preceding rows
  * reaches its own y (a preceding row with y' ≥ y has x' > x, or x' = x
  * and — points being distinct — y' > y; either way it dominates).
  * Comparisons only, no arithmetic — exact on any engine. */
object Skyline {

  /** Skyline of `points` maximizing both `x` and `y`. Returns the DISTINCT
    * non-dominated points with their multiplicity `cnt`.
    *
    * Null policy: rows with a NULL in either dimension are EXCLUDED up
    * front, explicitly. Dominance over a null dimension is undefined —
    * a SQL `NOT EXISTS` anti-join would retain such a row (all its
    * comparisons are NULL ⇒ no dominator "exists"), while the running-max
    * window here would drop it (the survives predicate is null-false) —
    * so rather than let the two formulations diverge silently, the
    * operator pins the contract: the skyline is over fully-observed
    * points only. Callers who want null-dimension rows kept must decide
    * what dominance means for them and union them back explicitly. */
  def skyline2D(points: DataFrame, x: String, y: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val survives = (m: org.apache.spark.sql.Column) => m.isNull || m < col(y)
    val pts = points
      .filter(col(x).isNotNull && col(y).isNotNull)
      .groupBy(col(x), col(y)).agg(count(lit(1)).as("cnt"))
    val localW = Window.partitionBy(col("_b"))
      .orderBy(col(x).desc, col(y).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = pts
      .withColumn("_b", pmod(hash(col(x), col(y)), lit(buckets)))
      .withColumn("_m", max(col(y)).over(localW))
      .filter(survives(col("_m")))
      .drop("_b", "_m")
    // survivor set is bucket-skyline-sized (see scaladoc) — the global
    // pass's single-partition window is over that remnant only
    val globalW = Window.orderBy(col(x).desc, col(y).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    local
      .withColumn("_m", max(col(y)).over(globalW))
      .filter(survives(col("_m")))
      .drop("_m")
  }
}
