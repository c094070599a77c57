package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key stats table (count /
  * sum / min / max) current under a stream of appended rows WITHOUT
  * re-scanning history — `new = combine(base, partial(delta))`, the
  * algebraic-aggregate identity that makes metrics tables affordable at
  * 100 TB (the full corpus is touched once, ever; each refresh costs one
  * pass over the delta plus a key join against the stats table).
  *
  * Sums are carried in 1e-6 fixed point (long), the repo-wide convention
  * for cross-engine exactness: integer addition is associative, so the
  * merged total is bit-identical to a from-scratch recompute in ANY
  * engine and any partitioning — the identity the gate asserts. Min/max
  * merge with a null-safe least/greatest (a key absent from one side
  * contributes nothing).
  *
  * Scale shape: `partial` shuffles only the delta (one map-side-combined
  * agg); `combine` is a key-partitioned full outer join of two stats
  * tables — with the base bucketed by key, only delta-sized data moves.
  * Non-algebraic stats (ndv, quantiles) slot in as mergeable sketches —
  * [[graft.functions.QuantileSketchAgg]] serializes for exactly this.
  */
object IncrementalAgg {

  /** Partial stats of a batch of raw rows: the delta-side input to
    * [[merge]], and (run once over history) the base bootstrap. */
  def partialStats(rows: DataFrame, keys: Seq[String], value: String): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(floor(col(value) * lit(1000000.0)).cast("long")).as("sum_micro"),
      min(col(value)).as("min_v"),
      max(col(value)).as("max_v"))

  /** Combine two stats tables keyed by `keys` (base ∪ delta). */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val b = base.select(keys.map(col) ++ Seq(col("n").as("_bn"),
      col("sum_micro").as("_bs"), col("min_v").as("_bmin"),
      col("max_v").as("_bmax")): _*)
    val d = delta.select(keys.map(col) ++ Seq(col("n").as("_dn"),
      col("sum_micro").as("_ds"), col("min_v").as("_dmin"),
      col("max_v").as("_dmax")): _*)
    b.join(d, keys, "full_outer").select(
      keys.map(col) ++ Seq(
        (coalesce(col("_bn"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col("_bs"), lit(0L)) + coalesce(col("_ds"), lit(0L))).as("sum_micro"),
        // least/greatest null handling differs across engines — coalesce
        // pins "absent side contributes nothing" explicitly
        coalesce(least(col("_bmin"), col("_dmin")), col("_bmin"), col("_dmin")).as("min_v"),
        coalesce(greatest(col("_bmax"), col("_dmax")), col("_bmax"), col("_dmax")).as("max_v")): _*)
  }
}
