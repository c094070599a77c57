package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group statistics for outlier handling in metric/feature
  * pipelines: percentile winsorization (clamp into [p_lo, p_hi]) and the
  * median absolute deviation — the outlier treatments that survive heavy
  * tails where mean/stddev clipping does not.
  *
  * Determinism: Spark's exact `percentile` and DuckDB's `quantile_cont`
  * compute the identical linear interpolation (parity is hash-proven by
  * q_percentiles), clamping is pure comparison, and the MAD's deviation is
  * a single IEEE subtraction — no engine-divergent math anywhere.
  *
  * Scale: exact percentiles buffer each group's values on one reducer — the
  * right call for bounded per-group cardinality (metric families, event
  * types). For groups of unbounded width at 100 TB, swap `percentile` for
  * `approx_percentile` (t-digest sketch, mergeable map-side) and drop the
  * oracle to rows-only, the same trade q_approx_distinct documents. The
  * tiny bounds/median tables broadcast back, so the fact table never
  * shuffles for the clamp itself.
  */
object RobustStats {

  /** Events with their value clamped into the group's [lo, hi] percentile
    * band, plus a clipped flag. One aggregate over the facts + a broadcast
    * join back — the fact table is scanned twice but shuffled never. */
  def winsorize(events: DataFrame, group: String = "event_type",
      value: String = "value", lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val bounds = events.groupBy(col(group))
      .agg(percentile(col(value), lit(lo)).as("lo"),
        percentile(col(value), lit(hi)).as("hi"))
    events.join(broadcast(bounds), Seq(group))
      .select(col("event_id"), col(group), col(value),
        least(greatest(col(value), col("lo")), col("hi")).as("winsorized"),
        (col(value) < col("lo") || col(value) > col("hi")).cast("long").as("clipped"))
  }

  /** Per-group median and median absolute deviation. */
  def medianAbsDev(events: DataFrame, group: String = "event_type",
      value: String = "value"): DataFrame = {
    val med = events.groupBy(col(group))
      .agg(percentile(col(value), lit(0.5)).as("median"))
    events.join(broadcast(med), Seq(group))
      .groupBy(col(group), col("median"))
      .agg(percentile(abs(col(value) - col("median")), lit(0.5)).as("mad"),
        count(lit(1)).as("n"))
  }
}
