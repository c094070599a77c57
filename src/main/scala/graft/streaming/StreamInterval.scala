package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming interval (point-in-range) join — the live counterpart of
  * [[graft.operators.IntervalJoin]]: click events joined to attribution
  * windows as both arrive, emitting each qualifying pair once.
  *
  * This is deliberately a THIN composition: Spark's stream-stream inner
  * join already handles equi-key + time-range conditions natively, with
  * watermark-driven state eviction — the built-in operator IS the right
  * answer here (custom state would re-implement exactly it, worse). The
  * wrapper's value is the contract: both sides watermarked, the range
  * condition shaped so Spark can derive state-cleanup bounds on BOTH
  * sides (each side's event time is bounded by the other's watermark
  * through the join condition), and column naming that keeps the pair
  * emission unique.
  *
  * State bound: an interval is retained until the point watermark passes
  * `start + maxLen`; a point until the interval watermark passes its
  * time — O(arrival rate × (slack + maxLen)) on each side, independent
  * of stream history. At scale both sides shuffle once on the key — the
  * same co-location the batch operator pays.
  */
object StreamInterval {

  /** @param points    streaming frame with `key`, `ts` (TimestampType)
    * @param intervals streaming frame with `key`, `start`, `end`
    *                  (TimestampType) — `end - start` must be bounded by
    *                  `maxLen` for the state bound to hold
    * @param slack     allowed out-of-orderness (watermark delay)
    * @param maxLen    maximum interval length, part of the join's range
    *                  condition so Spark can bound interval-side state */
  def joinPointsToIntervals(points: DataFrame, intervals: DataFrame,
      key: String, ts: String, start: String, end: String,
      slack: String, maxLen: String): DataFrame = {
    // same non-key collision contract as the batch IntervalJoin: shared
    // payload names would emit ambiguous duplicate columns downstream
    val collide = points.columns.toSet
      .intersect(intervals.columns.toSet) - key
    require(collide.isEmpty,
      s"non-key columns collide across sides: ${collide.mkString(", ")}")
    val p = points.withWatermark(ts, slack)
    val i = intervals.withColumnRenamed(key, "__ikey")
      .withWatermark(start, slack)
    // both range bounds reference the WATERMARKED interval column (`start`)
    // arithmetically — the shape Spark's stream-stream join planner derives
    // two-sided state-eviction bounds from; `maxLen` caps how long past an
    // interval's start a matching point can arrive, and the exact
    // `ts <= end` residual keeps semantics identical to the batch operator
    p.join(i,
        col(key) === col("__ikey") &&
          col(ts) >= col(start) &&
          col(ts) <= col(start) + expr(s"INTERVAL '$maxLen'") &&
          col(ts) <= col(end))
      .drop("__ikey")
  }
}
