package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (point-in-range) join: attach to each left point row every
  * right interval row with the same key whose `[start, end]` range contains
  * the point (both bounds inclusive). The analytics workhorse behind
  * attribution windows ("which promo window was this click inside?"),
  * maintenance-window exclusion, and ad-impression → conversion matching.
  *
  * Spark has no interval-join operator: the naive `p.ts BETWEEN i.start
  * AND i.end` non-equi condition plans as a per-key fan-out join (or, with
  * no equi key at all, a BroadcastNestedLoopJoin) — O(|points| ×
  * |intervals-per-key|) comparisons, unusable at scale. This is the
  * bucket-decomposition form instead (the standard spatial-join grid
  * trick, one-dimensional): quantize the timeline into fixed-width
  * buckets, explode each interval to the buckets it covers, keep each
  * point in its single bucket, equi-join on (key, bucket), and apply the
  * exact BETWEEN as a residual predicate.
  *
  * Because a point lives in EXACTLY one bucket, every qualifying (point,
  * interval) pair meets in exactly one (key, bucket) cell — no duplicate
  * emission and therefore no distinct/dedup pass, which would otherwise
  * cost a second corpus-sized shuffle. (Exploding points instead would
  * break this: intervals overlap many buckets, points only one.)
  *
  * Scale knob: `bucketWidth`. Each interval is replicated
  * `len/bucketWidth + 1` times through the shuffle, and each (key, bucket)
  * cell's work is |points in cell| × |intervals touching cell|. Width ≈
  * the typical interval length keeps replication ≤ 2× while cells stay
  * small; at 100 TB both sides shuffle once on (key, bucket) — the
  * unavoidable co-location — and everything after the join is narrow.
  * Skewed cells (a hot key × hot hour) are ordinary join skew, handled by
  * AQE skew-join splitting, not a new mechanism.
  *
  * Ref: the reference's resend-range scan is the keyless 1-interval case
  * (broker/src/plugins/storage/Storage.ts requestRange); this generalizes
  * it to interval SETS on both sides.
  */
object IntervalJoin {

  /** @param points      left rows; must contain `keys` and `ts`
    * @param intervals   right rows; must contain `keys`, `start`, `end`
    *                    (same numeric/timestamp-long type as `ts`), plus
    *                    payload columns to attach. Rows with end < start
    *                    match nothing (empty interval), naturally.
    * @param keys        equality keys present on both sides
    * @param ts          point column name (integral — epoch millis/micros)
    * @param start       interval lower bound column name (inclusive)
    * @param end         interval upper bound column name (inclusive)
    * @param bucketWidth timeline quantum in `ts` units; choose ≈ typical
    *                    interval length (replication factor len/width + 1)
    */
  def joinPointsToIntervals(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ts: String, start: String, end: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val collide = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(collide.isEmpty,
      s"non-key columns ${collide.mkString(",")} exist on both sides")
    // floorDiv, not SQL's truncating `div`: bounds can be negative (epochs
    // before 1970) and truncation toward zero would split bucket -1 from
    // bucket 0 inconsistently between the two sides of the join. Pure long
    // arithmetic (subtract the mathematical remainder, then divide) stays
    // exact for the full int64 range where a double round-trip would not.
    def bkt(c: String) = {
      val w = bucketWidth
      expr(s"(`$c` - ((`$c` % $w + $w) % $w)) div $w")
    }
    val p = points.withColumn("_bkt", bkt(ts))
    // sequence() is generated per interval row before the exchange, so the
    // replication happens map-side and the join input is already (key,
    // bucket)-keyed; an interval covering b buckets contributes b rows.
    val i = intervals
      .withColumn("_bkt",
        explode(sequence(bkt(start), greatest(bkt(start), bkt(end)))))
    p.join(i, keys :+ "_bkt")
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("_bkt")
  }
}
