package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {

  private def points(rows: (Long, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts", "point_id")
  }

  private def intervals(rows: (Long, Long, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "start", "end", "ivl_id")
  }

  private def run(p: org.apache.spark.sql.DataFrame,
      i: org.apache.spark.sql.DataFrame, width: Long) =
    IntervalJoin.joinPointsToIntervals(p, i,
      keys = Seq("user_id"), ts = "ts", start = "start", end = "end",
      bucketWidth = width)
      .select("point_id", "ivl_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("emits each qualifying pair exactly once, bounds inclusive") {
    val p = points((1L, 100L, 10L), (1L, 200L, 11L), (2L, 100L, 12L))
    val i = intervals(
      (1L, 100L, 150L, 900L),   // contains ts=100 (start inclusive)
      (1L, 150L, 200L, 901L),   // contains ts=200 (end inclusive)
      (2L, 101L, 200L, 902L))   // misses user 2's ts=100
    assert(run(p, i, width = 10L) ==
      Set((10L, 900L), (11L, 901L)))
  }

  test("an interval spanning many buckets still emits one row per pair") {
    val p = points((1L, 500L, 10L))
    val i = intervals((1L, 0L, 1000L, 900L)) // covers 101 buckets at width 10
    val out = IntervalJoin.joinPointsToIntervals(points((1L, 500L, 10L)), i,
      Seq("user_id"), "ts", "start", "end", bucketWidth = 10L)
      .select("point_id", "ivl_id").collect()
    assert(out.length == 1 && out.head.getLong(0) == 10L)
    // and point-in-many-overlapping-intervals emits one row per interval
    val i2 = intervals((1L, 0L, 1000L, 900L), (1L, 400L, 600L, 901L))
    assert(run(p, i2, width = 10L) == Set((10L, 900L), (10L, 901L)))
  }

  test("result is invariant to bucket width (the knob changes cost, not output)") {
    val p = points((1L, -25L, 10L), (1L, 0L, 11L), (1L, 7L, 12L), (2L, 63L, 13L))
    val i = intervals(
      (1L, -30L, -20L, 900L), (1L, -5L, 5L, 901L),
      (1L, 7L, 7L, 902L),     // degenerate single-point interval
      (2L, 60L, 70L, 903L), (2L, 70L, 60L, 904L)) // reversed → matches nothing
    val expect = Set((10L, 900L), (11L, 901L), (12L, 902L), (13L, 903L))
    for (w <- Seq(1L, 3L, 10L, 64L, 1000L))
      assert(run(p, i, w) == expect, s"width $w")
  }

  test("negative timestamps bucket consistently (floor, not truncate-toward-zero)") {
    // ts=-1 and start=-10..end=-1: with truncation both -1 and -10 would
    // land in bucket 0 and -1 respectively on different sides; floor keeps
    // the pair meeting in the point's (single) bucket.
    val p = points((1L, -1L, 10L))
    val i = intervals((1L, -10L, -1L, 900L))
    assert(run(p, i, width = 7L) == Set((10L, 900L)))
  }

  test("plans as an equi-join on (key, bucket) — no product join") {
    val p = points((1L, 100L, 10L))
    val i = intervals((1L, 90L, 110L, 900L))
    val plan = IntervalJoin.joinPointsToIntervals(p, i,
      Seq("user_id"), "ts", "start", "end", bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join must decompose to an equi-join:\n$plan")
  }

  test("rejects colliding non-key columns and non-positive width") {
    val p = points((1L, 100L, 10L)).withColumn("start", lit(0L))
    val i = intervals((1L, 90L, 110L, 900L))
    intercept[IllegalArgumentException] {
      IntervalJoin.joinPointsToIntervals(p, i, Seq("user_id"), "ts", "start", "end", 10L)
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.joinPointsToIntervals(points((1L, 1L, 1L)), i,
        Seq("user_id"), "ts", "start", "end", 0L)
    }
  }
}
