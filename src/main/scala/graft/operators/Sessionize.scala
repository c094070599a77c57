package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over the events stream: classic gaps-and-islands with
  * `lag` + running sum, partitioned per user. One shuffle on the session
  * key; every window function stays within the per-user partition, so the
  * plan scales with user-cardinality parallelism (no global sort).
  *
  * Built with explicit window functions rather than `session_window` so
  * batch and any SQL oracle share exact semantics (gap boundaries are
  * integer-ms comparisons, no float time math).
  */
object Sessionize {

  /** Events annotated with a per-user `session_id` (0-based): a new
    * session starts when the gap from the previous event exceeds
    * `gapMs`. */
  def withSessionIds(events: DataFrame, gapMs: Long): DataFrame = {
    // order on the ms-truncated key (the gap unit) + event_id tiebreak so
    // sub-ms timestamp precision cannot reorder rows relative to engines
    // that compare at ms resolution
    val tms = unix_millis(col("ts").cast("timestamp"))
    val w = Window.partitionBy(col("user_id")).orderBy(tms, col("event_id"))
    val prev = lag(tms, 1).over(w)
    val newSession = when(prev.isNull || (tms - prev) > gapMs, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }

  /** Per-user session statistics: session count, event total, and the
    * largest / longest session. */
  def userSessions(events: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    val perSession = withSessionIds(events, gapMs)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("events"),
        (unix_millis(max(col("ts")).cast("timestamp"))
          - unix_millis(min(col("ts")).cast("timestamp"))).as("duration_ms"))
    perSession
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("events")).as("n_events"),
        max(col("events")).as("max_session_events"),
        max(col("duration_ms")).as("max_session_ms"))
  }
}
