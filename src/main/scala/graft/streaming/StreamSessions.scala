package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the live counterpart of the batch
  * gaps-and-islands operator ([[graft.operators.Sessionize]], q_sessions):
  * one row per (user, session), where a session closes `gap` after its
  * last event. Built on Spark's native `session_window` aggregation: the
  * state store holds one open window per active key, windows MERGE when a
  * new event bridges two provisional sessions, and the watermark both
  * bounds state (closed windows evict) and gates emission (append mode
  * emits a session only once it can no longer grow — the exactly-once
  * contract a downstream writer wants).
  *
  * Scale: state is (active users × open sessions), independent of history
  * length — the same bounded-state argument as [[StreamDedup]]. The
  * aggregation is key-partitioned on user_id; no global ordering of the
  * stream is ever needed (the batch operator's per-user window sort maps
  * to state-store merges here).
  *
  * The reference has no session surface; this extends the metrics/events
  * family (SURVEY §2.9 extensions) the batch sessionizer started.
  */
object StreamSessions {

  /** Sessionize a streaming event frame (needs `keyCol` and event-time
    * `tsCol`). Emits closed sessions: key, start, end (last event + gap),
    * event count. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour", tsCol: String = "ts",
      keyCol: String = "user_id"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
