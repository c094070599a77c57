package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamSessions

// Top-level for codegen-friendly encoding (see StreamDedupSpec).
case class SessionEvent(user_id: Long, ts: Timestamp)

class StreamSessionsSpec extends SparkSpec {

  private def ev(u: Long, tsMs: Long) = SessionEvent(u, new Timestamp(tsMs))

  test("closed sessions emit with merged counts; open sessions stay in state") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[SessionEvent](s)
    val q = StreamSessions.sessionize(input.toDF(), gap = "1 minute",
      watermark = "1 second")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // u1: two events 10s apart (one session), then a separate session
      // 5 minutes later; u2: one event far ahead to advance the watermark
      input.addData(ev(1, 10000L), ev(1, 20000L))
      q.processAllAvailable()
      input.addData(ev(1, 300000L))
      q.processAllAvailable()
      input.addData(ev(2, 1000000L)) // watermark -> ~999s, closes u1's sessions
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3)))
      // session 1: [10s, 20s + 60s gap), 2 events merged across the batch;
      // session 2: [300s, 360s), 1 event; u2's session is still open
      assert(rows.toSet == Set(
        (1L, 10000L, 80000L, 2L),
        (1L, 300000L, 360000L, 1L)))
      assert(!rows.exists(_._1 == 2L), "open session must not emit")
    } finally q.stop()
  }

  test("an event inside the gap extends the session instead of splitting it") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[SessionEvent](s)
    val q = StreamSessions.sessionize(input.toDF(), gap = "1 minute",
      watermark = "1 second")
      .writeStream.format("memory").queryName("sessions_merge")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, 10000L))
      q.processAllAvailable()
      // 50s later — inside the 60s gap, arrives in a LATER micro-batch:
      // the state-store window must extend, not open a second session
      input.addData(ev(1, 60000L))
      q.processAllAvailable()
      input.addData(ev(2, 1000000L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sessions_merge")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3)))
      assert(rows.toSet == Set((1L, 10000L, 120000L, 2L)))
    } finally q.stop()
  }
}
