package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {

  private def eventsOf(rows: (Long, Long, Long)*) = { // (event_id, user_id, tsMs)
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("event_id", "user_id", "tsMs")
      .withColumn("ts", timestamp_millis(col("tsMs")).cast("timestamp_ntz"))
      .drop("tsMs")
  }

  test("session boundaries at the gap threshold; per-user isolation") {
    val gap = 1000L
    val ev = eventsOf(
      (1L, 1L, 0L), (2L, 1L, 900L),          // session 0 (gap 900 <= 1000)
      (3L, 1L, 1900L),                        // still session 0 (gap exactly 1000)
      (4L, 1L, 3000L),                        // gap 1100 > 1000 -> session 1
      (5L, 2L, 0L))                           // other user -> own session 0
    val ids = Sessionize.withSessionIds(ev, gap)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("userSessions aggregates counts and longest session") {
    val ev = eventsOf(
      (1L, 1L, 0L), (2L, 1L, 100L), (3L, 1L, 200L), // session 0: 3 events, 200ms
      (4L, 1L, 10000000L),                          // session 1: 1 event
      (5L, 2L, 0L))
    val got = Sessionize.userSessions(ev, gapMs = 1000L).orderBy("user_id").collect()
    val u1 = got(0)
    assert(u1.getAs[Long]("n_sessions") == 2L)
    assert(u1.getAs[Long]("n_events") == 4L)
    assert(u1.getAs[Long]("max_session_events") == 3L)
    assert(u1.getAs[Long]("max_session_ms") == 200L)
    assert(got(1).getAs[Long]("n_sessions") == 1L)
  }
}
