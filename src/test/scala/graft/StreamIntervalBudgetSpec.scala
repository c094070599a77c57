package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{StreamBudget, StreamInterval}
import graft.streaming.StreamBudget.Doc

class StreamIntervalBudgetSpec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("stream-stream interval join emits each qualifying pair once, across batches") {
    val s = spark
    import s.implicits._
    val points = MemoryStream[(Long, Timestamp, Long)](s)
    val ivls = MemoryStream[(Long, Timestamp, Timestamp, Long)](s)
    val joined = StreamInterval.joinPointsToIntervals(
      points.toDS().toDF("user_id", "ts", "point_id"),
      ivls.toDS().toDF("user_id", "w_start", "w_end", "ivl_id"),
      key = "user_id", ts = "ts", start = "w_start", end = "w_end",
      slack = "10 seconds", maxLen = "60 seconds")
    val q = joined.select("point_id", "ivl_id")
      .writeStream.format("memory").queryName("ivl")
      .outputMode(OutputMode.Append()).start()
    try {
      // interval arrives first; its point arrives in a LATER batch
      ivls.addData((1L, t(100), t(160), 900L))
      q.processAllAvailable()
      points.addData((1L, t(130), 10L))
      q.processAllAvailable()
      // point before its interval: state holds the point until it closes
      points.addData((2L, t(150), 11L))
      q.processAllAvailable()
      ivls.addData((2L, t(140), t(200), 901L))
      q.processAllAvailable()
      // non-matching user and out-of-range point emit nothing
      points.addData((1L, t(300), 12L))
      ivls.addData((3L, t(100), t(160), 902L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT point_id, ivl_id FROM ivl ORDER BY point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((10L, 900L), (11L, 901L)))
    } finally q.stop()
  }

  test("budget admission: first-fit per stratum, state survives batches") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Doc](s)
    val q = StreamBudget.admit(input.toDS(), Map("en" -> 100L, "de" -> 50L))
      .writeStream.format("memory").queryName("budget")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc("en", 1L, 1L, 60L), Doc("en", 2L, 2L, 30L),
        Doc("de", 3L, 1L, 50L))
      q.processAllAvailable()
      // en used 90/100: a 20-token doc is rejected, a later 10-token fits
      // (first-fit, not prefix); de is exactly full
      input.addData(Doc("en", 4L, 3L, 20L), Doc("en", 5L, 4L, 10L),
        Doc("de", 6L, 2L, 1L), Doc("zz", 7L, 1L, 5L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT key, accepted, used_after FROM budget ORDER BY key")
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
      assert(rows == Seq(
        (1L, true, 60L), (2L, true, 90L), (3L, true, 50L),
        (4L, false, 90L), (5L, true, 100L), (6L, false, 50L),
        (7L, false, 0L))) // unbudgeted stratum admits nothing
    } finally q.stop()
  }
}
