package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamAnomaly
import graft.streaming.StreamAnomaly.MinuteCount

class StreamAnomalySpec extends SparkSpec {

  private def mc(minuteIdx: Long, msgs: Long, part: Int = 0) =
    MinuteCount("s", part, new Timestamp(minuteIdx * 60000L), msgs)

  test("streaming flags reproduce the batch z-score math across micro-batches") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[MinuteCount](s)
    val q = StreamAnomaly.flags(input.toDS(), lookback = 60, k = 3.0,
      minHistory = 10)
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append()).start()
    try {
      // 10 warm-up minutes at 1 msg in one batch, the idle-gap spike in a
      // later batch: state must carry the history across the boundary
      input.addData((0 until 10).map(i => mc(i, 1L)): _*)
      q.processAllAvailable()
      input.addData(mc(30, 2L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT minute, msgs, mean, variance, is_anomaly FROM alerts ORDER BY minute")
        .collect()
      assert(rows.length == 11)
      assert(rows.take(10).forall(!_.getAs[Boolean]("is_anomaly")), "warm-up")
      val spike = rows.last
      // identical to the batch operator's sparse arithmetic: n = 30,
      // s = 10, s2 = 10 -> mean 1/3, variance 200/900
      assert(spike.getAs[Double]("mean") == 10.0 / 30.0)
      assert(spike.getAs[Double]("variance") == 200.0 / 900.0)
      assert(spike.getAs[Boolean]("is_anomaly"))
    } finally q.stop()
  }

  test("restart from checkpoint recovers the trailing-history ring") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-anom-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-anom-out").toString
    val input = MemoryStream[MinuteCount](s)
    def start() = StreamAnomaly.flags(input.toDS(), lookback = 60, k = 3.0,
      minHistory = 10)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    // first incarnation learns the 10-minute baseline
    val q1 = start()
    try {
      input.addData((0 until 10).map(i => mc(i, 1L)): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // spike arriving while the query is down: the second incarnation must
    // score it against RECOVERED history, not a reset ring (a reset would
    // leave n = 0 and report unflagged)
    input.addData(mc(30, 2L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
        .orderBy("minute").collect()
      assert(rows.length == 11)
      val spike = rows.last
      assert(spike.getAs[Long]("msgs") == 2L)
      assert(spike.getAs[Double]("mean") == 10.0 / 30.0)
      assert(spike.getAs[Boolean]("is_anomaly"),
        "spike must flag against checkpoint-recovered history")
    } finally q2.stop()
  }

  test("state is ring-bounded: minutes beyond the lookback stop influencing") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[MinuteCount](s)
    val q = StreamAnomaly.flags(input.toDS(), lookback = 5, k = 1.0,
      minHistory = 2)
      .writeStream.format("memory").queryName("alerts_ring")
      .outputMode(OutputMode.Append()).start()
    try {
      // a huge ancient burst, then quiet minutes far past the lookback:
      // the burst must NOT suppress flagging of a modest later spike
      input.addData(mc(0, 1000L), mc(1, 1000L))
      q.processAllAvailable()
      input.addData(mc(100, 1L), mc(101, 1L), mc(102, 5L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT minute, msgs, mean, is_anomaly FROM alerts_ring ORDER BY minute")
        .collect()
      val spike = rows.last
      assert(spike.getAs[Long]("msgs") == 5L)
      // trailing window at minute 102 sees only minutes 100-101 (1 msg
      // each) plus implicit zeros: n = 5, s = 2 -> mean 0.4, and the
      // ancient 1000s are gone from state
      assert(spike.getAs[Double]("mean") == 2.0 / 5.0)
      assert(spike.getAs[Boolean]("is_anomaly"))
    } finally q.stop()
  }
}
