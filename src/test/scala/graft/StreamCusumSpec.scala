package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamCusum
import graft.streaming.StreamCusum.MinuteCount

class StreamCusumSpec extends SparkSpec {

  test("online CUSUM: burst alarms up, silence gap alarms down once, state spans batches") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[MinuteCount](s)
    val q = StreamCusum.detect(input.toDS(), mu0 = 10L, allowance = 2L, h = 15L)
      .writeStream.format("memory").queryName("cusum")
      .outputMode(OutputMode.Append()).start()
    try {
      // on-target, then a burst: s+ = 18 crosses h=15 at minute 1 and is
      // still elevated (16) the minute after
      input.addData(MinuteCount("s", 0L, 10L), MinuteCount("s", 1L, 30L),
        MinuteCount("s", 2L, 10L))
      q.processAllAvailable()
      // an idle minute drains s+ and starts s-; the 4-5 gap is zero-filled
      // from state: minute 4 first crosses h downward and emits ONE gap row
      input.addData(MinuteCount("s", 3L, 0L))
      q.processAllAvailable()
      input.addData(MinuteCount("s", 6L, 10L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT minute, msgs, s_pos, s_neg, alarm_up, alarm_down FROM cusum ORDER BY minute")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toSeq
      assert(rows == Seq(
        (0L, 10L, 0L, 0L, false, false),
        (1L, 30L, 18L, 0L, true, false),
        (2L, 10L, 16L, 0L, true, false),
        (3L, 0L, 4L, 8L, false, false),
        (4L, 0L, 0L, 16L, false, true), // the zero-filled gap's first crossing
        (6L, 10L, 0L, 22L, false, true)))
    } finally q.stop()
  }

  test("restart from checkpoint recovers the accumulated statistics") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-cusum-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-cusum-out").toString
    val input = MemoryStream[MinuteCount](s)
    def start() = StreamCusum.detect(input.toDS(), mu0 = 10L, allowance = 0L, h = 25L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData(MinuteCount("s", 0L, 20L)) // s+ = 10
      q1.processAllAvailable()
    } finally q1.stop()
    // arrives while down: must fold into RECOVERED s+ = 10, not a reset 0
    input.addData(MinuteCount("s", 1L, 30L)) // s+ = 30 > 25 only with recovery
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).orderBy("minute")
        .collect().map(r => (r.getAs[Long]("minute"), r.getAs[Long]("s_pos"),
          r.getAs[Boolean]("alarm_up"))).toSeq
      assert(rows == Seq((0L, 10L, false), (1L, 30L, true)))
    } finally q2.stop()
  }
}
