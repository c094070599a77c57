package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.model.StreamMessage
import graft.streaming.MetricsStream

class MetricsStreamSpec extends SparkSpec {

  test("minuteRates: tumbling windowed counts over a live stream") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[StreamMessage](s)
    val q = MetricsStream.minuteRates(input.toDF())
      .writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        msg("s", 0, 60000L, 0, payload = "abc"),
        msg("s", 0, 61000L, 1, payload = "de"),
        msg("s", 0, 120000L, 2, payload = "fghi"))
      q.processAllAvailable()
      // win is wall-time-as-UTC via interval arithmetic, so the epoch
      // values hold in ANY session zone (a cast would shift them)
      val got = spark.sql(
        "SELECT win.start, msgs, bytes FROM rates ORDER BY win.start")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
      assert(got.toSeq == Seq((60000L, 2L, 5L), (120000L, 1L, 4L)))
    } finally q.stop()
  }

  test("ewmaPerBatch: keyed state carries the 0.8/0.2 average across batches") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[StreamMessage](s)
    val q = MetricsStream.ewmaPerBatch(input.toDS())
      .writeStream.format("memory").queryName("ewma")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(msg("s", 0, 1000L, 0), msg("s", 0, 2000L, 1)) // batch 1: x=2
      q.processAllAvailable()
      input.addData(msg("s", 0, 3000L, 2))                        // batch 2: x=1
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT avg, batches FROM ewma ORDER BY batches")
        .collect().map(r => (r.getDouble(0), r.getLong(1)))
      // seed 2.0; then 2.0*0.8 + 1*0.2 = 1.8
      assert(got.toSeq == Seq((2.0, 1L), (1.8, 2L)))
    } finally q.stop()
  }

  test("ewmaPerBatch backfill: restart resumes from the last stored report") {
    val s = spark
    import s.implicits._
    // last run's stored reports: s::0 at avg 1.8 after 2 batches (plus an
    // older report that lastReports must discard)
    val stored = Seq(
      MetricsStream.EwmaReport("s", 0, 2.0, 1L),
      MetricsStream.EwmaReport("s", 0, 1.8, 2L)).toDS()
    val seed = MetricsStream.lastReports(stored)
    assert(seed.collect().toSeq == Seq(MetricsStream.EwmaReport("s", 0, 1.8, 2L)))

    val input = MemoryStream[StreamMessage](s)
    val q = MetricsStream.ewmaPerBatch(input.toDS(), backfill = Some(seed))
      .writeStream.format("memory").queryName("ewma_resumed")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(msg("s", 0, 4000L, 3), msg("s", 0, 5000L, 4),
        msg("s", 0, 6000L, 5)) // x=3 continues the old fold, not a reseed
      q.processAllAvailable()
      val got = spark.sql("SELECT avg, batches FROM ewma_resumed")
        .collect().map(r => (r.getDouble(0), r.getLong(1)))
      // 1.8*0.8 + 3*0.2 = 2.04, batch counter continues at 3
      assert(got.toSeq.map { case (a, n) => (math.round(a * 1e12) / 1e12, n) } ==
        Seq((2.04, 3L)))
    } finally q.stop()
  }

  test("ewmaPerBatch: restart from checkpoint recovers the fold state") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-ewma-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ewma-out").toString
    val input = MemoryStream[StreamMessage](s)
    // foreachBatch sink: mapGroupsWithState needs Update mode, which the
    // file sink rejects, and the memory sink refuses checkpoint recovery —
    // appending each batch's reports to parquet supports both
    def start() = MetricsStream.ewmaPerBatch(input.toDS())
      .writeStream.option("checkpointLocation", cp)
      .outputMode(OutputMode.Update())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[MetricsStream.EwmaReport], _: Long) =>
          b.write.mode("append").parquet(out); ()
      }
      .start()
    val q1 = start()
    try {
      input.addData(msg("s", 0, 1000L, 0), msg("s", 0, 2000L, 1)) // x=2, seeds 2.0
      q1.processAllAvailable()
    } finally q1.stop()
    // x=1 arrives while the query is down; the restarted query must fold
    // it into RECOVERED state (2.0*0.8 + 1*0.2 = 1.8), not reseed at 1.0
    input.addData(msg("s", 0, 3000L, 2))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .selectExpr("avg", "batches").collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSet
      assert(got == Set((2.0, 1L), (1.8, 2L)))
    } finally q2.stop()
  }
}
