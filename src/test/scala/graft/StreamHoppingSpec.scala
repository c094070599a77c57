package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Relational

// Top-level for codegen-friendly encoding (see StreamDedupSpec).
case class HopEvent(event_type: String, ts: Timestamp, value: Double)

/** The q_hopping plan under Structured Streaming: the same
  * `Relational.hoppingAgg` call, fed from a MemoryStream with a
  * watermark — closed hopping windows emit exactly once in Append mode.
  */
class StreamHoppingSpec extends SparkSpec {

  private val base = 1704067200000L // 2024-01-01T00:00:00Z, 10-min aligned

  private def ev(t: String, offMs: Long, v: Double) =
    HopEvent(t, new Timestamp(base + offMs), v)

  test("hopping windows close under the watermark with batch-identical results") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[HopEvent](s)
    val q = Relational.hoppingAgg(
      input.toDF().withWatermark("ts", "1 second"), widthMin = 10, slideMin = 5)
      .writeStream.format("memory").queryName("hopping")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev("click", 3 * 60000L, 2.5), ev("click", 7 * 60000L, 1.0))
      q.processAllAvailable()
      // advance the watermark an hour: every window around the events closes
      input.addData(ev("view", 3600000L, 9.9))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT win_start_ms, event_type, n, value_sum_micro FROM hopping")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // identical to RelationalSpec's batch case: 11:55 / 12:00 / 12:05
      assert(rows.toSet == Set(
        (base - 5 * 60000L, "click", 1L, 2500000L),
        (base, "click", 2L, 3500000L),
        (base + 5 * 60000L, "click", 1L, 1000000L)))
      // the watermark-advancing event's own windows are still open
      assert(!rows.exists(_._2 == "view"), "open windows must not emit")
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from closed windows") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[HopEvent](s)
    val q = Relational.hoppingAgg(
      input.toDF().withWatermark("ts", "1 second"), widthMin = 10, slideMin = 5)
      .writeStream.format("memory").queryName("hopping_late")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev("click", 3 * 60000L, 2.5))
      q.processAllAvailable()
      input.addData(ev("view", 3600000L, 9.9)) // watermark -> ~+59:59
      q.processAllAvailable()
      input.addData(ev("click", 4 * 60000L, 7.0)) // late: windows closed
      q.processAllAvailable()
      val clicks = spark.sql(
        "SELECT n, value_sum_micro FROM hopping_late WHERE event_type = 'click' " +
          "AND win_start_ms = " + base)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // the 12:00 window emitted once, with only the on-time event
      assert(clicks.toSeq == Seq((1L, 2500000L)))
    } finally q.stop()
  }
}
