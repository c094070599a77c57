package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamAsof
import graft.streaming.StreamAsof.AsofEvent

class StreamAsofSpec extends SparkSpec {

  private def run(batches: Seq[Seq[AsofEvent]], name: String): Seq[(Long, Option[Long])] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[AsofEvent](s)
    val q = StreamAsof.enrich(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.sql(s"SELECT id, asof_id FROM $name ORDER BY id")
        .collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toSeq
    } finally q.stop()
  }

  test("intra-batch: event-time order decides, not arrival order") {
    // arrival order scrambled: click(150) arrives before purchase(100),
    // but event-time sorting enriches it anyway; click(50) precedes the
    // purchase in EVENT time and must stay unenriched
    val got = run(Seq(Seq(
      AsofEvent(1L, 150L, left = true, id = 10L, value = 1.0),
      AsofEvent(1L, 100L, left = false, id = 90L, value = 5.0),
      AsofEvent(1L, 50L, left = true, id = 11L, value = 1.0))), "asof_intra")
    assert(got == Seq((10L, Some(90L)), (11L, None)))
  }

  test("cross-batch: state carries the latest right row per key") {
    val got = run(Seq(
      Seq(AsofEvent(1L, 100L, left = false, id = 90L, value = 5.0),
        AsofEvent(2L, 100L, left = false, id = 91L, value = 6.0)),
      Seq(AsofEvent(1L, 200L, left = true, id = 10L, value = 1.0),
        AsofEvent(2L, 200L, left = false, id = 92L, value = 7.0),
        AsofEvent(2L, 250L, left = true, id = 11L, value = 1.0),
        AsofEvent(3L, 200L, left = true, id = 12L, value = 1.0))), "asof_cross")
    assert(got == Seq(
      (10L, Some(90L)),  // from batch-1 state
      (11L, Some(92L)),  // newer right in same batch wins over state
      (12L, None)))      // key 3 never saw a right row
  }

  test("late-arriving older right row must not regress the carried state") {
    val got = run(Seq(
      Seq(AsofEvent(1L, 100L, left = false, id = 90L, value = 5.0)),
      // batch 2 delivers an OLDER right row (event time 50) late
      Seq(AsofEvent(1L, 50L, left = false, id = 91L, value = 6.0)),
      Seq(AsofEvent(1L, 200L, left = true, id = 10L, value = 1.0))), "asof_late")
    // the enrichment must come from the tms=100 row, not the late tms=50 one
    assert(got == Seq((10L, Some(90L))))
  }

  test("late-arriving left must not be enriched from a future right") {
    val got = run(Seq(
      // batch 1: right at event time 200
      Seq(AsofEvent(1L, 200L, left = false, id = 90L, value = 5.0)),
      // batch 2: LEFT arrives late with event time 100 — the carried state
      // (tms=200) is in its future and must be invisible; a later left at
      // tms=300 in the same batch still sees it
      Seq(AsofEvent(1L, 100L, left = true, id = 10L, value = 1.0),
        AsofEvent(1L, 300L, left = true, id = 11L, value = 1.0))), "asof_late_left")
    assert(got == Seq((10L, None), (11L, Some(90L))))
  }

  test("equal timestamp: right row is visible to the left row (inclusive tie)") {
    val got = run(Seq(Seq(
      AsofEvent(1L, 100L, left = false, id = 90L, value = 5.0),
      AsofEvent(1L, 100L, left = true, id = 10L, value = 1.0))), "asof_tie")
    assert(got == Seq((10L, Some(90L))))
  }

  test("restart from checkpoint recovers the per-key right-row state") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-asof-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-asof-out").toString
    val input = MemoryStream[AsofEvent](s)
    // file sink: the memory sink refuses checkpoint recovery, and the
    // restart path is exactly what this test exists to cover
    def start() = StreamAsof.enrich(input.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    // first incarnation commits a right row for keys 1 and 2
    val q1 = start()
    try {
      input.addData(AsofEvent(1L, 100L, left = false, id = 90L, value = 5.0),
        AsofEvent(2L, 110L, left = false, id = 91L, value = 6.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // lefts arriving while the query is down; key 3 never saw a right
    input.addData(AsofEvent(1L, 200L, left = true, id = 10L, value = 1.0),
      AsofEvent(2L, 105L, left = true, id = 11L, value = 1.0),
      AsofEvent(3L, 200L, left = true, id = 12L, value = 1.0))
    // second incarnation must enrich from RECOVERED flatMapGroupsWithState
    // state — key 2's left (tms=105) also proves the visibility filter
    // applies to recovered state (state tms=110 is in its future)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .selectExpr("id", "asof_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toSeq.sortBy(_._1)
      assert(got == Seq((10L, Some(90L)), (11L, None), (12L, None)))
    } finally q2.stop()
  }
}
