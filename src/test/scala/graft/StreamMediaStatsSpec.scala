package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.multimodal.Multimodal
import graft.streaming.StreamMediaStats
import graft.streaming.StreamMediaStats.MediaEvent

class StreamMediaStatsSpec extends SparkSpec {

  private val png = Multimodal.synthPng(8, 8, 8, 2)
  private val jpg = Multimodal.synthJpeg(8, 8, 3, 1, bigEndianTiff = false)
  private val wav = Multimodal.synthWav(1, 8000, 16, 4)
  private val mp4 = Multimodal.synthMp4("isom", 600, 60L, 64, 64,
    audioTrack = false, mvhdV1 = false, largeFree = false)
  private val junk = "corrupted payload".getBytes("UTF-8")

  test("classify dispatches on real signatures, not metadata") {
    assert(StreamMediaStats.classify(png) == "png")
    assert(StreamMediaStats.classify(jpg) == "jpeg")
    assert(StreamMediaStats.classify(wav) == "wav")
    assert(StreamMediaStats.classify(mp4) == "mp4")
    assert(StreamMediaStats.classify(junk) == "unknown")
    assert(StreamMediaStats.classify(png.take(10)) == "unknown")
  }

  test("per-window per-source counts; corruption burst shows as n_unknown") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[MediaEvent](s)
    val q = StreamMediaStats.monitor(input.toDS(), windowMinutes = 2L)
      .writeStream.format("memory").queryName("mediastats")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 0: healthy mix on crawlA; crawlB all audio
      input.addData(
        MediaEvent("crawlA", 0L, png), MediaEvent("crawlA", 0L, jpg),
        MediaEvent("crawlA", 1L, mp4), MediaEvent("crawlB", 1L, wav))
      // window 1: crawlA starts shipping garbage (the incident)
      input.addData(
        MediaEvent("crawlA", 2L, junk), MediaEvent("crawlA", 3L, junk),
        MediaEvent("crawlA", 3L, png), MediaEvent("crawlB", 2L, wav))
      // window 2 openers flush window 1 for both sources
      input.addData(MediaEvent("crawlA", 4L, png), MediaEvent("crawlB", 4L, wav))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT source, window, n_total, n_png, n_jpeg, n_wav, n_mp4, n_unknown
          |FROM mediastats ORDER BY source, window""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
      assert(rows == Seq(
        ("crawlA", 0L, 3L, 1L, 1L, 0L, 1L, 0L),
        ("crawlA", 1L, 3L, 1L, 0L, 0L, 0L, 2L),
        ("crawlB", 0L, 1L, 0L, 0L, 1L, 0L, 0L),
        ("crawlB", 1L, 1L, 0L, 0L, 1L, 0L, 0L)))
    } finally q.stop()
  }

  test("stream equals batch replay on ordered input (parity), late rows fold forward") {
    val s = spark
    import s.implicits._
    val events = (0L until 24L).map { i =>
      val data = (i % 5) match {
        case 0 => png
        case 1 => jpg
        case 2 => wav
        case 3 => mp4
        case _ => junk
      }
      MediaEvent(if (i % 2 == 0) "a" else "b", i / 2, data)
    }
    val input = MemoryStream[MediaEvent](s)
    val q = StreamMediaStats.monitor(input.toDS(), windowMinutes = 3L)
      .writeStream.format("memory").queryName("mediaparity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events: _*)
      // sentinel rows one window past the end flush the open windows
      input.addData(MediaEvent("a", 100L, png), MediaEvent("b", 100L, png))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT source, window, n_total, n_png, n_jpeg, n_wav, n_mp4, n_unknown FROM mediaparity")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
      val batch = StreamMediaStats.batchReplay(events.toDS(), windowMinutes = 3L)
        .collect().map(r => (r.source, r.window, r.n_total, r.n_png,
          r.n_jpeg, r.n_wav, r.n_mp4, r.n_unknown)).toSet
      assert(streamed == batch)
    } finally q.stop()

    // at-arrival fold: a LATE row (window already passed) counts into the
    // open window instead of resurrecting the closed report
    val input2 = MemoryStream[MediaEvent](s)
    val q2 = StreamMediaStats.monitor(input2.toDS(), windowMinutes = 1L)
      .writeStream.format("memory").queryName("medialate")
      .outputMode(OutputMode.Append()).start()
    try {
      input2.addData(MediaEvent("s", 0L, png))
      q2.processAllAvailable()
      input2.addData(MediaEvent("s", 5L, wav)) // opens window 5, closes 0
      q2.processAllAvailable()
      input2.addData(MediaEvent("s", 1L, jpg)) // LATE: folds into window 5
      input2.addData(MediaEvent("s", 6L, mp4)) // closes window 5
      q2.processAllAvailable()
      val rows = spark.sql(
        "SELECT window, n_total, n_wav, n_jpeg FROM medialate ORDER BY window")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(rows == Seq((0L, 1L, 0L, 0L), (5L, 2L, 1L, 1L)))
    } finally q2.stop()
  }

  test("restart from checkpoint recovers the open window's counters") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-media-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-media-out").toString
    val input = MemoryStream[MediaEvent](s)
    def start() = StreamMediaStats.monitor(input.toDS(), windowMinutes = 1L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData(MediaEvent("s", 0L, png), MediaEvent("s", 0L, wav))
      q1.processAllAvailable()
    } finally q1.stop()
    // after restart, the window-1 opener must close window 0 with BOTH
    // pre-restart rows — recovered from state, not reset
    input.addData(MediaEvent("s", 1L, junk))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
        .collect().map(r => (r.getAs[Long]("window"), r.getAs[Long]("n_total"),
          r.getAs[Long]("n_png"), r.getAs[Long]("n_wav"))).toSeq
      assert(rows == Seq((0L, 2L, 1L, 1L)))
    } finally q2.stop()
  }

  test("legacy -1L checkpoint sentinel restores as uninitialized") {
    import graft.streaming.StreamMediaStats.MediaState
    assert(StreamMediaStats.normalize(
      MediaState(-1L, 0L, 0L, 0L, 0L, 0L)).openWindow == Long.MinValue)
    val live = MediaState(-1L, 2L, 0L, 0L, 0L, 0L)
    assert(StreamMediaStats.normalize(live) eq live)
  }
}
