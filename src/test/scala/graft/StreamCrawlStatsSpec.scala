package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.multimodal.Multimodal
import graft.streaming.StreamCrawlStats
import graft.streaming.StreamCrawlStats.CrawlEvent

class StreamCrawlStatsSpec extends SparkSpec {

  // one .warc.gz blob: n records, each a gzip member framing one WARC
  // record whose payload is an HTTP response carrying `body`
  private def blob(source: String, ids: Seq[Long], status: Int = 200): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    ids.foreach { id =>
      bos.write(Multimodal.gzipMember(Multimodal.warcRecordBytes(source, id,
        Multimodal.httpResponse(status, "OK", "text/plain",
          s"body $id".getBytes("UTF-8")))))
    }
    bos.toByteArray
  }

  private def rawBlob(source: String, id: Long, payload: Array[Byte]): Array[Byte] =
    Multimodal.gzipMember(Multimodal.warcRecordBytes(source, id, payload))

  test("audit walks all three layers; malformed blobs yield their prefix") {
    val b = blob("s", Seq(1L, 2L, 3L))
    val (m, r, bytes, h2, other, unk) = StreamCrawlStats.audit(b)
    assert(m == 3L && r == 3L && h2 == 3L && other == 0L && unk == 0L)
    val headBytes = "body 1".length + Multimodal.HttpFixedOverhead +
      "OK".length + "text/plain".length + 1 // content-length digit count
    assert(bytes == 3L * headBytes)
    // non-HTTP payload counts as unknown, not an error
    val (_, r2, _, h2b, _, unk2) =
      StreamCrawlStats.audit(rawBlob("s", 9L, "not http".getBytes("UTF-8")))
    assert(r2 == 1L && h2b == 0L && unk2 == 1L)
    // corrupt the FIRST member's CRC: the whole blob audits to zero
    val c = b.clone()
    val m1 = Multimodal.gzipMember(Multimodal.warcRecordBytes("s", 1L,
      Multimodal.httpResponse(200, "OK", "text/plain", "body 1".getBytes("UTF-8"))))
    c(m1.length - 8) = (c(m1.length - 8) ^ 0x5a).toByte
    val (mc, rc, _, _, _, _) = StreamCrawlStats.audit(c)
    assert(mc == 0L && rc == 0L)
    // garbage never throws
    assert(StreamCrawlStats.audit("garbage".getBytes("UTF-8"))._1 == 0L)
    assert(StreamCrawlStats.audit(Array.emptyByteArray)._1 == 0L)
  }

  test("per-window per-source reports; status mix and unknown rate visible") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[CrawlEvent](s)
    val q = StreamCrawlStats.monitor(input.toDS(), windowMinutes = 2L)
      .writeStream.format("memory").queryName("crawlstats")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 0: healthy 2xx on crawlA; crawlB has a 404 mix
      input.addData(
        CrawlEvent("crawlA", 0L, blob("crawlA", Seq(1L, 2L))),
        CrawlEvent("crawlA", 1L, blob("crawlA", Seq(3L))),
        CrawlEvent("crawlB", 1L, blob("crawlB", Seq(4L), status = 404)))
      // window 1: crawlA starts shipping non-HTTP payloads (the incident)
      input.addData(
        CrawlEvent("crawlA", 2L, rawBlob("crawlA", 5L, "junk".getBytes("UTF-8"))),
        CrawlEvent("crawlB", 3L, blob("crawlB", Seq(6L))))
      // window 2 openers flush window 1
      input.addData(
        CrawlEvent("crawlA", 4L, blob("crawlA", Seq(7L))),
        CrawlEvent("crawlB", 4L, blob("crawlB", Seq(8L))))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT source, window, n_blobs, n_members, n_records,
          |       n_http_2xx, n_http_other, n_unknown_payload
          |FROM crawlstats ORDER BY source, window""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
      assert(rows == Seq(
        ("crawlA", 0L, 2L, 3L, 3L, 3L, 0L, 0L),
        ("crawlA", 1L, 1L, 1L, 1L, 0L, 0L, 1L),
        ("crawlB", 0L, 1L, 1L, 1L, 0L, 1L, 0L),
        ("crawlB", 1L, 1L, 1L, 1L, 1L, 0L, 0L)))
    } finally q.stop()
  }

  test("stream equals batch replay (parity); late rows fold forward") {
    val s = spark
    import s.implicits._
    val events = (0L until 18L).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      val data =
        if (i % 5 == 4) rawBlob(src, i, s"junk $i".getBytes("UTF-8"))
        else blob(src, Seq(i), status = if (i % 3 == 0) 301 else 200)
      CrawlEvent(src, i / 2, data)
    }
    val input = MemoryStream[CrawlEvent](s)
    val q = StreamCrawlStats.monitor(input.toDS(), windowMinutes = 3L)
      .writeStream.format("memory").queryName("crawlparity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events: _*)
      input.addData( // sentinels flush the open windows
        CrawlEvent("a", 100L, blob("a", Seq(999L))),
        CrawlEvent("b", 100L, blob("b", Seq(999L))))
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT source, window, n_blobs, n_members, n_records,
          |       n_payload_bytes, n_http_2xx, n_http_other, n_unknown_payload
          |FROM crawlparity""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8))).toSet
      val batch = StreamCrawlStats.batchReplay(events.toDS(), windowMinutes = 3L)
        .collect().map(r => (r.source, r.window, r.n_blobs, r.n_members,
          r.n_records, r.n_payload_bytes, r.n_http_2xx, r.n_http_other,
          r.n_unknown_payload)).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()

    // pre-epoch minutes: negative windows must report separately, not
    // clamp into an uninitialized-state sentinel
    val input3 = MemoryStream[CrawlEvent](s)
    val q3 = StreamCrawlStats.monitor(input3.toDS(), windowMinutes = 1L)
      .writeStream.format("memory").queryName("crawlneg")
      .outputMode(OutputMode.Append()).start()
    try {
      input3.addData(CrawlEvent("s", -10L, blob("s", Seq(1L))))
      q3.processAllAvailable()
      input3.addData(CrawlEvent("s", -5L, blob("s", Seq(2L)))) // closes -10
      input3.addData(CrawlEvent("s", 0L, blob("s", Seq(3L))))  // closes -5
      q3.processAllAvailable()
      val negRows = spark.sql(
        "SELECT window, n_blobs FROM crawlneg ORDER BY window")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(negRows == Seq((-10L, 1L), (-5L, 1L)))
    } finally q3.stop()

    // at-arrival fold: late rows count into the open window
    val input2 = MemoryStream[CrawlEvent](s)
    val q2 = StreamCrawlStats.monitor(input2.toDS(), windowMinutes = 1L)
      .writeStream.format("memory").queryName("crawllate")
      .outputMode(OutputMode.Append()).start()
    try {
      input2.addData(CrawlEvent("s", 0L, blob("s", Seq(1L))))
      q2.processAllAvailable()
      input2.addData(CrawlEvent("s", 5L, blob("s", Seq(2L)))) // closes 0
      q2.processAllAvailable()
      input2.addData(CrawlEvent("s", 1L, blob("s", Seq(3L)))) // LATE -> 5
      input2.addData(CrawlEvent("s", 6L, blob("s", Seq(4L)))) // closes 5
      q2.processAllAvailable()
      val rows = spark.sql(
        "SELECT window, n_blobs, n_records FROM crawllate ORDER BY window")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == Seq((0L, 1L, 1L), (5L, 2L, 2L)))
    } finally q2.stop()
  }

  test("restart from checkpoint recovers the open window's counters") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-crawl-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-crawl-out").toString
    val input = MemoryStream[CrawlEvent](s)
    def start() = StreamCrawlStats.monitor(input.toDS(), windowMinutes = 1L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData(CrawlEvent("s", 0L, blob("s", Seq(1L, 2L))),
        CrawlEvent("s", 0L, rawBlob("s", 3L, "junk".getBytes("UTF-8"))))
      q1.processAllAvailable()
    } finally q1.stop()
    // after restart, the window-1 opener must close window 0 with BOTH
    // pre-restart blobs — recovered from state, not reset
    input.addData(CrawlEvent("s", 1L, blob("s", Seq(4L))))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
        .collect().map(r => (r.getAs[Long]("window"), r.getAs[Long]("n_blobs"),
          r.getAs[Long]("n_records"), r.getAs[Long]("n_unknown_payload"))).toSeq
      assert(rows == Seq((0L, 2L, 3L, 1L)))
    } finally q2.stop()
  }
}
