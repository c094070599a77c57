package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamVocabGrowth
import graft.streaming.StreamVocabGrowth.TokenEvent

class StreamVocabGrowthSpec extends SparkSpec {

  test("new types counted once ever; repeats count tokens only; per-window reset") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[TokenEvent](s)
    val q = StreamVocabGrowth.detect(input.toDS(), windowMinutes = 2L)
      .writeStream.format("memory").queryName("vocab")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 0: a, b, a -> 3 tokens, 2 new types
      input.addData(
        TokenEvent("s", 0L, "a"), TokenEvent("s", 0L, "b"),
        TokenEvent("s", 1L, "a"))
      // window 1: a, c -> 2 tokens, 1 new (a is known FOREVER, not per window)
      input.addData(TokenEvent("s", 2L, "a"), TokenEvent("s", 3L, "c"))
      // window 2 opener: closes window 1
      input.addData(TokenEvent("s", 4L, "a"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window, tokens, new_types, bits_set FROM vocab ORDER BY window")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(rows == Seq((0L, 3L, 2L, 2L), (1L, 2L, 1L, 3L)))
    } finally q.stop()
  }

  test("restart from checkpoint keeps the seen bitmap: no type re-counted as new") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-vocab-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-vocab-out").toString
    val input = MemoryStream[TokenEvent](s)
    def start() = StreamVocabGrowth.detect(input.toDS(), windowMinutes = 1L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData(TokenEvent("s", 0L, "x"), TokenEvent("s", 0L, "y"),
        TokenEvent("s", 1L, "x"))
      q1.processAllAvailable()
    } finally q1.stop()
    // after restart, window 1's "x" must read the RECOVERED bitmap (not
    // new); "z" is genuinely new
    input.addData(TokenEvent("s", 2L, "z"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).orderBy("window")
        .collect().map(r => (r.getAs[Long]("window"), r.getAs[Long]("tokens"),
          r.getAs[Long]("new_types"), r.getAs[Long]("bits_set"))).toSeq
      assert(rows == Seq((0L, 2L, 2L, 2L), (1L, 1L, 0L, 2L)))
    } finally q2.stop()
  }

  test("legacy -1L checkpoint sentinel restores as uninitialized") {
    import graft.streaming.StreamVocabGrowth.VocabState
    val legacy = VocabState(-1L, new Array[Byte](16), 0L, 0L, 0L)
    assert(StreamVocabGrowth.normalize(legacy).openWindow == Long.MinValue)
    val live = VocabState(-1L, new Array[Byte](16), 1L, 1L, 1L)
    assert(StreamVocabGrowth.normalize(live) eq live)
  }
}
