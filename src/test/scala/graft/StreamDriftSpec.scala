package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDrift
import graft.streaming.StreamDrift.ValueEvent

class StreamDriftSpec extends SparkSpec {

  test("first window becomes the reference; identical window scores 0; shift scores exactly") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[ValueEvent](s)
    val q = StreamDrift.detect(input.toDS(), windowMinutes = 2L, bandWidth = 10L)
      .writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 0 (minutes 0-1): bands {0: 2, 1: 2} -> reference, no emit
      input.addData(
        ValueEvent("s", 0L, 3L), ValueEvent("s", 0L, 7L),
        ValueEvent("s", 1L, 13L), ValueEvent("s", 1L, 17L))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM drift").collect().head.getLong(0) == 0L,
        "the reference window must not report against itself")
      // window 1: identical distribution -> every band delta is 0 -> psi 0
      input.addData(
        ValueEvent("s", 2L, 4L), ValueEvent("s", 2L, 6L),
        ValueEvent("s", 3L, 14L), ValueEvent("s", 3L, 16L))
      // window 2: all mass in band 1
      input.addData(
        ValueEvent("s", 4L, 11L), ValueEvent("s", 4L, 12L),
        ValueEvent("s", 5L, 13L), ValueEvent("s", 5L, 14L))
      // window 3 opener: closes window 2
      input.addData(ValueEvent("s", 6L, 1L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window, n_ref, n, psi FROM drift ORDER BY window")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      // window 2 by hand: t1 = t2 = 4;
      // band 0: c1=2 c2=0 -> delta -8, dbits bitlen(1)-bitlen(9) = -3 -> 24
      // band 1: c1=2 c2=4 -> delta 8, dbits bitlen(17)-bitlen(9) = 1 -> 8
      // psi = 32 / 16 = 2.0
      assert(rows == Seq((1L, 4L, 4L, 0.0), (2L, 4L, 4L, 2.0)))
    } finally q.stop()
  }

  test("streamed psi equals the batch psiDrift per-band sum on the same split") {
    // cross-check the integer form against the batch operator's published
    // contributions: psi == sum(delta_num * dbits) / (t1 * t2)
    val ref = Map(0L -> 2L, 1L -> 2L)
    val cur = Map(1L -> 4L)
    val (t1, t2, p) = StreamDrift.psi(ref, cur)
    assert(t1 == 4L && t2 == 4L)
    val expect = ((0L * 4 - 2L * 4) * (0L - 3L) + (4L * 4 - 2L * 4) * (4L - 3L)).toDouble / 16.0
    assert(p == expect && p == 2.0)
  }

  test("restart from checkpoint recovers the reference histogram") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-drift-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-drift-out").toString
    val input = MemoryStream[ValueEvent](s)
    def start() = StreamDrift.detect(input.toDS(), windowMinutes = 1L, bandWidth = 10L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      // window 0 closes as reference {0:1, 1:1} when window 1 opens
      input.addData(ValueEvent("s", 0L, 5L), ValueEvent("s", 0L, 15L),
        ValueEvent("s", 1L, 5L))
      q1.processAllAvailable()
    } finally q1.stop()
    // after restart: window 1 = {0:1} must close against the RECOVERED
    // reference {0:1, 1:1} (t1=2, t2=1), not a reset-empty one
    input.addData(ValueEvent("s", 2L, 5L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).orderBy("window")
        .collect().map(r => (r.getAs[Long]("window"), r.getAs[Long]("n_ref"),
          r.getAs[Long]("n"), r.getAs[Double]("psi"))).toSeq
      // window 1 by hand: band0 c1=1 c2=1: delta = 2-1 = 1, dbits =
      // bitlen(3)-bitlen(2) = 0 -> 0; band1 c1=1 c2=0: delta = -1,
      // dbits = bitlen(1)-bitlen(2) = -1 -> 1; psi = 1/2 = 0.5
      assert(rows == Seq((1L, 2L, 1L, 0.5)))
    } finally q2.stop()
  }

  test("legacy -1L checkpoint sentinel restores as uninitialized") {
    import graft.streaming.StreamDrift.DriftState
    // pre-r16 checkpoints persisted -1L as 'no window yet': with empty
    // counters that is the uninitialized state, not a real window -1
    val legacy = DriftState(-1L, Map.empty, -1L, Map.empty)
    assert(StreamDrift.normalize(legacy) ==
      DriftState(Long.MinValue, Map.empty, Long.MinValue, Map.empty))
    // a GENUINE open window -1 always carries counted rows - untouched
    val live = DriftState(-2L, Map(0L -> 3L), -1L, Map(1L -> 1L))
    assert(StreamDrift.normalize(live) eq live)
  }
}
