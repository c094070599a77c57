package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDedup

// Top-level so Spark codegen can construct it (an inner case class forces
// an interpreter fallback on every encode).
case class StreamDedupDoc(doc_id: Long, text: String, ts: Timestamp)

class StreamDedupSpec extends SparkSpec {

  private def doc(id: Long, text: String, tsMs: Long) =
    StreamDedupDoc(id, text, new Timestamp(tsMs))

  test("duplicates within the horizon dropped across micro-batches") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[StreamDedupDoc](s)
    val q = StreamDedup.dedupStream(input.toDF(), horizon = "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        doc(1, "alpha beta gamma", 60000L),
        doc(2, "delta epsilon", 61000L),
        doc(3, "alpha beta gamma", 62000L)) // intra-batch dup of 1
      q.processAllAvailable()
      input.addData(
        doc(4, "alpha beta gamma", 120000L), // cross-batch dup, in horizon
        doc(5, "zeta eta theta", 121000L))   // new
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM deduped")
        .collect().map(_.getLong(0)).toSet
      // one survivor per distinct text; the cross-batch replay (4) and the
      // intra-batch replay (3) both dropped
      assert(ids.intersect(Set(3L, 4L)).isEmpty)
      assert(spark.sql("SELECT count(DISTINCT doc_id) FROM deduped")
        .collect().head.getLong(0) == 3L)
    } finally q.stop()
  }

  test("state is watermark-bounded: late duplicate past the horizon passes") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[StreamDedupDoc](s)
    val q = StreamDedup.dedupStream(input.toDF(), horizon = "1 minute")
      .writeStream.format("memory").queryName("deduped_late")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(doc(1, "alpha beta", 60000L))
      q.processAllAvailable()
      // advance event time far past 60000 + 1 minute so the key evicts
      input.addData(doc(2, "unrelated text", 600000L))
      q.processAllAvailable()
      input.addData(doc(3, "alpha beta", 599000L)) // same text, key evicted
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM deduped_late")
        .collect().map(_.getLong(0)).toSet
      // doc 3 passes: its duplicate's state aged out of the horizon — the
      // documented contract that keeps state (rate × horizon)-bounded; the
      // batch-side dedup is the backstop for exactly these
      assert(ids == Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dedupStreamBy: composite envelope key dedups replays") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[StreamDedupDoc](s)
    import org.apache.spark.sql.functions._
    val q = StreamDedup.dedupStreamBy(input.toDF(),
        concat_ws(":", col("doc_id"), col("text")), horizon = "10 minutes")
      .writeStream.format("memory").queryName("deduped_by")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(doc(1, "same text", 60000L), doc(2, "same text", 61000L))
      q.processAllAvailable()
      input.addData(doc(1, "same text", 62000L)) // true replay of (1, text)
      q.processAllAvailable()
      // composite key keeps both distinct doc_ids, drops only the replay
      assert(spark.sql("SELECT count(*) FROM deduped_by")
        .collect().head.getLong(0) == 2L)
    } finally q.stop()
  }

  test("restart from checkpoint recovers dedup state across queries") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-dedup-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-dedup-out").toString
    val input = MemoryStream[StreamDedupDoc](s)
    // file sink: the memory sink refuses checkpoint recovery, and the
    // restart path is exactly what this test exists to cover
    def start() = StreamDedup.dedupStream(input.toDF(), horizon = "10 minutes")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    // first incarnation sees and commits two distinct texts
    val q1 = start()
    try {
      input.addData(doc(1, "alpha beta gamma", 60000L),
        doc(2, "delta epsilon", 61000L))
      q1.processAllAvailable()
    } finally q1.stop()
    // data arriving while the query is down: a within-horizon replay of a
    // PRE-restart text plus a genuinely new one
    input.addData(doc(3, "alpha beta gamma", 120000L),
      doc(4, "zeta eta theta", 121000L))
    // second incarnation resumes from the state-store checkpoint — the
    // replay must be dropped by RECOVERED state, not re-learned state
    val q2 = start()
    try {
      q2.processAllAvailable()
      val ids = spark.read.parquet(out)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L),
        s"sink must hold both incarnations' survivors and drop the replay, got $ids")
    } finally q2.stop()
  }
}
