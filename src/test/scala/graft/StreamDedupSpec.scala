package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDedup

class StreamDedupSpec extends SparkSpec {

  private case class Doc(doc_id: Long, text: String, ts: Timestamp)
  private def doc(id: Long, text: String, tsMs: Long) =
    Doc(id, text, new Timestamp(tsMs))

  test("duplicates within the horizon dropped across micro-batches") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Doc](s)
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
    val input = MemoryStream[Doc](s)
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
    val input = MemoryStream[Doc](s)
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
}
