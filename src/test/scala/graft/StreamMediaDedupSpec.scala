package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.multimodal.{Multimodal, Y4mCodec}
import graft.streaming.StreamMediaDedup
import graft.streaming.StreamMediaDedup.MediaDoc

class StreamMediaDedupSpec extends SparkSpec {

  private def doc(id: Long, tsMs: Long, data: Array[Byte]) =
    MediaDoc(id, new Timestamp(tsMs), data)

  // same pixels, different container bytes per variant; `desc` renders
  // a DESCENDING ramp — genuinely different content under a mean-compare
  // fingerprint (a uniform brightness shift would rightly collide)
  private def y4m(variant: Int, desc: Boolean = false): Array[Byte] = {
    val frame = Array.tabulate(8 * 6) { k =>
      val v = (3 * (k % 8) + 7 * (k / 8)) % 251
      (if (desc) 250 - v else v).toByte
    }
    Y4mCodec.encode(8, 6, "mono", Seq(frame),
      headerExtra = s" Xv$variant")
  }

  // same samples, different junk-chunk padding per variant
  private def wav(variant: Int): Array[Byte] =
    Multimodal.synthWav(1, 8000, 16, 90, junkLen = variant)

  // same pixels, different PNG filter choice per variant
  private def png(variant: Int): Array[Byte] = {
    val raw = Array.tabulate(9 * 8)(k => ((k * 11 + 5) % 251).toByte)
    graft.multimodal.PngCodec.encode(9, 8, 0, raw, y => (y + variant) % 5)
  }

  test("re-encoded media drops across micro-batches, all three modalities") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[MediaDoc](s)
    val q = StreamMediaDedup.dedupMediaStream(input.toDS(),
      horizon = "10 minutes")
      .writeStream.format("memory").queryName("media_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        doc(1, 60000L, y4m(1)),
        doc(2, 61000L, wav(3)),
        doc(3, 62000L, png(1)))
      q.processAllAvailable()
      input.addData(
        doc(4, 120000L, y4m(2)),   // same frames, new container bytes
        doc(5, 121000L, wav(17)),  // same samples, new padding
        doc(6, 122000L, png(2)),   // same pixels, new filters
        doc(7, 123000L, y4m(1, desc = true))) // genuinely new footage
      q.processAllAvailable()
      val ids = spark.sql("SELECT media_id FROM media_dedup")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 3L, 7L),
        s"re-encodings must drop, new content must survive: $ids")
      // each survivor keyed on its modality's fingerprint, not bytes
      val keys = spark.sql("SELECT content_hash FROM media_dedup")
        .collect().map(_.getString(0))
      assert(keys.count(_.startsWith("v:")) == 2)
      assert(keys.count(_.startsWith("a:")) == 1)
      assert(keys.count(_.startsWith("i:")) == 1)
    } finally q.stop()
  }

  test("undecodable payloads fall back to byte-exact dedup") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[MediaDoc](s)
    val q = StreamMediaDedup.dedupMediaStream(input.toDS(),
      horizon = "10 minutes")
      .writeStream.format("memory").queryName("media_dedup_bytes")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        doc(1, 60000L, "junk-one".getBytes("UTF-8")),
        doc(2, 61000L, "junk-two".getBytes("UTF-8")))
      q.processAllAvailable()
      input.addData(
        doc(3, 120000L, "junk-one".getBytes("UTF-8"))) // byte-identical
      q.processAllAvailable()
      val ids = spark.sql("SELECT media_id FROM media_dedup_bytes")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L))
    } finally q.stop()
  }

  test("stream survivors equal the batch first-arrival replay") {
    val s = spark
    import s.implicits._
    val events = Seq(
      doc(1, 60000L, y4m(1)), doc(2, 61000L, wav(3)),
      doc(3, 62000L, png(1)), doc(4, 120000L, y4m(2)),
      doc(5, 121000L, wav(17)), doc(6, 122000L, png(2)),
      doc(7, 123000L, "junk".getBytes("UTF-8")))
    // batch twin: first arrival (min ts, then min id) per perceptual key
    val expected = events
      .groupBy(e => StreamMediaDedup.perceptualKey(e.data))
      .values.map(_.minBy(e => (e.ts.getTime, e.media_id)).media_id).toSet
    val input = MemoryStream[MediaDoc](s)
    val q = StreamMediaDedup.dedupMediaStream(input.toDS(),
      horizon = "10 minutes")
      .writeStream.format("memory").queryName("media_dedup_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      events.grouped(3).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val ids = spark.sql("SELECT media_id FROM media_dedup_parity")
        .collect().map(_.getLong(0)).toSet
      assert(ids == expected, s"stream $ids != batch replay $expected")
    } finally q.stop()
  }
}
