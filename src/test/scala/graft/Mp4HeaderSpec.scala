package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

import graft.functions.Mp4Header
import graft.multimodal.Multimodal

class Mp4HeaderSpec extends SparkSpec {

  private val params = Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(99L))

  private def parseStatic(b: Array[Byte]): (String, String, Int, Long, Int, Int, Int) = {
    val r = Mp4Header.parse(b)
    (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getInt(2),
      r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6))
  }

  test("mp4: mvhd v0, single video track, brand and 16.16 dims recovered") {
    val b = Multimodal.synthMp4("isom", timescale = 1000, durationUnits = 5500L,
      videoW = 1920, videoH = 1080, audioTrack = false, mvhdV1 = false, largeFree = false)
    assert(parseStatic(b) == (("mp4", "isom", 1000, 5500L, 1, 1920, 1080)))
  }

  test("mp4: mvhd v1, audio track FIRST (0x0 dims skipped), 64-bit largesize free box") {
    val b = Multimodal.synthMp4("mp42", timescale = 90000, durationUnits = 123456L,
      videoW = 640, videoH = 352, audioTrack = true, mvhdV1 = true, largeFree = true)
    // duration_ms = 123456 * 1000 / 90000 = 1371
    assert(parseStatic(b) == (("mp4", "mp42", 90000, 1371L, 2, 640, 352)))
  }

  test("garbage, truncation, and non-mp4 bytes parse to unknown, never throw") {
    val mp4 = Multimodal.synthMp4("isom", 600, 60L, 320, 240,
      audioTrack = false, mvhdV1 = false, largeFree = false)
    val cases = Seq(
      Array.emptyByteArray,
      "definitely not a movie file".getBytes("UTF-8"),
      mp4.take(8),                                  // ftyp header only
      mp4.take(40),                                 // truncated inside free
      Multimodal.synthWav(1, 8000, 16, 4),          // a wav is not an mp4
      // ftyp present but a hostile moov size overrunning the buffer
      mp4.take(24) ++ Array(0x7f, 0xff, 0xff, 0xff).map(_.toByte) ++
        "moov".getBytes("US-ASCII"))
    cases.foreach { b =>
      assert(parseStatic(b)._1 == "unknown", s"bytes ${b.length}")
    }
    val r = check(params, Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      parseStatic(bytes)._1 != null
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("videoTable: builder-parser round trip matches the oracle arithmetic; codegen == static") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a" * 123, "en", "web", 123L),    // v1 mvhd (0%5), largeFree (0%7)
      (1L, "b" * 777, "en", "web", 777L),    // audio track present
      (5L, "c" * 999, "en", "book", 999L),   // v1 mvhd, audio track
      (7L, "d" * 50, "en", "book", 50L),     // largeFree, audio track
      (6L, "e" * 100001, "en", "web", 100001L)) // duration wraps the mod
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val parsed = Multimodal.videoTable(docs)
      .select(col("media_id"), Mp4Header.mp4_header(col("data")).as("h"))
      .select(col("media_id"), col("h.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getInt(3), r.getLong(4),
          r.getInt(5), r.getInt(6), r.getInt(7))).toMap
    // brand isom/mp42 by parity; timescale {600,1000,90000} by id%3;
    // duration_ms = (1+n_chars%100000)*1000/ts; tracks 1+id%2;
    // w = 16*(1+id%120), h = 16*(1+id%68)
    assert(parsed(0L) == (("mp4", "isom", 600, 124L * 1000 / 600, 1, 16, 16)))
    assert(parsed(1L) == (("mp4", "mp42", 1000, 778L, 2, 32, 32)))
    assert(parsed(5L) == (("mp4", "mp42", 90000, 1000L * 1000 / 90000, 2, 96, 96)))
    assert(parsed(7L) == (("mp4", "mp42", 1000, 51L, 2, 128, 128)))
    assert(parsed(6L) == (("mp4", "isom", 600, 2L * 1000 / 600, 1, 112, 112)))
  }
}
