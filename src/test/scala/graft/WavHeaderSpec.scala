package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

import graft.functions.WavHeader
import graft.multimodal.Multimodal

class WavHeaderSpec extends SparkSpec {

  private val params = Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(77L))

  private def parseStatic(b: Array[Byte]): (String, Int, Int, Int, Int, Long, Long) = {
    val r = WavHeader.parse(b)
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getLong(5), r.getLong(6))
  }

  test("wav: fmt + data fields recovered through the LIST pad-byte chunk") {
    val b = Multimodal.synthWav(channels = 2, sampleRate = 44100, bitsPerSample = 16, nFrames = 441)
    // blockAlign 4, dataSize 1764, duration = 441*1000/44100 = 10ms
    assert(parseStatic(b) == (("wav", 1, 2, 44100, 16, 441L, 10L)))
    val mono8 = Multimodal.synthWav(1, 8000, 8, 37) // odd dataSize -> data pad byte
    assert(parseStatic(mono8) == (("wav", 1, 1, 8000, 8, 37L, 4L)))
  }

  test("wav: streamed file with overrunning data size counts actual remaining bytes") {
    val b = Multimodal.synthWav(1, 16000, 16, 100)
    // inflate the data chunk's declared size beyond the buffer: the parser
    // must fall back to the actual remaining byte count (200 bytes = 100 frames)
    val dataAt = {
      var i = 12; var found = -1
      while (found < 0 && i + 8 <= b.length) {
        if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') found = i
        else i += 1
      }
      found
    }
    val inflated = b.clone()
    inflated(dataAt + 4) = 0xff.toByte
    inflated(dataAt + 5) = 0xff.toByte
    inflated(dataAt + 6) = 0x7f.toByte
    assert(parseStatic(inflated) == (("wav", 1, 1, 16000, 16, 100L, 6L)))
  }

  test("garbage, truncation, and non-wav bytes parse to unknown, never throw") {
    val wav = Multimodal.synthWav(2, 8000, 16, 10)
    val cases = Seq(
      Array.emptyByteArray,
      "RIFFxxxx".getBytes("US-ASCII"),          // no WAVE tag
      wav.take(11),                              // truncated header
      wav.take(30),                              // truncated inside LIST
      Multimodal.synthPng(5, 5, 8, 2))           // a png is not a wav
    cases.foreach { b =>
      assert(parseStatic(b)._1 == "unknown", s"bytes ${b.length}")
    }
    val r = check(params, Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      parseStatic(bytes)._1 != null
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("audioTable: builder-parser round trip matches the oracle arithmetic; codegen == static") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a" * 123, "en", "web", 123L),
      (1L, "b" * 502, "en", "web", 502L),
      (2L, "c" * 999, "en", "book", 999L),
      (3L, "d" * 77, "en", "book", 77L),
      (6L, "e" * 500, "en", "web", 500L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val parsed = Multimodal.audioTable(docs)
      .select(col("media_id"), WavHeader.wav_header(col("data")).as("h"))
      .select(col("media_id"), col("h.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getLong(6), r.getLong(7))).toMap
    // channels 1+(id/2)%2, rate by id%3 in {8000,16000,44100},
    // bits 8 iff id%4>=2, frames 1+n_chars%500, duration frames*1000/rate
    assert(parsed(0L) == (("wav", 1, 1, 8000, 16, 124L, 15L)))
    assert(parsed(1L) == (("wav", 1, 1, 16000, 16, 3L, 0L)))
    assert(parsed(2L) == (("wav", 1, 2, 44100, 8, 500L, 11L)))
    assert(parsed(3L) == (("wav", 1, 2, 8000, 8, 78L, 9L)))
    assert(parsed(6L) == (("wav", 1, 2, 8000, 8, 1L, 0L)))
    parsed.values.foreach(v => assert(v._1 == "wav"))
  }
}
