package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal, WavPcmCodec}

class WavPcmCodecSpec extends SparkSpec {

  // the fixture's sample-byte formula, re-derived by hand
  private def synthAmp(bits: Int, k: Int): Int =
    if (bits == 16) {
      val v = ((2 * k * 7 + 3) % 251) + 256 * (((2 * k + 1) * 7 + 3) % 251)
      if (v >= 0x8000) v - 0x10000 else v
    } else ((k * 7 + 3) % 251) - 128

  test("locate + sampleAt decode the synthesized PCM exactly (both widths)") {
    for ((channels, rate, bits, frames) <- Seq((2, 44100, 16, 10), (1, 8000, 8, 7))) {
      val wav = Multimodal.synthWav(channels, rate, bits, frames)
      val p = WavPcmCodec.locate(wav).get
      assert(p.channels == channels && p.sampleRate == rate &&
        p.bitsPerSample == bits && p.nSamples == frames * channels)
      (0 until p.nSamples).foreach { k =>
        assert(WavPcmCodec.sampleAt(wav, p, k) == synthAmp(bits, k))
      }
    }
  }

  test("decodeFeatures: exact-integer-derived stats, zero vector on garbage") {
    val wav = Multimodal.synthWav(1, 16000, 16, 5)
    val f = WavPcmCodec.decodeFeatures(wav)
    assert(f.length == WavPcmCodec.FeatureDim)
    val amps = (0 until 5).map(synthAmp(16, _))
    assert(math.abs(f(0) - amps.sum.toFloat / 5 / 32768f) < 1e-6)
    assert(math.abs(f(1) - amps.map(math.abs).sum.toFloat / 5 / 32768f) < 1e-6)
    assert(f(2) == amps.min / 32768f && f(3) == amps.max / 32768f)
    assert(math.abs(f.drop(4).sum - 1f) < 1e-5) // histogram sums to 1
    // robustness: garbage, truncated, empty, non-PCM format all -> zeros
    assert(WavPcmCodec.decodeFeatures("not a wav".getBytes).forall(_ == 0f))
    assert(WavPcmCodec.decodeFeatures(wav.take(20)).forall(_ == 0f))
    assert(WavPcmCodec.decodeFeatures(Array.emptyByteArray).forall(_ == 0f))
  }

  test("sampleFrames cuts the data chunk; resize clips to whole blocks and re-parses") {
    val wav = Multimodal.synthWav(2, 44100, 16, 100) // blockAlign 4, 400 data bytes
    val frames = WavPcmCodec.sampleFrames(wav, frameBytes = 64, stride = 2)
    assert(frames.length == 4) // windows 0,2,4,6 of ceil(400/64)=7
    assert(frames.forall(_.length == 64 || frames.last.length == 400 % 64))
    val p = WavPcmCodec.locate(wav).get
    assert(frames.head.sameElements(
      java.util.Arrays.copyOfRange(wav, p.dataOffset, p.dataOffset + 64)))
    // resize: 100 frames -> at most 50 bytes of samples = 48 (whole blocks)
    val clipped = WavPcmCodec.resize(wav, 50)
    val cp = WavPcmCodec.locate(clipped).get
    assert(cp.dataSize == 48 && cp.nSamples == 24)
    (0 until cp.nSamples).foreach { k =>
      assert(WavPcmCodec.sampleAt(clipped, cp, k) == synthAmp(16, k))
    }
    // the header stays intact and the parser's n_frames follows the clip
    assert(WavPcmCodec.resize(wav, 4096).sameElements(wav)) // no upscale
  }

  test("hostile input never throws (property): locate/decode over random bytes") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters, Passed, Proved}
    val params = Parameters.default.withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(53L))
    val r = check(params, Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      WavPcmCodec.decodeFeatures(bytes).length == WavPcmCodec.FeatureDim &&
        WavPcmCodec.sampleFrames(bytes, 64, 2) != null &&
        WavPcmCodec.resize(bytes, 128) != null
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
    // and over a valid header with a truncated/corrupted tail
    val wav = Multimodal.synthWav(2, 44100, 16, 50)
    (0 until wav.length by 37).foreach { cut =>
      assert(WavPcmCodec.decodeFeatures(wav.take(cut)).length ==
        WavPcmCodec.FeatureDim)
    }
  }

  test("near-dup banding relates an original and its NOT-window perturbation") {
    val s = spark
    import s.implicits._
    // one seed's original + perturbed renderings (different container
    // padding too): NOTed windows flip only boundary comparisons, so
    // the pair sits at a small positive Hamming distance
    val bits = 16
    val n = 160
    val pertWindows = Multimodal.AudNearPertWindows.toSet
    def amps(pert: Boolean) = Array.tabulate(n) { k =>
      val a = synthAmp(bits, k)
      if (pert && pertWindows((k.toLong * 65L / n).toInt)) -1 - a else a
    }
    val fps = Multimodal.audioFingerprint(Seq(
      (1L, Multimodal.synthWavFromAmps(1, 8000, bits, amps(pert = false),
        junkLen = 3)),
      (2L, Multimodal.synthWavFromAmps(1, 8000, bits, amps(pert = true),
        junkLen = 17)))
      .toDF("media_id", "data"))
    val pairs = Multimodal.audioNearDupPairs(fps, maxHamming = 8).collect()
    assert(pairs.length == 1)
    val hm = pairs.head.getAs[Long]("hamming")
    assert(hm > 0L && hm <= 8L,
      s"window NOTs should move a few bits, got $hm")
  }

  test("the codec seam runs the REAL decoder end to end over real bytes") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a" * 123, "en", "web", 123L),
      (1L, "b" * 502, "en", "web", 502L),
      (2L, "c" * 999, "en", "book", 999L),
      (3L, "d" * 77, "en", "book", 77L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.audioTable(docs)
      .select(col("media_id"), lit("audio").as("kind"), lit("wav").as("format"),
        col("data"), lit(-1).as("width"), lit(-1).as("height"),
        lit(16000).as("sample_rate"), lit(0L).as("duration_ms"))
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(media),
      codec = WavPcmCodec).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == WavPcmCodec.FeatureDim))
    // real WAV bytes always decode: histogram mass present on every row
    assert(feats.forall(_.features.drop(4).sum > 0.99f))
  }
}
