package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal, Y4mCodec}

/** Y4mCodec's decode contract, pinned against HAND-ASSEMBLED streams
  * built without the encoder — an encoder/decoder pair agreeing on a
  * wrong layout would still fail here. */
class Y4mCodecSpec extends SparkSpec {

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("hand-built mono stream decodes frame-exactly") {
    val f0 = Array.tabulate[Byte](6)(i => i.toByte)        // 3x2 mono
    val f1 = Array.tabulate[Byte](6)(i => (10 + i).toByte)
    val y4m = ascii("YUV4MPEG2 W3 H2 F25:1 Ip A1:1 Cmono\n") ++
      ascii("FRAME\n") ++ f0 ++ ascii("FRAME\n") ++ f1
    val v = Y4mCodec.decode(y4m).get
    assert(v.width == 3 && v.height == 2 && v.channels == 1)
    assert(v.frames.length == 2)
    assert(v.frames(0).toSeq == f0.toSeq && v.frames(1).toSeq == f1.toSeq)
  }

  test("444 and 420jpeg frame sizes; unknown header/frame params skipped") {
    // 2x2 C444: 12 bytes per frame; unknown X params on both lines
    val f = Array.tabulate[Byte](12)(i => (i * 3).toByte)
    val v = Y4mCodec.decode(
      ascii("YUV4MPEG2 W2 H2 Xsome:meta C444\n") ++
        ascii("FRAME Xtimecode=1\n") ++ f).get
    assert(v.channels == 3 && v.frameBytes == 12 &&
      v.frames.head.toSeq == f.toSeq)
    // 4x2 C420jpeg: 8 luma + 2*(2*1) chroma = 12 bytes; C default is
    // 420jpeg when absent
    val g = Array.tabulate[Byte](12)(i => (i * 5).toByte)
    val v420 = Y4mCodec.decode(
      ascii("YUV4MPEG2 W4 H2\n") ++ ascii("FRAME\n") ++ g).get
    assert(v420.colorspace == "420jpeg" && v420.frameBytes == 12)
  }

  test("adversarial streams decode to None, never throw") {
    val good = ascii("YUV4MPEG2 W3 H2 Cmono\n") ++ ascii("FRAME\n") ++
      new Array[Byte](6)
    assert(Y4mCodec.decode(good).isDefined)
    // bad magic / missing newline / unknown colorspace / odd 420 dims
    assert(Y4mCodec.decode(ascii("YUV4MPEG3 W3 H2 Cmono\nFRAME\n")).isEmpty)
    assert(Y4mCodec.decode(ascii("YUV4MPEG2 W3 H2 Cmono")).isEmpty)
    assert(Y4mCodec.decode(ascii("YUV4MPEG2 W3 H2 Cweird\nFRAME\n")).isEmpty)
    assert(Y4mCodec.decode(
      ascii("YUV4MPEG2 W3 H3\n") ++ ascii("FRAME\n") ++
        new Array[Byte](14)).isEmpty) // 420 needs even dims
    // truncated payload / garbage between frames / giant claimed dims
    assert(Y4mCodec.decode(good.dropRight(1)).isEmpty)
    assert(Y4mCodec.decode(good ++ ascii("JUNK")).isEmpty)
    assert(Y4mCodec.decode(good ++ ascii("FRAMEX\n") ++
      new Array[Byte](6)).isEmpty)
    assert(Y4mCodec.decode(
      ascii("YUV4MPEG2 W999999 H999999 Cmono\nFRAME\n")).isEmpty)
    assert(Y4mCodec.decode(ascii("YUV4MPEG2 W-3 H2 Cmono\n")).isEmpty)
    assert(Y4mCodec.decode(null).isEmpty)
    // property loop: random bytes never throw
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      Y4mCodec.decode(ascii("YUV4MPEG2") ++ b)
      Y4mCodec.decode(b)
    }
  }

  test("sampleFrames extracts real frames; resize crops whole frames and re-parses") {
    val frames = (0 until 5).map(f =>
      Array.tabulate[Byte](6)(i => (f * 10 + i).toByte))
    val y4m = Y4mCodec.encode(3, 2, "mono", frames)
    val sampled = Y4mCodec.sampleFrames(y4m, frameBytes = 6, stride = 2)
    assert(sampled.map(_.toSeq) ==
      Seq(frames(0).toSeq, frames(2).toSeq, frames(4).toSeq))
    // truncation to frameBytes
    assert(Y4mCodec.sampleFrames(y4m, frameBytes = 4, stride = 2)
      .head.toSeq == frames(0).take(4).toSeq)
    // resize keeps whole frames and yields a valid stream
    val clipped = Y4mCodec.resize(y4m, targetBytes = 13) // 2 frames fit
    val v = Y4mCodec.decode(clipped).get
    assert(v.frames.length == 2 &&
      v.frames(1).toSeq == frames(1).toSeq)
    // inside the bound or undecodable: pass-through
    assert(Y4mCodec.resize(y4m, targetBytes = 1 << 20).eq(y4m))
    val junk = ascii("not a video")
    assert(Y4mCodec.resize(junk, 4).eq(junk))
  }

  test("the codec seam runs the REAL frame decoder end to end over real bytes") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a" * 123, "en", "web", 123L),
      (1L, "b" * 502, "en", "web", 502L),
      (2L, "c" * 999, "en", "book", 999L),
      (7L, "d" * 77, "en", "book", 77L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.videoPixelTable(docs)
      .select(col("media_id"), lit("video").as("kind"), lit("y4m").as("format"),
        col("data"), lit(-1).as("width"), lit(-1).as("height"),
        lit(-1).as("sample_rate"), lit(0L).as("duration_ms"))
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(media),
      codec = Y4mCodec).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == Y4mCodec.FeatureDim))
    // real y4m bytes always decode: histogram mass present on every row
    assert(feats.forall(_.features.drop(4).sum > 0.99f))
    // frame stats match a hand computation for one doc
    val stats = Multimodal.videoFrameStats(
      Multimodal.videoPixelTable(docs)).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx")) ->
        (r.getAs[Long]("n_values"), r.getAs[Long]("sum_v"))).toMap
    // doc 2: s=2, w=3, h=3, nf=3, mono
    val want = (0 until 3).map { f =>
      val vals = for (y <- 0 until 3; x <- 0 until 3)
        yield (2 + 3 * x + 7 * y + 13 * f) % 251
      (f.toLong, (vals.size.toLong, vals.map(_.toLong).sum))
    }.toMap
    want.foreach { case (f, (n, sum)) =>
      assert(stats((2L, f)) == ((n, sum)))
    }
    // undecodable media reports the sentinel row, never drops
    val bad = Seq((99L, "nope".getBytes("US-ASCII")))
      .toDF("media_id", "data")
    val sentinel = Multimodal.videoFrameStats(bad).collect()
    assert(sentinel.length == 1 &&
      sentinel.head.getAs[Long]("channels") == -1L &&
      sentinel.head.getAs[Long]("frame_idx") == -1L)
  }

  test("perceptual fingerprint sees through byte-diverse containers") {
    val s = spark
    import s.implicits._
    // docs 3 and 13 share seed 3 (mod VidDupSeedMod = 10) but render
    // byte-different containers (doc-varied unknown header params);
    // doc 4 is a different seed entirely
    val docs = Seq(
      (3L, "a", "en", "web", 1L),
      (13L, "b", "en", "web", 1L),
      (4L, "c", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val table = Multimodal.videoDupTable(docs).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("data"))
      .toMap
    assert(!java.util.Arrays.equals(table(3L), table(13L)),
      "same-seed containers must differ bytewise")
    val fps = Multimodal.videoFingerprint(
      Multimodal.videoDupTable(docs)).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("fp_hi"), r.getAs[Long]("fp_lo"))).toMap
    assert(fps(3L) == fps(13L), "pixel-identical streams must collide")
    assert(fps(3L) != fps(4L), "different seeds must not")
    // exact-dup clustering is hash-keyed: one cluster of two, one of one
    val clusters = Multimodal.videoDupClusters(
      Multimodal.videoFingerprint(Multimodal.videoDupTable(docs)))
      .collect().map(_.getAs[Long]("n_media")).sorted
    assert(clusters.toSeq == Seq(1L, 2L))
  }

  test("near-dup banding relates an original and its inverted-window twin") {
    val s = spark
    import s.implicits._
    // doc 7 renders seed 7 unperturbed; doc 27 (7 mod 10, 0 mod 3)
    // renders the SAME pixels with the four pert windows inverted —
    // a localized edit that must land within the banding's reach
    val docs = Seq(
      (7L, "a", "en", "web", 1L),
      (27L, "b", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Multimodal.videoNearDupPairs(
      Multimodal.videoFingerprint(Multimodal.videoNearDupTable(docs)),
      maxHamming = 8).collect()
    assert(pairs.length == 1)
    val hm = pairs.head.getAs[Long]("hamming")
    assert(hm > 0L && hm <= 8L,
      s"window inversions should move a few bits, got $hm")
    // and the exact-dup pass keeps the two apart
    val clusters = Multimodal.videoDupClusters(
      Multimodal.videoFingerprint(Multimodal.videoNearDupTable(docs)))
      .collect()
    assert(clusters.length == 2)
  }

  test("a still PNG lifted from a frame hashes identically to the frame") {
    val s = spark
    import s.implicits._
    // doc 5 (seed 5, not 0 mod 3): the image fixture renders frame
    // fStar = 5 % nf of seed 5's footage as a real PNG; decoding two
    // DIFFERENT containers (y4m vs PNG) must land on one dHash
    val docs = Seq((5L, "a", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val nf = 2 + 5 % 3
    val fStar = 5 % nf
    val frame = Multimodal.videoFrameDHash(Multimodal.stillVideoTable(docs))
      .filter(col("frame_idx") === fStar).collect().head
    val image = Multimodal.imageDHash(Multimodal.stillImageTable(docs))
      .collect().head
    assert(frame.getAs[Long]("dhash_hi") == image.getAs[Long]("dhash_hi") &&
      frame.getAs[Long]("dhash_lo") == image.getAs[Long]("dhash_lo"))
  }

  test("cross-modal banding finds planted stills, exact and perturbed") {
    val s = spark
    import s.implicits._
    // seed 4 footage; doc 14 renders its still exactly, doc 24
    // (0 mod 3) perturbs row 0 — both must surface as matches
    val vids = Seq((4L, "a", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val imgs = Seq((14L, "b", "en", "web", 1L), (24L, "c", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val matches = Multimodal.stillFrameMatches(
      Multimodal.videoFrameDHash(Multimodal.stillVideoTable(vids)),
      Multimodal.imageDHash(Multimodal.stillImageTable(imgs)),
      maxHamming = 8).collect()
    val dists = matches.map(_.getAs[Long]("hamming")).sorted
    assert(dists.contains(0L), s"exact still must match at distance 0: ${dists.toSeq}")
    assert(dists.exists(d => d > 0L && d <= 8L),
      s"perturbed still must match at a small positive distance: ${dists.toSeq}")
  }

  test("footage signature ignores container bytes and frame repetition") {
    val s = spark
    import s.implicits._
    // two spatially-distinct frames under the wrapping formula
    def frame(f: Int): Array[Byte] = Array.tabulate(10 * 8) { k =>
      val x = k % 10
      val y = k / 10
      ((3 + 3 * x + 7 * y + 13 * f + 5 * x * y) % 251).toByte
    }
    val videos = Seq(
      // same footage, different container params
      (1L, Y4mCodec.encode(10, 8, "mono", Seq(frame(0), frame(1)),
        headerExtra = " Xa")),
      (2L, Y4mCodec.encode(10, 8, "mono", Seq(frame(0), frame(1)),
        headerExtra = " Xbb", frameExtra = " Xf")),
      // same footage with a frame REPEATED — the distinct set is equal
      (3L, Y4mCodec.encode(10, 8, "mono",
        Seq(frame(0), frame(1), frame(0)))),
      // different footage
      (4L, Y4mCodec.encode(10, 8, "mono", Seq(frame(2)))))
      .toDF("media_id", "data")
    val sigs = Multimodal.footageSignature(
      Multimodal.videoFrameDHash(videos)).collect()
      .map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("footage_sig")).toMap
    assert(sigs(1L) == sigs(2L), "re-containered footage must collide")
    assert(sigs(1L) == sigs(3L), "frame repetition must not change the set")
    assert(sigs(1L) != sigs(4L), "different footage must not collide")
    val clusters = Multimodal.footageClusters(
      Multimodal.footageSignature(Multimodal.videoFrameDHash(videos)))
      .collect().map(_.getAs[Long]("n_videos")).sorted
    assert(clusters.toSeq == Seq(1L, 3L))
  }

  test("overlapping clips of one source relate as near-duplicate footage") {
    val s = spark
    import s.implicits._
    // seed 2 (nf = 4, clips of 3 frames): docs 2 and 22 cut window 0
    // ({0,1,2}), doc 12 window 1 ({1,2,3}) — 2↔22 duplicate exactly,
    // 2↔12 overlap 2 of 4 distinct frames
    val docs = Seq(
      (2L, "a", "en", "web", 1L),
      (12L, "b", "en", "web", 1L),
      (22L, "c", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Multimodal.footageNearDupPairs(
      Multimodal.videoFrameDHash(Multimodal.clipTable(docs)))
      .collect()
      .map(r => (r.getAs[Long]("video_a"), r.getAs[Long]("video_b")) ->
        r.getAs[Double]("est_sim")).toMap
    assert(pairs((2L, 22L)) == 1.0, s"identical clips must score 1.0: $pairs")
    val near = pairs.get((2L, 12L))
    assert(near.exists(v => v > 0.0 && v < 1.0),
      s"overlapping clips must relate below 1.0: $pairs")
  }
}
