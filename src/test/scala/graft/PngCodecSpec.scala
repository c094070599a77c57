package graft

import graft.multimodal.{Multimodal, PngCodec}

/** PngCodec's decode contract. The filter inversions are pinned against
  * HAND-COMPUTED filtered byte vectors assembled without the encoder
  * (spec-side chunk framing + Deflater), so an encoder/decoder pair that
  * agreed on a wrong filter convention would still fail here. */
class PngCodecSpec extends SparkSpec {

  // -- spec-side PNG assembly: independent of PngCodec.encode -----------
  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(t: String, payload: Array[Byte]): Array[Byte] = {
    val body = t.getBytes("US-ASCII") ++ payload
    val c = new java.util.zip.CRC32
    c.update(body)
    be32(payload.length) ++ body ++ be32(c.getValue.toInt)
  }

  private def deflate(d: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    val bos = new java.io.ByteArrayOutputStream()
    defl.setInput(d)
    defl.finish()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    bos.toByteArray
  }

  private val sig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def png(w: Int, h: Int, colorType: Int,
      filtered: Array[Byte]): Array[Byte] =
    sig ++ chunk("IHDR", be32(w) ++ be32(h) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)) ++
      chunk("IDAT", deflate(filtered)) ++
      chunk("IEND", Array.emptyByteArray)

  test("Sub and Up filters invert to the hand-computed raw bytes") {
    // 3x2 grayscale, raw rows [10,20,30] / [40,60,90]:
    // Sub-filtered row0 = [10,10,10], Up-filtered row1 = [30,40,60]
    val filtered = Array[Byte](1, 10, 10, 10, 2, 30, 40, 60)
    val img = PngCodec.decode(png(3, 2, 0, filtered)).get
    assert((img.width, img.height, img.channels) == (3, 2, 1))
    assert(img.raw.map(_ & 0xff).toSeq == Seq(10, 20, 30, 40, 60, 90))
  }

  test("Average and Paeth filters invert to the hand-computed raw bytes") {
    // 2x2 grayscale, raw rows [100,200] / [50,255]:
    // Average row0: [100 - 0, 200 - 100/2] = [100, 150]
    // Paeth row1:   predictors [up=100, up=200] -> [50-100, 255-200]
    val filtered = Array[Byte](3, 100.toByte, 150.toByte,
      4, ((50 - 100) & 0xff).toByte, 55)
    val img = PngCodec.decode(png(2, 2, 0, filtered)).get
    assert(img.raw.map(_ & 0xff).toSeq == Seq(100, 200, 50, 255))
  }

  test("truecolor bpp: Sub filter steps by channel count, not by byte") {
    // 2x1 RGB, raw = [10,20,30, 11,22,33]; Sub row:
    // first pixel unchanged, second = diff vs previous PIXEL's channel
    val filtered = Array[Byte](1, 10, 20, 30, 1, 2, 3)
    val img = PngCodec.decode(png(2, 1, 2, filtered)).get
    assert(img.channels == 3)
    assert(img.raw.map(_ & 0xff).toSeq == Seq(10, 20, 30, 11, 22, 33))
  }

  test("encode round-trips through decode for both color types and all filters") {
    for (colorType <- Seq(0, 2); w <- Seq(1, 5, 16); h <- Seq(1, 7, 12)) {
      val ch = if (colorType == 0) 1 else 3
      val raw = Array.tabulate[Byte](w * h * ch)(k => ((k * 31 + 7) % 253).toByte)
      val img = PngCodec.decode(
        PngCodec.encode(w, h, colorType, raw, y => y % 5)).get
      assert((img.width, img.height, img.channels) == (w, h, ch))
      assert(img.raw.toSeq == raw.toSeq,
        s"round-trip mismatch at w=$w h=$h ct=$colorType")
    }
  }

  test("adversarial inputs decode to None, never throw") {
    val good = PngCodec.encode(4, 3, 0,
      Array.tabulate[Byte](12)(_.toByte), _ => 2)
    assert(PngCodec.decode(good).isDefined)
    // flipped IDAT byte -> chunk CRC fails
    val corrupt = good.clone()
    corrupt(sig.length + 25 + 8 + 2) = (corrupt(sig.length + 25 + 8 + 2) ^ 0x40).toByte
    assert(PngCodec.decode(corrupt).isEmpty)
    // truncated stream
    assert(PngCodec.decode(good.dropRight(16)).isEmpty)
    // header-only fixture (no IDAT) and JPEG are undecodable, not errors
    assert(PngCodec.decode(Multimodal.synthPng(8, 8, 8, 0)).isEmpty)
    assert(PngCodec.decode(Multimodal.synthJpeg(8, 8, 3, 1,
      bigEndianTiff = false)).isEmpty)
    assert(PngCodec.decode(null).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    // 16-bit depth is out of contract
    assert(PngCodec.decode(sig ++ chunk("IHDR", be32(2) ++ be32(2) ++
      Array(16.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte)) ++
      chunk("IEND", Array.emptyByteArray)).isEmpty)
  }

  test("media surface: features, scanline frames, crop resize") {
    val raw = Array.tabulate[Byte](6 * 4)(k => (k * 10).toByte)
    val data = PngCodec.encode(6, 4, 0, raw, y => y % 5)
    // features: normalized exact integer stats, non-zero
    val f = PngCodec.decodeFeatures(data)
    assert(f.length == PngCodec.FeatureDim && f.sum > 0f)
    assert(PngCodec.decodeFeatures("junk".getBytes("UTF-8")).forall(_ == 0f))
    // frames: every 2nd scanline, truncated to 3 bytes
    val frames = PngCodec.sampleFrames(data, 3, 2)
    assert(frames.length == 2)
    assert(frames(0).toSeq == raw.slice(0, 3).toSeq)
    assert(frames(1).toSeq == raw.slice(12, 15).toSeq)
    // resize: keep 2 whole rows (12 bytes), still a valid PNG
    val cropped = PngCodec.decode(PngCodec.resize(data, 13)).get
    assert((cropped.width, cropped.height) == (6, 2))
    assert(cropped.raw.toSeq == raw.slice(0, 12).toSeq)
    // already inside the bound: pass-through
    assert(PngCodec.resize(data, 1000).sameElements(data))
  }

  test("imagePixelStats gate surface: formula stats for decodable, -1 for not") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "a", 5L), (1L, "a", 3L), (2L, "b", 20L))
      .toDF("doc_id", "source", "n_chars")
    val stats = Multimodal.imagePixelStats(Multimodal.imagePixelTable(docs))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("channels"), r.getAs[Long]("n_values"),
          r.getAs[Long]("sum_v"))).toMap
    // doc 1: w = 1 + 3%16 = 4, h = 1 + 1%12 = 2, truecolor
    val (w, h, ch) = (4, 2, 3)
    var want = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      want += (1L + 3 * x + 7 * y + 11 * c) % 251
    assert(stats(1L) == ((w.toLong, h.toLong, ch.toLong,
      (w * h * ch).toLong, want)))
    // undecodable row (header-only PNG) reports -1, present
    val broken = Seq((9L, Multimodal.synthPng(4, 4, 8, 0)))
      .toDF("media_id", "data")
    val r = Multimodal.imagePixelStats(broken).collect().head
    assert(r.getAs[Long]("channels") == -1L && r.getAs[Long]("n_values") == 0L)
  }

  test("dHash is a content hash: same pixels through different filters collide, bytes differ") {
    val s = spark
    import s.implicits._
    val raw = Array.tabulate[Byte](12 * 8 * 3)(k => ((k * 37 + 5) % 251).toByte)
    val a = PngCodec.encode(12, 8, 2, raw, y => y % 5)      // mixed filters
    val b = PngCodec.encode(12, 8, 2, raw, _ => 0)          // all-None filters
    assert(!a.sameElements(b), "containers should be bytewise different")
    // globally inverted pixels: brightness relations flip
    val inv = raw.map(v => (255 - (v & 0xff)).toByte)
    val c = PngCodec.encode(12, 8, 2, inv, _ => 0)
    val out = Multimodal.imageDHash(
      Seq((1L, a), (2L, b), (3L, c), (4L, "junk".getBytes("UTF-8")))
        .toDF("media_id", "data"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("channels"), r.getAs[Long]("dhash_hi"),
          r.getAs[Long]("dhash_lo"))).toMap
    assert(out(1L) == out(2L), "same pixels must hash identically")
    assert(out(1L) != out(3L), "inverted pixels must not collide")
    assert(out(4L)._1 == -1L, "undecodable reports channels = -1")
    // clusters: one hash-keyed aggregation, decodables only
    val clusters = Multimodal.imageDupClusters(Multimodal.imageDHash(
      Seq((1L, a), (2L, b), (3L, c), (4L, "junk".getBytes("UTF-8")))
        .toDF("media_id", "data"))).collect()
      .map(r => (r.getAs[Long]("n_images"), r.getAs[Long]("min_media"),
        r.getAs[Long]("max_media"))).toSet
    assert(clusters == Set((2L, 1L, 2L), (1L, 3L, 3L)))
  }

  test("near-dup banding relates a locally perturbed image to its original") {
    val s = spark
    import s.implicits._
    // one seed's original + perturbed renderings (different filters too)
    val w = 12; val h = 8
    def raw(bump: Boolean) = Array.tabulate[Byte](w * h) { k =>
      val x = k % w; val y = k / w
      val v = (3 * x + 7 * y) % 251 + (if (bump && y == 0 && x < w / 2) 5 else 0)
      v.toByte
    }
    val hashes = Multimodal.imageDHash(Seq(
      (1L, PngCodec.encode(w, h, 0, raw(bump = false), y => y % 5)),
      (2L, PngCodec.encode(w, h, 0, raw(bump = true), _ => 0)))
      .toDF("media_id", "data"))
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 8).collect()
    assert(pairs.length == 1)
    val hm = pairs.head.getAs[Long]("hamming")
    assert(hm > 0L && hm <= 8L,
      s"local perturbation should move a few bits, got $hm")
  }

  test("banding is an exact bit slice even at double-precision carry boundaries") {
    val s = spark
    import s.implicits._
    // lo values past 2^53: (lo / 65536.0).toLong — the old double-division
    // band extraction — reads bits 16–31 of 0x2000000000ffff as 1, of
    // (^3) as 0, so the pair's only true shared band (bits 16–31 == 0)
    // would be missed; shiftrightunsigned slices both to 0 exactly.
    // Every other band genuinely differs (low-16 bits, both hi halves),
    // so this pair is visible IFF the bit-slice banding is exact.
    val loA = 0x2000000000ffffL
    val loB = loA ^ 3L // 2 xor bits in the low 16
    val hashes = Seq(
      (1L, 1L, 0x10001L, loA),
      (2L, 1L, 0x20002L, loB)) // hi xor 0x30003: 4 bits, both halves move
      .toDF("media_id", "channels", "dhash_hi", "dhash_lo")
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 8).collect()
    assert(pairs.length == 1, "carry-boundary pair must share the bits-16-31 band")
    assert(pairs.head.getAs[Long]("hamming") == 6L)
  }

  test("adversarial zlib/filter streams decode to None, never hang or crash") {
    // FDICT flag set in an otherwise CRC-valid IDAT: Inflater returns 0
    // forever with needsInput=false — decode must bail, not spin
    val idat = Array[Byte](0x78, 0x20, 0, 0, 0, 0) // CMF + FLG(FDICT), junk
    val evil = sig ++ chunk("IHDR", be32(3) ++ be32(2) ++
      Array(8.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte)) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.emptyByteArray)
    assert(PngCodec.decode(evil).isEmpty) // would previously hang forever
    // unknown scanline filter type (>= 5) with valid CRCs: undecodable,
    // not Some(empty) — sampleFrames must yield no frames, not throw
    val badFilter = png(3, 2, 0, Array[Byte](7, 1, 2, 3, 0, 4, 5, 6))
    assert(PngCodec.decode(badFilter).isEmpty)
    assert(PngCodec.sampleFrames(badFilter, 3, 1).isEmpty)
    assert(PngCodec.decodeFeatures(badFilter).forall(_ == 0f))
  }
}
