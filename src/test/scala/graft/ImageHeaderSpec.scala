package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

import graft.functions.ImageHeader
import graft.multimodal.Multimodal

class ImageHeaderSpec extends SparkSpec {

  private val params = Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  /** Parse through the DataFrame path (whole-stage codegen), flattened. */
  private def parseDf(payloads: Seq[Array[Byte]]): Seq[Row] = {
    val s = spark
    import s.implicits._
    payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "data")
      .select(col("id"), ImageHeader.image_header(col("data")).as("h"))
      .orderBy("id")
      .select("h.format", "h.width", "h.height", "h.bit_depth", "h.color_type", "h.orientation")
      .collect()
      .toSeq
  }

  /** Parse through the static entry (interpreted path), same row shape. */
  private def parseStatic(b: Array[Byte]): (String, Int, Int, Int, Int, Int) = {
    val r = ImageHeader.parse(b)
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
  }

  test("png: IHDR fields recovered from synthesized real bytes") {
    val b = Multimodal.synthPng(width = 640, height = 481, bitDepth = 16, colorType = 6)
    assert(parseStatic(b) == (("png", 640, 481, 16, 6, -1)))
  }

  test("png: handcrafted signature + IHDR (1x1 RGBA, the canonical tiny png header)") {
    // 89 P N G \r \n 1A \n | len 13 | IHDR | w=1 h=1 depth=8 color=6 0 0 0 | crc
    val bytes = Array[Int](
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89).map(_.toByte)
    assert(parseStatic(bytes) == (("png", 1, 1, 8, 6, -1)))
  }

  test("jpeg: SOF dims + components and EXIF orientation in BOTH tiff byte orders") {
    val mm = Multimodal.synthJpeg(800, 600, components = 3, orientation = 6, bigEndianTiff = true)
    val ii = Multimodal.synthJpeg(33, 7, components = 1, orientation = 8, bigEndianTiff = false)
    assert(parseStatic(mm) == (("jpeg", 800, 600, 8, 3, 6)))
    assert(parseStatic(ii) == (("jpeg", 33, 7, 8, 1, 8)))
  }

  test("jpeg: no APP1 -> orientation -1 (reports the bytes, not the display default)") {
    val full = Multimodal.synthJpeg(10, 20, 3, 5, bigEndianTiff = true)
    // strip the APP1 segment: rebuild by removing bytes between COM end and DQT
    val app1Start = {
      var i = 2; var found = -1
      while (found < 0 && i + 3 < full.length) {
        if ((full(i) & 0xff) == 0xff && (full(i + 1) & 0xff) == 0xe1) found = i
        else i += 1
      }
      found
    }
    val segLen = ((full(app1Start + 2) & 0xff) << 8) | (full(app1Start + 3) & 0xff)
    val stripped = full.take(app1Start) ++ full.drop(app1Start + 2 + segLen)
    assert(parseStatic(stripped) == (("jpeg", 10, 20, 8, 3, -1)))
  }

  test("garbage, truncation, and non-image bytes parse to unknown, never throw") {
    val png = Multimodal.synthPng(9, 9, 8, 2)
    val jpg = Multimodal.synthJpeg(9, 9, 3, 1, bigEndianTiff = false)
    val cases = Seq(
      Array.emptyByteArray,
      "not an image at all".getBytes("UTF-8"),
      png.take(12),                      // truncated inside IHDR length
      png.take(20),                      // truncated inside IHDR payload
      jpg.take(2),                       // bare SOI
      jpg.take(6),                       // truncated inside APP0
      Array.fill[Byte](64)(0xff.toByte)) // fill bytes forever
    cases.foreach { b =>
      val (fmt, w, _, _, _, _) = parseStatic(b)
      assert(fmt == "unknown" && w == -1, s"bytes ${b.length}")
    }
  }

  test("property: arbitrary byte arrays never throw; codegen path == static parse") {
    val r = check(params, Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      parseStatic(bytes)._1 != null
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
    // hostile length fields: jpeg SOI + marker with enormous declared length
    val hostile = Array(0xff, 0xd8, 0xff, 0xe1, 0xff, 0xff, 0x01).map(_.toByte)
    assert(parseStatic(hostile)._1 == "unknown")

    val payloads = Seq(
      Multimodal.synthPng(123, 45, 8, 0),
      Multimodal.synthJpeg(77, 88, 3, 4, bigEndianTiff = true),
      "junk".getBytes("UTF-8"))
    val viaDf = parseDf(payloads)
    payloads.zip(viaDf).foreach { case (b, row) =>
      val s = parseStatic(b)
      assert((row.getString(0), row.getInt(1), row.getInt(2), row.getInt(3),
        row.getInt(4), row.getInt(5)) == s)
    }
  }

  test("imageTable: builder-parser round trip matches the arithmetic the oracle uses") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "aaaa", "en", "web", 4L),
      (1L, "bbbbbb", "en", "web", 6L),
      (2L, "c" * 1500, "en", "book", 1500L),
      (3L, "d" * 2100, "en", "book", 2100L),
      (4L, "e", "en", "web", 1L),
      (9L, "f" * 805, "en", "web", 805L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val parsed = Multimodal.imageTable(docs)
      .select(col("media_id"), ImageHeader.image_header(col("data")).as("h"))
      .select(col("media_id"), col("h.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    // even -> png: width 1+n_chars%1000, height 1+doc_id%800,
    //   depth 16 iff doc_id%4==0, color in {0,2,6} by (doc_id/2)%3
    assert(parsed(0L) == (("png", 5, 1, 16, 0, -1)))
    assert(parsed(2L) == (("png", 501, 3, 8, 2, -1)))
    assert(parsed(4L) == (("png", 2, 5, 16, 6, -1)))
    // odd -> jpeg: precision 8, components 1 iff doc_id%3==0 else 3,
    //   orientation 1+(doc_id/2)%8
    assert(parsed(1L) == (("jpeg", 7, 2, 8, 3, 1)))
    assert(parsed(3L) == (("jpeg", 101, 4, 8, 1, 2)))
    assert(parsed(9L) == (("jpeg", 806, 10, 8, 1, 5)))
  }

  test("ImageHeaderCodec drives the codec seam: features are parsed header fields") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "x" * 250, "en", "web", 250L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.asMedia(
      Multimodal.imageTable(docs)
        .select(col("media_id"), lit("image").as("kind"), lit("png").as("format"),
          col("data"), lit(-1).as("width"), lit(-1).as("height"),
          lit(-1).as("sample_rate"), lit(-1L).as("duration_ms")))
    val f = Multimodal.extractFeatures(media, Multimodal.ImageHeaderCodec).collect().head
    assert(f.features.length == Multimodal.ImageHeaderCodec.FeatureDim)
    assert(f.features.toSeq == Seq(1f, 251f, 1f, 16f, 0f, -1f))
  }
}
