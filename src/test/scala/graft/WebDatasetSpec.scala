package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

import graft.functions.TarEntries
import graft.multimodal.Multimodal

class WebDatasetSpec extends SparkSpec {

  private val params = Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(31L))

  private def parseStatic(b: Array[Byte]): Seq[(String, String, Long, Long, String)] = {
    val arr = TarEntries.parse(b)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 5)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
        r.getLong(2), r.getLong(3), r.getUTF8String(4).toString)
    }
  }

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  test("ustar framing: names, sizes, block-aligned offsets, checksum validated") {
    val p1 = "hello tar world".getBytes("UTF-8")   // 15 bytes -> 1 data block
    val p2 = new Array[Byte](513)                   // -> 2 data blocks
    val p3 = Array.emptyByteArray                   // -> 0 data blocks
    val tar = Multimodal.tarEntry("a.txt", p1) ++
      Multimodal.tarEntry("deep/dir/b.bin", p2) ++
      Multimodal.tarEntry("c.empty", p3) ++ new Array[Byte](1024)
    val es = parseStatic(tar)
    assert(es.map(_._1) == Seq("a.txt", "deep/dir/b.bin", "c.empty"))
    assert(es.map(_._3) == Seq(15L, 513L, 0L))
    // payload offsets: 512 (after h1); 1024+512 (h1+d1+h2); 2560+512
    assert(es.map(_._4) == Seq(512L, 1536L, 3072L))
    assert(es.map(_._2).forall(_ == "0"))
    assert(es.head._5 == md5Hex(p1))

    // a flipped header byte breaks the checksum: later entries drop, the
    // archive never mis-frames
    val corrupt = tar.clone()
    corrupt(1024) = 'X'.toByte // first name byte of entry 2's header
    assert(parseStatic(corrupt).map(_._1) == Seq("a.txt"))

    // truncated data region, garbage, empty: never throw
    assert(parseStatic(tar.take(600)).isEmpty) // entry 1's block overruns
    assert(parseStatic("definitely not a tar".getBytes("UTF-8")).isEmpty)
    assert(parseStatic(Array.emptyByteArray).isEmpty)
    val r = check(params, Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      TarEntries.parse(bytes) != null
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("forged giant size field stops the walk — Long offsets, no Int overflow") {
    // a trivially forgeable valid-checksum header can claim 8^11-1 bytes
    // (~8.5e9): Int offset arithmetic would wrap `end` negative, pass the
    // length guard, and throw inside the md5 slice. The walk must stop.
    val good = Multimodal.tarEntry("a.txt", "x".getBytes("UTF-8"))
    val h = good.take(512)
    val forged = "77777777777".getBytes("US-ASCII") // max 11-octal-digit size
    System.arraycopy(forged, 0, h, 124, forged.length)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += (if (i >= 148 && i < 156) 32 else h(i) & 0xff); i += 1 }
    System.arraycopy(f"$sum%06o".getBytes("US-ASCII"), 0, h, 148, 6)
    assert(parseStatic(h ++ good.drop(512)).isEmpty) // stops, never throws
    // just past the per-entry cap: also refused, even when blocks "fit"
    val capped = good.take(512)
    val overCap = "%011o".format(TarEntries.MaxEntryBytes + 1).getBytes("US-ASCII")
    System.arraycopy(overCap, 0, capped, 124, overCap.length)
    sum = 0L; i = 0
    while (i < 512) { sum += (if (i >= 148 && i < 156) 32 else capped(i) & 0xff); i += 1 }
    System.arraycopy(f"$sum%06o".getBytes("US-ASCII"), 0, capped, 148, 6)
    assert(parseStatic(capped ++ good.drop(512)).isEmpty)
  }

  test("WdsPngBytes pins the constant png member size the oracle arithmetic uses") {
    // every synthPng is the same byte count regardless of field values
    assert(Multimodal.synthPng(1, 1, 8, 0).length == Multimodal.WdsPngBytes)
    assert(Multimodal.synthPng(999, 777, 16, 6).length == Multimodal.WdsPngBytes)
  }

  test("tfrecord framing: masked crc32c both validated, offsets cumulative, never throws") {
    import graft.functions.TfRecords
    def parseTf(b: Array[Byte]): Seq[(Long, Long, String)] = {
      val arr = TfRecords.parse(b)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 3)
        (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString)
      }
    }
    val a = "first example".getBytes("UTF-8")    // 13 bytes
    val b = Array.emptyByteArray
    val c = ("z" * 300).getBytes("UTF-8")
    val shard = Multimodal.tfRecord(a) ++ Multimodal.tfRecord(b) ++ Multimodal.tfRecord(c)
    val recs = parseTf(shard)
    assert(recs.map(_._2) == Seq(13L, 0L, 300L))
    // offsets: 12; (16+13)+12 = 41; (16+13)+(16+0)+12 = 57
    assert(recs.map(_._1) == Seq(12L, 41L, 57L))
    assert(recs.head._3 == md5Hex(a))

    // flipped payload byte fails the payload crc; flipped length byte
    // fails the length crc — in both cases prior records survive
    val badPayload = shard.clone(); badPayload(12) = 'X'.toByte
    assert(parseTf(badPayload).isEmpty)
    val badLen = shard.clone(); badLen(29 + 0) = 99.toByte // record 2's length field
    assert(parseTf(badLen).map(_._2) == Seq(13L))

    // truncation, garbage, hostile length: recovered prefix only
    assert(parseTf(shard.dropRight(2)).map(_._2) == Seq(13L, 0L))
    assert(parseTf("not a tfrecord".getBytes("UTF-8")).isEmpty)
    assert(parseTf(Array.emptyByteArray).isEmpty)
    val r = check(params, Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      TfRecords.parse(bytes) != null
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("webdatasetTable: shards frame to paired samples through the DataFrame path") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "text zero", "en", "web", 9L),
      (32L, "text thirty-two shares bucket zero", "en", "web", 34L),
      (1L, "text one", "en", "book", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val entries = Multimodal.webdatasetTable(docs)
      .select(col("source"), col("bucket"),
        posexplode(TarEntries.tar_entries(col("data"))).as(Seq("i", "e")))
      .select(col("source"), col("bucket"), col("i"), col("e.name"), col("e.size"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3), r.getLong(4)))
    assert(entries.length == 6) // 3 docs x (txt + png)
    val webB0 = entries.filter(t => t._1 == "web" && t._2 == 0L).sortBy(_._3)
    assert(webB0.map(_._4).toSeq == Seq("0.txt", "0.png", "32.txt", "32.png"))
    assert(webB0.map(_._5).toSeq ==
      Seq(9L, Multimodal.WdsPngBytes.toLong, 34L, Multimodal.WdsPngBytes.toLong))
    // the png member parses as a REAL png through the image codec
    val pngBytes = Multimodal.webdatasetTable(docs)
      .filter(col("source") === "book")
      .select(element_at(graft.functions.TarEntries.tar_entries(col("data")), 2).as("e"))
      .select(col("e.offset"), col("e.size")).collect().head
    assert(pngBytes.getLong(1) == Multimodal.WdsPngBytes.toLong)
  }
}
