package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

import graft.functions.WarcRecords
import graft.multimodal.Multimodal

class WarcRecordsSpec extends SparkSpec {

  private val params = Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(123L))

  private def parseStatic(b: Array[Byte]): Seq[(Long, String, String, Long, String)] = {
    val arr = WarcRecords.parse(b)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 5)
      (r.getLong(0),
        Option(r.getUTF8String(1)).map(_.toString).orNull,
        Option(r.getUTF8String(2)).map(_.toString).orNull,
        r.getLong(3), r.getUTF8String(4).toString)
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("multi-record stream: offsets, framing, skip of unknown headers, payload digest") {
    val blob = Multimodal.warcRecord("web", 7L, "hello world") ++
      Multimodal.warcRecord("web", 42L, "") ++               // empty payload
      Multimodal.warcRecord("web", 123L, "third doc body")
    val recs = parseStatic(blob)
    assert(recs.map(_._3) == Seq("http://web/7", "http://web/42", "http://web/123"))
    assert(recs.map(_._2).forall(_ == "response"))
    assert(recs.map(_._4) == Seq(11L, 0L, 14L))
    assert(recs.map(_._5) == Seq(md5Hex("hello world"), md5Hex(""), md5Hex("third doc body")))
    // offsets: exactly the shared-constant template arithmetic the oracle uses
    def rsz(docId: Long, source: String, text: String): Long =
      Multimodal.WarcFixedOverhead + 2 * docId.toString.length + source.length +
        text.getBytes("UTF-8").length.toString.length + text.getBytes("UTF-8").length
    assert(recs.map(_._1) == Seq(0L, rsz(7L, "web", "hello world"),
      rsz(7L, "web", "hello world") + rsz(42L, "web", "")))
    // and the constant really describes the builder's bytes (drift guard)
    assert(Multimodal.warcRecord("web", 7L, "hello world").length == rsz(7L, "web", "hello world"))
    assert(Multimodal.warcRecord("a", 1234L, "x" * 250).length == rsz(1234L, "a", "x" * 250))
  }

  test("payload bytes containing WARC/1.0 and CRLFs do not confuse the framing") {
    val tricky = "WARC/1.0\r\nContent-Length: 3\r\n\r\nfake\r\n\r\n"
    val blob = Multimodal.warcRecord("s", 1L, tricky) ++
      Multimodal.warcRecord("s", 2L, "after")
    val recs = parseStatic(blob)
    assert(recs.size == 2)
    assert(recs(1)._3 == "http://s/2" && recs(1)._5 == md5Hex("after"))
  }

  test("malformed regions end the parse with the records already framed, never throw") {
    val good = Multimodal.warcRecord("s", 1L, "ok")
    val cases = Seq(
      good ++ "HTTP/1.1 200 OK\r\n".getBytes("US-ASCII"),          // not a WARC version
      good ++ good.dropRight(6),                                    // truncated payload/separator
      good ++ "WARC/1.0\r\nNoColonHere\r\n\r\n\r\n\r\n".getBytes("US-ASCII"),
      good ++ "WARC/1.0\r\nContent-Length: -5\r\n\r\n\r\n\r\n".getBytes("US-ASCII"),
      good ++ "WARC/1.0\r\nContent-Length: 99999999999999999999\r\n\r\n".getBytes("US-ASCII"))
    cases.foreach { b =>
      val recs = parseStatic(b)
      assert(recs.size == 1 && recs.head._3 == "http://s/1", s"case of ${b.length} bytes")
    }
    assert(parseStatic(Array.emptyByteArray).isEmpty)
    val r = check(params, Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      parseStatic(bytes) != null
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("http_head: status line, case-insensitive headers, declared-vs-actual body") {
    import graft.functions.HttpHead
    def parseHttp(b: Array[Byte]): (Int, String, String, Long, Long, String) = {
      val r = HttpHead.parse(b)
      (r.getInt(0), r.getUTF8String(1).toString, r.getUTF8String(2).toString,
        r.getLong(3), r.getLong(4), r.getUTF8String(5).toString)
    }
    val ok = Multimodal.httpResponse(200, "OK", "text/plain", "body!".getBytes("UTF-8"))
    val got = parseHttp(ok)
    assert(got._1 == 200 && got._2 == "OK" && got._3 == "text/plain")
    assert(got._4 == 5L && got._6 == md5Hex("body!"))
    // body_offset: exactly the shared-constant arithmetic the oracle uses
    assert(got._5 == Multimodal.HttpFixedOverhead + "OK".length + "text/plain".length + 1)
    // and the constant describes the builder's actual bytes (drift guard)
    assert(ok.length == got._5 + 5)
    // case-insensitive header names, declared-vs-actual disagreement kept
    val weird = ("HTTP/1.1 404 Not Found\r\ncontent-TYPE: a/b\r\n" +
      "CONTENT-length: 999\r\nX-Skip: me\r\n\r\nactual").getBytes("US-ASCII")
    val w = parseHttp(weird)
    assert(w._1 == 404 && w._2 == "Not Found" && w._3 == "a/b")
    assert(w._4 == 999L && w._6 == md5Hex("actual")) // truncation signal: 999 declared, 6 actual
    // malformed -> unknown, never throws
    Seq("not http at all", "HTTP/1.1 2xx OK\r\n\r\n", "HTTP/1.1 200 OK\r\nNoColon\r\n\r\n",
      "HTTP/1.1 200 OK\r\nnever-terminated: yes").foreach { s =>
      assert(parseHttp(s.getBytes("US-ASCII"))._1 == -1, s)
    }
    assert(parseHttp(Array.emptyByteArray)._1 == -1)
  }

  test("warc_payloads + http_head chain: three layers recover the doc bodies") {
    import graft.functions.{HttpHead, WarcRecords => WR}
    val blob = Multimodal.warcRecordBytes("web", 2L,
        Multimodal.httpResponse(200, "OK", "text/html; charset=utf-8", "first".getBytes("UTF-8"))) ++
      Multimodal.warcRecordBytes("web", 11L,
        Multimodal.httpResponse(404, "Not Found", "text/plain", "second".getBytes("UTF-8")))
    val payloads = WR.parsePayloads(blob)
    assert(payloads.numElements() == 2)
    val h0 = HttpHead.parse(payloads.getBinary(0))
    val h1 = HttpHead.parse(payloads.getBinary(1))
    assert(h0.getInt(0) == 200 && h0.getUTF8String(5).toString == md5Hex("first"))
    assert(h1.getInt(0) == 404 && h1.getUTF8String(5).toString == md5Hex("second"))
    // payload framing equals the metadata walk's content lengths
    val metas = parseStatic(blob)
    assert(metas.map(_._4) == (0 until 2).map(i => payloads.getBinary(i).length.toLong))
  }

  test("gzip_members: multi-member inflation, checksum validation, bomb/garbage guards") {
    import graft.functions.GzipMembers
    val a = "first record body".getBytes("UTF-8")
    val b = ("x" * 10000).getBytes("UTF-8") // compresses hard: real inflation work
    val c = Array.emptyByteArray
    val blob = Multimodal.gzipMember(a) ++ Multimodal.gzipMember(b) ++ Multimodal.gzipMember(c)
    val got = GzipMembers.parse(blob)
    assert(got.numElements() == 3)
    assert(got.getBinary(0).toSeq == a.toSeq)
    assert(got.getBinary(1).toSeq == b.toSeq)
    assert(got.getBinary(2).isEmpty)

    // a flipped payload byte fails the CRC -> members BEFORE it survive
    val m2 = Multimodal.gzipMember(a)
    m2(12) = (m2(12) ^ 0x01).toByte // corrupt inside the deflate stream
    val partial = GzipMembers.parse(Multimodal.gzipMember(b) ++ m2)
    assert(partial.numElements() == 1 && partial.getBinary(0).toSeq == b.toSeq)

    // truncated trailer, garbage, empty: recovered prefix only, no throw
    assert(GzipMembers.parse(blob.dropRight(4)).numElements() == 2)
    assert(GzipMembers.parse("not gzip".getBytes("UTF-8")).numElements() == 0)
    assert(GzipMembers.parse(Array.emptyByteArray).numElements() == 0)

    // FNAME/FCOMMENT/FEXTRA headers skip correctly: hand-build a member
    // with FNAME set (java never writes one, so construct it)
    val plain = Multimodal.gzipMember(a)
    val withName = plain.take(3) ++ Array(0x08.toByte) ++ plain.slice(4, 10) ++
      ("doc.warc".getBytes("US-ASCII") :+ 0.toByte) ++ plain.drop(10)
    val named = GzipMembers.parse(withName)
    assert(named.numElements() == 1 && named.getBinary(0).toSeq == a.toSeq)
  }

  test("compressed chain end-to-end: .warc.gz members re-frame to the same records") {
    import graft.functions.{GzipMembers, WarcRecords => WR}
    val r1 = Multimodal.warcRecord("web", 3L, "compressed body one")
    val r2 = Multimodal.warcRecord("web", 35L, "compressed body two")
    val gz = Multimodal.gzipMember(r1) ++ Multimodal.gzipMember(r2)
    val members = GzipMembers.parse(gz)
    assert(members.numElements() == 2)
    val rec1 = WR.parse(members.getBinary(0)).getStruct(0, 5)
    val rec2 = WR.parse(members.getBinary(1)).getStruct(0, 5)
    assert(rec1.getUTF8String(2).toString == "http://web/3")
    assert(rec2.getUTF8String(2).toString == "http://web/35")
    assert(rec1.getUTF8String(4).toString == md5Hex("compressed body one"))
  }

  test("warcTable round trip through the DataFrame path (codegen): every doc framed once") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha", "en", "web", 5L),
      (32L, "beta doc", "en", "web", 8L),   // same bucket as 0
      (1L, "gamma", "en", "book", 5L),
      (5L, "delta text", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.warcTable(docs)
      .select(col("source"), col("bucket"),
        posexplode(WarcRecords.warc_records(col("data"))).as(Seq("rec_idx", "r")))
      .select(col("source"), col("bucket"), col("rec_idx"),
        col("r.target_uri").as("uri"), col("r.offset").as("off"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3), r.getLong(4)))
    assert(out.length == 4)
    // bucket 0 of web holds docs 0 and 32 in doc_id order with cumulative offsets
    val webB0 = out.filter(t => t._1 == "web" && t._2 == 0L).sortBy(_._3)
    assert(webB0.map(_._4).toSeq == Seq("http://web/0", "http://web/32"))
    assert(webB0.map(_._5).toSeq == Seq(0L,
      Multimodal.warcRecord("web", 0L, "alpha").length.toLong))
    assert(out.count(_._1 == "book") == 1)
  }
}
