package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

import graft.functions.HtmlText
import graft.multimodal.Multimodal

class HtmlTextSpec extends SparkSpec {

  private val params = Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(55L))

  private def parse(html: String): (String, String, Int) = {
    val r = HtmlText.parse(html.getBytes("UTF-8"))
    (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getInt(2))
  }

  test("template page: title captured, script/style skipped, escapes decoded, tags counted") {
    val (title, body, nTags) = parse(new String(
      Multimodal.htmlPage(7L, "a < b & c > 'd' \"e\""), "UTF-8"))
    assert(title == "Doc 7")
    assert(body == "a < b & c > 'd' \"e\"")
    assert(nTags == Multimodal.HtmlTemplateTags)
  }

  test("entities: named, decimal, hex, unknown/unterminated pass through literally") {
    assert(parse("<p>&amp;&lt;&gt;&quot;&apos;</p>")._2 == "&<>\"'")
    assert(parse("<p>&#65;&#x42;&#x1F600;</p>")._2 == "AB😀")
    assert(parse("<p>&bogus; &amp no-semi &toolongentityname;</p>")._2 ==
      "&bogus; &amp no-semi &toolongentityname;")
    assert(parse("<p>&#zzz;&#;&#x110000;</p>")._2 == "&#zzz;&#;&#x110000;")
    // surrogate references must NOT decode (CESU-style bytes would be
    // malformed UTF-8); they pass through literally like other invalids,
    // and the output stays valid UTF-8 end to end
    val surr = parse("<p>&#xD800;&#xDFFF;&#55296;ok</p>")._2
    assert(surr == "&#xD800;&#xDFFF;&#55296;ok")
    assert(new String(surr.getBytes("UTF-8"), "UTF-8") == surr)
  }

  test("comments, quoted '>' in attributes, case-insensitive raw-text elements") {
    assert(parse("a<!-- <p>not text</p> -->b")._2 == "ab")
    assert(parse("""x<a href="q>r" title='s>t'>y</a>z""")._2 == "xyz")
    assert(parse("<SCRIPT>if (a<b) { run(); }</ScRiPt>after")._2 == "after")
    assert(parse("<style>p>span { x }</STYLE>tail")._2 == "tail")
    // <titlex> is NOT a title tag; its content is body text
    assert(parse("<titlex>body words</titlex>")._2 == "body words")
  }

  test("hostile input never throws: unterminated everything, garbage bytes") {
    Seq("<p unclosed", "<!-- never closed", "<script>while(true){}",
      "<title>swallows the rest", "plain & text <", "&#x7fffffffffff;").foreach { s =>
      parse(s) // must not throw
    }
    val r = check(params, Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      HtmlText.parse(bytes) != null
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("escape/unescape round trip on arbitrary unicode text (the gate's property)") {
    val r = check(params, Prop.forAll(Gen.asciiPrintableStr, Gen.alphaStr) { (a, b) =>
      val text = a + "§ü—" + b
      parse(new String(Multimodal.htmlPage(1L, text), "UTF-8"))._2 == text
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("five-layer chain statically: gzip -> warc -> http -> html recovers the text") {
    import graft.functions.{GzipMembers, HttpHead, WarcRecords => WR}
    val text = "the <quick> & 'brown' fox"
    val blob = Multimodal.gzipMember(
      Multimodal.warcRecordBytes("web", 4L,
        Multimodal.httpResponse(200, "OK", "text/html; charset=utf-8",
          Multimodal.htmlPage(4L, text))))
    val member = GzipMembers.parse(blob).getBinary(0)
    val http = WR.parsePayloads(member).getBinary(0)
    val head = HttpHead.parse(http)
    assert(head.getInt(0) == 200)
    val body = java.util.Arrays.copyOfRange(http, head.getLong(4).toInt, http.length)
    val t = HtmlText.parse(body)
    assert(t.getUTF8String(0).toString == "Doc 4")
    assert(t.getUTF8String(1).toString == text)
    assert(t.getInt(2) == Multimodal.HtmlTemplateTags)
  }
}
