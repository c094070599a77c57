package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.CdcBoundaries

class CdcSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  /** Reference O(n·w) direct window sum — what the DuckDB oracle runs. */
  private def brute(text: String, w: Int, mask: Int): Seq[Int] = {
    val cps = text.codePoints().toArray
    val pow = Iterator.iterate(1L)(p => p * CdcBoundaries.Base % CdcBoundaries.Mod)
      .take(w).toArray
    (w to cps.length).filter { i =>
      val h = (0 until w).map(j => cps(i - 1 - j) * pow(j) % CdcBoundaries.Mod)
        .sum % CdcBoundaries.Mod
      h % mask == 0
    }
  }

  private def bounds(text: String, w: Int, mask: Int): Seq[Int] =
    docsOf((1L, text))
      .select(CdcBoundaries.cdc_boundaries(col("text"), w, mask).as("b"))
      .collect()(0).getSeq[Int](0).toList

  test("rolling boundaries equal the direct window-sum reference") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      (1 to 200).map(i => ('a' + i % 26).toChar).mkString,
      "unicode £→𝄞 mixed ascii and beyond the bmp plane here")
    for (t <- texts; mask <- Seq(4, 16)) {
      assert(bounds(t, 8, mask) == brute(t, 8, mask), s"text=$t mask=$mask")
    }
  }

  test("insertion shifts boundaries after the edit by exactly the insert length") {
    val prefix = "shared prefix material that stays identical across versions "
    val suffix = "and a long shared suffix that should resynchronize fully here"
    val (w, mask) = (8, 4)
    val b1 = bounds(prefix + suffix, w, mask)
    val b2 = bounds(prefix + "X" + suffix, w, mask)
    // every boundary strictly past the edit window re-appears shifted by 1
    val cut = prefix.length + w
    assert(b1.filter(_ > cut).map(_ + 1) == b2.filter(_ > cut + 1))
  }

  test("cdcChunks: chunks tile the document and hashes match substrings") {
    val text = "content defined chunking splits where the rolling hash says so"
    val rows = Dedup.cdcChunks(docsOf((7L, text)), w = 8, mask = 4)
      .orderBy("chunk_idx").collect()
    assert(rows.nonEmpty)
    // contiguous tiling: starts chain and lengths sum to the doc length
    var expectStart = 1L
    for (r <- rows) {
      assert(r.getAs[Long]("start_pos") == expectStart)
      expectStart += r.getAs[Long]("chunk_len")
    }
    assert(expectStart - 1 == text.length)
    // hashes are md5 of the corresponding substring
    val first = rows.head
    val sub = text.substring(0, first.getAs[Long]("chunk_len").toInt)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(first.getAs[String]("chunk_md5") == md)
  }

  test("cdcChunks: short docs yield one whole-doc chunk, empty docs none") {
    val rows = Dedup.cdcChunks(docsOf((1L, "tiny"), (2L, "")), w = 8, mask = 4)
      .collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("doc_id") == 1L && r.getAs[Long]("chunk_len") == 4L)
  }

  test("shared chunks survive an edit (the dedup property fixed strides lack)") {
    val prefix = "edit happens right here in the very first words "
    val suffix = "but the remainder of the document is long enough to " +
      "resynchronize and produce several identical chunks after the cut point"
    val c1 = Dedup.cdcChunks(docsOf((1L, prefix + suffix)), w = 8, mask = 4)
      .select("chunk_md5").collect().map(_.getString(0)).toSet
    val c2 = Dedup.cdcChunks(docsOf((1L, prefix + "XYZ " + suffix)), w = 8, mask = 4)
      .select("chunk_md5").collect().map(_.getString(0)).toSet
    // at least one full chunk hash is shared between the two versions
    assert((c1 intersect c2).nonEmpty)
  }
}
