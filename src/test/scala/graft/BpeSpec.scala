package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeSpec extends SparkSpec {

  test("bpe_encode_word native expression == declarative applyMerge chain") {
    // BpeEncodeWord replaced the chained aggregate-HOF applyMerge folds
    // (r18): pin against an inline declarative replay on words that
    // exercise greedy non-overlap ("aaa"), chained merges (t+h, th+e),
    // repeats, unicode code points, and the empty word
    val s = spark
    import s.implicits._
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "a", "e" -> "r")
    def declApply(syms: org.apache.spark.sql.Column, a: String, b: String) =
      aggregate(syms, array().cast("array<string>"), (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, size(acc)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))
    val words = Seq("the", "ther", "aaa", "aaaa", "thethe", "x", "",
      "añot", "βthe", "tha", "eee").toDF("w")
    val decl = merges.foldLeft(
      words.withColumn("syms", filter(split(col("w"), ""), x => x =!= ""))) {
      case (v, (a, b)) => v.withColumn("syms", declApply(col("syms"), a, b))
    }.select(col("w"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val nat = words.select(col("w"),
      graft.functions.BpeEncodeWord.bpe_encode_word(col("w"), merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    decl.keys.foreach { w =>
      assert(nat(w) == decl(w), s"word '$w' segmentation mismatch")
    }
  }


  private def docsOf(rows: (Long, String, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
  }

  // the Sennrich walkthrough corpus: low×5 lower×2 newest×6 widest×3
  private def sennrich = docsOf(
    (1L, Seq.fill(5)("low").mkString(" "), "en", "s"),
    (2L, Seq.fill(2)("lower").mkString(" "), "en", "s"),
    (3L, Seq.fill(6)("newest").mkString(" "), "en", "s"),
    (4L, Seq.fill(3)("widest").mkString(" "), "en", "s"))

  test("pairCounts: overlapping pairs, word-frequency weighting, ordering") {
    val out = Bpe.pairCounts(docsOf(
      (1L, "aaa aaa bb", "en", "s")), topK = 10).collect()
    // "aaa"×2 contributes pair "aa" twice per occurrence -> 4; "bb" once
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("aa", 4L), ("bb", 1L)))
  }

  test("pairCounts: the Sennrich corpus ranks (e,s)/(s,t) at 9 with lexicographic tie") {
    val top = Bpe.pairCounts(sennrich, topK = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("es", 9L), ("st", 9L), ("we", 8L), ("lo", 7L)))
  }

  test("train: merge sequence es, est, lo, low on the Sennrich corpus") {
    val (merges, seg) = Bpe.train(sennrich, numMerges = 4)
    assert(merges.map(_.merged) == Seq("es", "est", "lo", "low"))
    assert(merges.map(_.n) == Seq(9L, 9L, 7L, 7L))
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val segs = seg.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(segs("low") == List("low"))
    assert(segs("lower") == List("low", "e", "r"))
    assert(segs("newest") == List("n", "e", "w", "est"))
    assert(segs("widest") == List("w", "i", "d", "est"))
  }

  test("train: mergeBatch > 1 preserves the Sennrich walkthrough (prefix-disjoint acceptance)") {
    // round 1's frozen ranking is es(9), st(9), ... — st shares 's' with
    // es, so the batch cuts BEFORE it and the created 'est' pair gets
    // re-ranked next round, exactly as sequential training would
    val (merges, seg) = Bpe.train(sennrich, numMerges = 4, mergeBatch = 4)
    assert(merges.map(_.merged) == Seq("es", "est", "lo", "low"))
    assert(merges.map(_.n) == Seq(9L, 9L, 7L, 7L))
    assert(merges.map(_.rank) == Seq(1, 2, 3, 4))
    val segs = seg.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(segs("lower") == List("low", "e", "r"))
    assert(segs("newest") == List("n", "e", "w", "est"))
  }

  test("train: a disjoint batch applies in one round identically to sequential") {
    // two unrelated high-count pairs: batched and sequential agree on
    // both the merge list and the final segmentation
    val corpus = docsOf(
      (1L, Seq.fill(9)("ab").mkString(" "), "en", "s"),
      (2L, Seq.fill(7)("cd").mkString(" "), "en", "s"),
      (3L, Seq.fill(2)("abcd").mkString(" "), "en", "s"))
    val (seqM, seqSeg) = Bpe.train(corpus, numMerges = 2)
    val (batM, batSeg) = Bpe.train(corpus, numMerges = 2, mergeBatch = 2)
    assert(batM == seqM)
    val f = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(f(batSeg) == f(seqSeg))
    assert(f(batSeg)("abcd") == List("ab", "cd"))
  }

  test("train: greedy left-to-right non-overlapping merge (aaa -> [aa, a])") {
    val (merges, seg) = Bpe.train(docsOf((1L, "aaa", "en", "s")), numMerges = 1)
    assert(merges.map(_.merged) == Seq("aa"))
    val syms = seg.collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(syms("aaa") == List("aa", "a"))
  }

  test("encode: rank-ordered merge application, doc-order reassembly, counts") {
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "n", "an" -> "d")
    val out = Bpe.encode(docsOf(
      (1L, "the and then x", "en", "s"),
      (2L, "thx", "en", "s")), merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_subwords"), r.getString(3)))
    // the -> [the]; and -> [and]; then -> th+e? no: t+h -> [th,e,n], th+e
    // -> [the,n]; x stays [x]
    assert(out(0) == ((1L, 4L, 5L, "the and the n x")))
    assert(out(1) == ((2L, 1L, 2L, "th x")))
  }

  test("encode: applying train's own merges matches train's segmentation") {
    val (merges, seg) = Bpe.train(sennrich, numMerges = 4)
    val enc = Bpe.encode(sennrich, merges.map(m => m.left -> m.right))
      .orderBy("doc_id").collect()
    // doc 3 = "newest"×6; train after 4 merges segments newest as
    // [n,e,w,est] (es then est are the first two merges)
    val newest = seg.collect().map(r => r.getString(0) -> r.getSeq[String](2))
      .toMap.apply("newest")
    val d3 = enc(2)
    assert(d3.getString(3) == Seq.fill(6)(newest.mkString(" ")).mkString(" "))
    assert(d3.getAs[Long]("n_subwords") == 6L * newest.size)
  }

  test("train: stops early when no pairs remain") {
    val (merges, _) = Bpe.train(docsOf((1L, "ab ab", "en", "s")), numMerges = 5)
    // after merging (a,b) every word is a single symbol — no further pairs
    assert(merges.map(_.merged) == Seq("ab"))
  }
}
