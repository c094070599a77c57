package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  private def docsOf(rows: (Long, String, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
  }

  test("stats: token counts, stopwords, punctuation, quality score") {
    val df = TextAnalysis.stats(docsOf(
      (1L, "the quick fox", "en", "s"),
      (2L, "a b! c2 d", "en", "s")))
      .orderBy("doc_id").collect()

    val r1 = df(0)
    assert(r1.getAs[Long]("n_ws_tokens") == 3)
    assert(r1.getAs[Long]("n_bpe_tokens") == 3)
    assert(r1.getAs[Long]("token_chars") == 11) // "thequickfox"
    assert(r1.getAs[Long]("stopword_count") == 1)
    assert(r1.getAs[Long]("punct_count") == 0)
    assert(math.abs(r1.getAs[Double]("avg_token_len") - 11.0 / 3) < 1e-12)

    val r2 = df(1)
    assert(r2.getAs[Long]("n_ws_tokens") == 4)
    // BPE-ish: a | b | ! | c | 2 | d
    assert(r2.getAs[Long]("n_bpe_tokens") == 6)
    assert(r2.getAs[Long]("punct_count") == 1)
    assert(r2.getAs[Long]("stopword_count") == 1)
  }

  test("langId: marker argmax with alphabetical tiebreak") {
    val df = TextAnalysis.langId(docsOf(
      (1L, "the data row row", "en", "s"),     // en markers dominate
      (2L, "hash scan sort sort", "zh", "s"),  // zh markers dominate
      (3L, "nothing matches here", "fr", "s")  // all scores 0 -> first lang 'de'
    )).orderBy("doc_id").collect()
    assert(df.map(_.getAs[String]("pred_lang")).toSeq == Seq("en", "zh", "de"))
  }

  test("langConfusion aggregates (lang, pred_lang) counts") {
    val out = TextAnalysis.langConfusion(docsOf(
      (1L, "the data row", "en", "s"),
      (2L, "the data row", "en", "s"),
      (3L, "hash scan sort", "en", "s")))
      .orderBy("pred_lang").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("en", "en", 2L), ("en", "zh", 1L)))
  }

  test("fingerprint: equal token sequences collide, different ones do not") {
    val fps = TextAnalysis.fingerprint(docsOf(
      (1L, "alpha beta gamma", "en", "s"),
      (2L, "alpha beta gamma", "en", "s"),
      (3L, "gamma beta alpha", "en", "s")))
      .orderBy("doc_id").collect().map(_.getAs[Long]("fp"))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2)) // order-sensitive rolling hash
    assert(fps.forall(f => f >= 0 && f < TextAnalysis.FingerprintMod))
  }

  test("redact: emails and phone numbers replaced, clean text untouched") {
    val s2 = spark
    import s2.implicits._
    val out = Seq(
      "mail me at jane.doe+x@sub.example.org or call 555-123-4567 ok",
      "no pii here at all")
      .toDF("text")
      .select(graft.text.TextAnalysis.redact(org.apache.spark.sql.functions.col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> or call <PHONE> ok")
    assert(out(1) == "no pii here at all")
  }

  test("repetition: duplicate-word and top-bigram signals") {
    val s2 = spark
    import s2.implicits._
    val out = Seq(
      (1L, "a a a b"),             // 4 words, 2 distinct; top word a=3; bigrams: "a a"x2, "a b"
      (2L, "x y z w"))             // no repetition
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.repetition(out).orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n_words") == 4L && r1.getAs[Long]("n_distinct_words") == 2L)
    assert(r1.getAs[Double]("dup_word_frac") == 0.5)
    assert(r1.getAs[Long]("top_word_count") == 3L)
    assert(r1.getAs[Long]("n_bigrams") == 3L && r1.getAs[Long]("top_bigram_count") == 2L)
    val r2 = got(1)
    assert(r2.getAs[Double]("dup_word_frac") == 0.0)
    assert(r2.getAs[Long]("top_bigram_count") == 1L)
  }
}
