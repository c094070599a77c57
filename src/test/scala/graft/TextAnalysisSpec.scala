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

  test("chunk: windows with overlap, boundary tails, short docs yield one chunk") {
    // 10 tokens, maxTokens=4, overlap=1 -> stride 3 -> ceil(9/3)=3 chunks
    val toks = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = TextAnalysis.chunk(
      docsOf((1L, toks, "en", "s"), (2L, "one", "en", "s")),
      maxTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
    val c1 = got.filter(_.getLong(0) == 1L)
    assert(c1.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(c1.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(4L, 4L, 4L))
    // single-token doc: one chunk, itself
    val c2 = got.filter(_.getLong(0) == 2L)
    assert(c2.length == 1 && c2.head.getAs[String]("chunk_text") == "one")
    // overlap tokens appear in consecutive chunks (t4, t7 above)
    intercept[IllegalArgumentException](
      TextAnalysis.chunk(docsOf((1L, "x", "en", "s")), maxTokens = 4, overlap = 4))
  }

  test("tfidf: per-doc top-k by tf*N/df with term tiebreak") {
    // 4 docs; "rare" only in doc 1 (df=1), "common" in all (df=4)
    val got = TextAnalysis.tfidf(docsOf(
      (1L, "rare common shared shared", "en", "s"),
      (2L, "common shared other words", "en", "s"),
      (3L, "common pick pick pick", "en", "s"),
      (4L, "common lone words here", "en", "s")), topK = 2)
      .orderBy("doc_id", "kw_rank").collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    // doc 1: rare tf=1 df=1 -> 4.0; shared tf=2 df=2 -> 4.0; tie -> "rare" < "shared"
    assert(d1.map(_.getAs[String]("term")).toSeq == Seq("rare", "shared"))
    assert(d1.map(_.getAs[Double]("score")).toSeq == Seq(4.0, 4.0))
    assert(d1.map(_.getAs[Long]("kw_rank")).toSeq == Seq(1L, 2L))
    // doc 3: pick tf=3 df=1 -> 12.0 tops; common tf=1 df=4 -> 1.0
    val d3 = got.filter(_.getLong(0) == 3L)
    assert(d3.head.getAs[String]("term") == "pick")
    assert(d3.head.getAs[Double]("score") == 12.0)
    // every doc emits exactly topK rows (all have >= 2 distinct terms)
    assert(got.groupBy(_.getLong(0)).forall(_._2.length == 2))
  }

  test("boilerplate: frequent k-grams flagged, short docs drop") {
    // "x y z" appears in docs 1..3 (minDocs=3 -> boilerplate);
    // every other 3-gram is unique to its doc
    val got = TextAnalysis.boilerplate(docsOf(
      (1L, "x y z a b", "en", "s"),   // grams: xyz yza zab -> 1 of 3 boiler
      (2L, "p x y z q", "en", "s"),   // pxy xyz yzq -> 1 of 3
      (3L, "x y z", "en", "s"),       // xyz -> 1 of 1
      (4L, "u v w t s", "en", "s"),   // none boiler
      (5L, "so short", "en", "s")),   // < 3 tokens -> dropped
      k = 3, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("n_grams") == 3L)
    assert(byId(1L).getAs[Long]("n_boiler") == 1L)
    assert(math.abs(byId(1L).getAs[Double]("boiler_frac") - 1.0 / 3) < 1e-15)
    assert(byId(3L).getAs[Double]("boiler_frac") == 1.0)
    assert(byId(4L).getAs[Long]("n_boiler") == 0L)
    assert(byId(4L).getAs[Double]("boiler_frac") == 0.0)
  }

  test("ngramVocab: top bigrams by tf with df, tie broken on the gram") {
    val got = TextAnalysis.ngramVocab(docsOf(
      (1L, "a b a b c", "en", "s"),   // bigrams: "a b" x2, "b a", "b c"
      (2L, "a b z", "en", "s"),       // "a b", "b z"
      (3L, "x", "en", "s")),          // too short: no bigrams
      n = 2, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // tf: "a b"=3; then "b a"/"b c"/"b z" tie at 1 → gram order keeps 2
    assert(got.toSeq == Seq(("a b", 3L, 2L), ("b a", 1L, 1L), ("b c", 1L, 1L)))
  }

  test("gopherQuality: verdict combines word-count, word-length, symbol, alpha gates") {
    val got = TextAnalysis.gopherQuality(docsOf(
      (1L, "solid sentence with several normal words here", "en", "s"), // passes
      (2L, "too short", "en", "s"),                      // < 5 words
      (3L, "a b c d e f g h", "en", "s"),                // mean len 1 < 3
      (4L, "### ... ### words mostly symbols here okay", "en", "s"), // symbol ratio
      (5L, "1 2 3 4 5 6 7 8 90 12", "en", "s")),         // alpha frac 0
      minMeanWordLen = 2.0)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("passes_gopher")).toSeq == Seq(1L, 0L, 0L, 0L, 0L))
    val r1 = got(0)
    assert(r1.getAs[Long]("n_words") == 7L)
    assert(r1.getAs[Double]("alpha_frac") == 1.0)
    assert(got(4).getAs[Double]("alpha_frac") == 0.0)
  }

  test("lmBits: hand-computed add-one floor-log2 bits; short docs drop") {
    val s = spark
    import s.implicits._
    // corpus: "a b" ×3, "a c" ×1, "x" ×1 → c1(a)=4, V=4 (a,b,c,x —
    // doc 5 has no bigrams but its token still counts in the vocab);
    // bigram counts: (a b)=3, (a c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"),
      (5L, "x")) // single token: no bigrams, must drop
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.lmBits(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1-3: bits = floor(log2(4+4)) - floor(log2(3+1)) = 3 - 2 = 1
    // doc 4:   bits = floor(log2(8)) - floor(log2(1+1)) = 3 - 1 = 2
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 2L)))
  }

  test("lmBits cross-corpus: OOV grams pay full add-one surprisal") {
    val s = spark
    import s.implicits._
    // train: "a b" ×3 → c1(a)=3, c1(b)=3, V=2, c12(a b)=3
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    // score doc 10: known bigram → bits(3+2)-bits(3+1) = 2-2 = 0
    // score doc 11: fully OOV → bits(0+2)-bits(0+1) = 1-0 = 1
    // score doc 12: known w1, unseen bigram → bits(5)-bits(1) = 2-0 = 2
    val score = Seq((10L, "a b"), (11L, "q r"), (12L, "a a")).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.lmBits(train, score)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((10L, 0L), (11L, 1L), (12L, 2L)))
  }

  test("cmsEstimates: exact when collision-free enough; always >= true; " +
      "width-1 degenerate counts everything") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "a c d")).toDF("doc_id", "text")
    // width 512, depth 4: 6 distinct tokens almost surely collision-free
    // in at least one row -> estimates exact
    val wide = graft.text.TextAnalysis.cmsEstimates(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = Map("a" -> 4L, "b" -> 2L, "c" -> 2L, "d" -> 1L)
    exact.foreach { case (t, c) =>
      val (tc, est) = wide(t)
      assert(tc == c && est >= tc, s"$t: true=$tc est=$est")
    }
    assert(wide("a")._2 == 4L) // 512 buckets, 6 keys: row-min is exact
    // width=1: every token collides into the one bucket -> est = N = 9
    val tiny = graft.text.TextAnalysis
      .cmsEstimates(docs, depth = 2, width = 1).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(tiny.forall(_._2 == 9L))
  }

  test("tokenEntropy: floor-log2 proxy — 0 for repeated token, bits(n) for " +
      "all-distinct, hand value in between") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a a a a"),      // one token: ent = 4*bits(4) - 4*bits(4) = 0
      (2L, "a b c d"),      // all distinct: 4*2 - 4*0 = 8, mean 2.0
      (3L, "a a b c"))      // 4*2 - (2*1 + 0 + 0) = 6, mean 1.5
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.tokenEntropy(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("ent_bits"),
        r.getAs[Double]("mean_bits"))).toSeq
    assert(got == Seq((1L, 4L, 1L, 0L, 0.0), (2L, 4L, 4L, 8L, 2.0),
      (3L, 4L, 3L, 6L, 1.5)))
  }

  test("lmBackoffBits: hand-computed tiers — seen trigram, bigram backoff, " +
      "add-one unigram incl. OOV; short docs drop") {
    val s = spark
    import s.implicits._
    // train: c1(a)=3 c1(b)=3 c1(c)=2 c1(d)=1, N=9, V=4;
    // c2: "a b"=3 "b c"=2 "b d"=1; c3: "a b c"=2 "a b d"=1
    val train = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b c"),   // tier 1: bits(c2["a b"]=3) - bits(c3=2) = 1-1 = 0
      (11L, "a b x"),   // tier 3 (OOV w): 4 + bits(9+4) - bits(0+1) = 4+3-0 = 7
      (12L, "x b c"),   // tier 2: 2 + bits(c1[b]=3) - bits(c2["b c"]=2) = 2+1-1 = 2
      (13L, "a b c d"), // "a b c"→0, "b c d"→tier 3: 4+bits(13)-bits(1+1)=6; mean 3.0
      (14L, "a b")      // < 3 tokens: no trigram positions, drops
    ).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.lmBackoffBits(train, score)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tri"),
        r.getAs[Long]("sum_bits"), r.getAs[Double]("mean_bits"))).toSeq
    assert(got == Seq((10L, 1L, 0L, 0.0), (11L, 1L, 7L, 7.0),
      (12L, 1L, 2L, 2.0), (13L, 2L, 6L, 3.0)))
  }

  test("lmBits: rare constructions score strictly higher than common ones") {
    val s = spark
    import s.implicits._
    val common = (1L to 20L).map(i => (i, "the quick brown fox jumps"))
    val rare = Seq((99L, "zyx wvu tsr qpo nml"))
    val got = graft.text.TextAnalysis.lmBits((common ++ rare).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("mean_bits")).toMap
    assert(got(99L) > got(1L))
  }

  test("bm25TopK: hand-computed fixed-point scores, rank order, k-boundary") {
    // N=4 docs, L=11 tokens; query terms cat (df=2) and dog (df=2):
    // idf4 = bitlen(5^4 div 2^4) - 1 = bitlen(39) - 1 = 5  [4*log2(2.5)=5.28]
    // tfnorm = (1e6*22*L*tf) div (10*L*tf + 3*L + 9*dl*N), hand-floored
    val docs = docsOf(
      (1L, "cat dog dog", "en", "s"),   // cat: 242000000/251 -> 964143
      (2L, "cat cat cat cat", "en", "s"), // dog: 484000000/361 -> 1340720
      (3L, "bird fish", "en", "s"),
      (4L, "dog mouse", "en", "s"))
    val all = TextAnalysis.bm25TopK(docs, Seq("cat", "dog"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(all.toSeq == Seq(
      (1L, 5L * 964143L + 5L * 1340720L, 2L),   // 11524315
      (2L, 5L * 1568881L, 1L),                  // 968000000/617, tf=4
      (4L, 5L * 1125581L, 1L)))                 // 242000000/215, tf=1
    // doc 3 has no query term -> absent entirely; k-boundary cuts by the
    // (score DESC, doc_id) total order
    assert(!all.map(_._1).contains(3L))
    val top2 = TextAnalysis.bm25TopK(docs, Seq("cat", "dog"), topK = 2)
      .collect().map(_.getLong(0))
    assert(top2.toSeq == Seq(1L, 2L))
    // the corpus-scale double mode (no int64 fixed point) must agree on
    // the document ranking and term counts, scores now textbook BM25
    val dbl = TextAnalysis.bm25TopK(docs, Seq("cat", "dog"), topK = 3,
      exactFixedPoint = false)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(dbl.toSeq == Seq((1L, 2L), (2L, 1L), (4L, 1L)))
  }

  test("heavyHitters: exactly the tokens over total/k, exact counts, no sketch error") {
    val s = spark
    import s.implicits._
    // 40 'hot' + 30 'warm' + 30 singletons = 100 tokens; k=3 → threshold
    // 33.33: hot qualifies (40*3 > 100), warm does not (30*3 = 90 < 100).
    // Spread across many rows/partitions so MG actually merges summaries.
    val rows = (Seq.fill(40)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 30).map(i => s"u$i")).grouped(5).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq
    val docs = rows.toDF("doc_id", "text").repartition(7)
    val got = graft.text.TextAnalysis.heavyHitters(docs, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("hot", 40L, 100L)))
  }

  test("heavyHitters: near-uniform adversarial stream still exact (candidates superset)") {
    val s = spark
    import s.implicits._
    // every token appears twice except one appearing 4 times; k = total/3
    // → only the 4x token clears 3; MG must not lose it on any partition split
    val toks = (1 to 48).flatMap(i => Seq(s"t$i", s"t$i")) ++ Seq.fill(4)("big")
    val docs = toks.grouped(4).zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }.toSeq.toDF("doc_id", "text")
      .repartition(5)
    val total = toks.size.toLong
    val k = 30 // threshold 100/30 = 3.33 → freq 4 qualifies, freq 2 does not
    val got = graft.text.TextAnalysis.heavyHitters(docs, k = k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("big", 4L, total)))
  }

  test("dsirScores ranks target-like raw docs above off-domain ones") {
    val target = docsOf(
      (1L, "spark data table join query", "en", "s"),
      (2L, "data table query plan spark", "en", "s"))
    val raw = docsOf(
      (10L, "spark data table join query", "de", "s"), // verbatim target text
      (11L, "zzz yyy xxx www vvv", "de", "s"))          // disjoint vocab
    val rows = TextAnalysis.dsirScores(target, raw, selectK = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(10L)._2 > byId(11L)._2, s"target-like doc must outscore: ${rows.toSeq}")
    assert(byId(10L)._3 == 1L && byId(11L)._3 == 0L)
  }

  test("dsirScores selects exactly min(selectK, raw size) and is deterministic") {
    val target = docsOf((1L, "alpha beta gamma", "en", "s"))
    val raw = docsOf((10 to 20).map(i =>
      (i.toLong, s"tok$i alpha beta word$i", "de", "s")): _*)
    def run() = TextAnalysis.dsirScores(target, raw, selectK = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val a = run()
    assert(a.map(_._4).sum == 4L)
    assert(a == run())
  }

  test("bigramLift: hand-computed PMI lift, minCount floor, rank order") {
    // corpus: "x y" occurs 3 times always together (perfect collocation),
    // "a b" occurs 3 times but a and b also occur apart (diluted)
    val docs = docsOf(
      (1L, "x y a b c", "en", "s"),
      (2L, "x y a c b", "en", "s"),
      (3L, "x y b a c", "en", "s"))
    val got = TextAnalysis.bigramLift(docs, minCount = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // only "x y" reaches count 3; every other bigram occurs once
    assert(got.map(t => (t._1, t._2)).toSeq == Seq(("x", "y")))
    val (c_ab, c_a, c_b) = (got(0)._3, got(0)._4, got(0)._5)
    assert((c_ab, c_a, c_b) == (3L, 3L, 3L))
    // nu = 15 unigrams, nb = 12 bigrams: lift = (3*15*15)/(12*3*3) = 6.25
    assert(got(0)._6 == (3.0 * 15 * 15) / (12.0 * 3 * 3))
  }

  test("bigramLift: topK boundary and deterministic tie order") {
    // two bigrams with identical counts -> identical lift; tie breaks on
    // (w1, w2) ascending, and topK = 1 keeps the lexicographically first
    val docs = docsOf(
      (1L, "p q", "en", "s"),
      (2L, "p q", "en", "s"),
      (3L, "m n", "en", "s"),
      (4L, "m n", "en", "s"))
    val all = TextAnalysis.bigramLift(docs, minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(all.toSeq == Seq(("m", "n"), ("p", "q")))
    val top1 = TextAnalysis.bigramLift(docs, minCount = 2, topK = 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(top1.toSeq == Seq(("m", "n")))
  }

  test("pplBuckets matches the value-threshold tercile definition exactly") {
    // a corpus with enough score spread: repeated fluent docs, one-off
    // weird docs, two languages, plus exact-tie docs that must share a
    // bucket whatever side of a cut they straddle
    val docs = docsOf(
      (1L, "the cat sat on the mat", "en", "s"),
      (2L, "the cat sat on the mat", "en", "s"),
      (3L, "the dog sat on the mat", "en", "s"),
      (4L, "zq xv jk qp wm zz", "en", "s"),
      (5L, "the cat ran to the dog", "en", "s"),
      (6L, "mat the on sat cat the", "en", "s"),
      (7L, "le chat est sur le tapis", "fr", "s"),
      (8L, "le chien est sur le tapis", "fr", "s"),
      (9L, "tapis le sur est chat le", "fr", "s"))
    val got = TextAnalysis.pplBuckets(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Double]("mean_bits"), r.getAs[String]("ppl_bucket")))
    // driver-side reference: per lang, c1/c2 = smallest score whose
    // cumulative count reaches 1/3 resp. 2/3 of docs; ties share buckets
    val ref = got.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val n = rows.length
      val byScore = rows.groupBy(_._3).toSeq.sortBy(_._1)
      val cum = byScore.scanLeft(0)(_ + _._2.length).tail
      val c1 = byScore(cum.indexWhere(_ * 3 >= n))._1
      val c2 = byScore(cum.indexWhere(_ * 3 >= n * 2))._1
      rows.toSeq.map(r => r._1 ->
        (if (r._3 <= c1) "head" else if (r._3 <= c2) "middle" else "tail"))
    }.toMap
    assert(got.map(r => r._1 -> r._4).toMap == ref)
    // identical docs (identical scores) always share a bucket
    val byDoc = got.map(r => r._1 -> r._4).toMap
    assert(byDoc(1L) == byDoc(2L))
    // every language has at least one head doc
    assert(Set("en", "fr").forall(l =>
      got.exists(r => r._2 == l && r._4 == "head")))
  }

  test("piiReport: per-source doc and match counts from the scrubber's patterns") {
    val got = TextAnalysis.piiReport(docsOf(
      (1L, "mail a@b.com and c@d.org", "en", "s1"), // two emails, one doc
      (2L, "call 555-123-4567 now", "en", "s1"),
      (3L, "clean text", "en", "s2")))
      .orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("docs_with_email"), r.getAs[Long]("docs_with_phone"),
        r.getAs[Long]("total_emails"), r.getAs[Long]("total_phones")))
    assert(got.toList == List(
      ("s1", 2L, 1L, 1L, 2L, 1L),
      ("s2", 1L, 0L, 0L, 0L, 0L)))
  }

  test("vocabOverlap: exact set cardinalities and Jaccard, other sources ignored") {
    val r = TextAnalysis.vocabOverlap(docsOf(
      (1L, "x y z", "en", "a"),
      (2L, "y z w", "en", "b"),
      (3L, "q q q", "en", "c")), // source c must not contribute
      "a", "b").collect().head
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_common") == 2L) // {y, z}
    assert(r.getAs[Double]("jaccard") == 2.0 / 4.0)
  }

  test("multiPatternHits: totals and distinct-pattern counts, clean docs dropped") {
    val got = TextAnalysis.multiPatternHits(docsOf(
      (1L, "the hash of a hash table", "en", "s"),   // hash x2, tab x1
      (2L, "a a a clean line", "en", "s"),           // "a a" overlaps -> 2
      (3L, "nothing flagged here", "en", "s")),
      Seq("hash", "tab", "a a"))
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("n_pats")))
    assert(got.toList == List((1L, 3L, 2L), (2L, 2L, 1L)))
  }

  test("chiSquareTokens: exact 2x2 contingency, all-doc tokens excluded") {
    // en docs carry aa, de docs carry dd, bb/cc are split evenly, zz is in
    // every doc (c+d = 0 -> excluded by the selective-power rule)
    val got = TextAnalysis.chiSquareTokens(docsOf(
      (1L, "aa bb zz", "en", "s"),
      (2L, "aa cc zz", "en", "s"),
      (3L, "bb dd zz", "de", "s"),
      (4L, "cc dd zz", "de", "s")), "en", minDf = 1, topK = 10)
      .collect().map(r => (r.getAs[String]("tok"), r.getAs[Long]("df_pos"),
        r.getAs[Long]("df_neg"), r.getAs[Double]("chi2")))
    // aa: (2,0,0,2) diff=4, chi2 = 4*16/(2*2*2*2) = 4; dd mirrors it;
    // bb/cc: (1,1,1,1) diff=0 -> chi2 0. Order: chi2 desc, tok asc.
    assert(got.toList == List(
      ("aa", 2L, 0L, 4.0), ("dd", 0L, 2L, 4.0),
      ("bb", 1L, 1L, 0.0), ("cc", 1L, 1L, 0.0)))
  }

  test("skipGramPairs: window-bounded ordered pairs with distance") {
    val got = TextAnalysis.skipGramPairs(docsOf(
      (1L, "a b c d", "en", "s"),
      (2L, "a b", "en", "s"),
      (3L, "x", "en", "s")), // single token: no pairs
      window = 2, minCount = 1)
      .orderBy("w1", "w2", "dist")
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("dist"), r.getAs[Long]("pairs")))
    assert(got.toList == List(
      ("a", "b", 1L, 2L), ("a", "c", 2L, 1L),
      ("b", "c", 1L, 1L), ("b", "d", 2L, 1L),
      ("c", "d", 1L, 1L)))
  }

  test("nbClassify: floor-log2 NB argmax and correctness flag") {
    val train = docsOf(
      (2L, "cat cat dog", "en", "s"),
      (4L, "chien chien chat", "fr", "s"))
    val test = docsOf(
      (1L, "cat dog", "en", "s"),
      (3L, "chien chat", "en", "s")) // looks fr -> misclassified
    val got = TextAnalysis.nbClassify(train, test)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("predicted"), r.getAs[Long]("score"),
        r.getAs[Long]("correct")))
    // doc1 en: bits(3)+bits(2) - 2*bits(259) + bits(1) = 2 - 16 = -14
    //      fr: bits(1)+bits(1) - 16 = -16  -> en, correct
    // doc3 symmetric -> fr at -14, en at -16 -> fr, incorrect
    assert(got.toList == List(
      (1L, "en", -14L, 1L), (3L, "fr", -14L, 0L)))
  }

  test("vocabCoverage: histogram-decomposed coverage with tie classes") {
    // counts a:4 b:2 c:1 d:1, total 8; 50% -> 1 entry covers 4;
    // 90% -> target 8, needs both singleton-count tokens: vocab 4
    val got = TextAnalysis.vocabCoverage(docsOf(
      (1L, "a a a a b", "en", "s"),
      (2L, "b c d", "en", "s")), thresholds = Seq(50, 90))
      .orderBy("pct").collect()
      .map(r => (r.getAs[Long]("pct"), r.getAs[Long]("vocab_size"),
        r.getAs[Long]("tokens_covered"), r.getAs[Long]("total_tokens")))
    assert(got.toSeq == Seq((50L, 1L, 4L, 8L), (90L, 4L, 8L, 8L)))
  }

  test("groupWords: integer log-odds keyness per group") {
    // s1: aa aa bb (t_g 3); s2: cc bb (t_g 2); vocab 3, t_all 5
    // score(s1,aa) = [bits(3)-bits(6)] - [bits(1)-bits(5)] = -1 + 2 = 1
    // score(s2,cc) = [bits(2)-bits(5)] - [bits(1)-bits(6)] = -1 + 2 = 1
    // bb scores 0 in both groups
    val got = TextAnalysis.groupWords(docsOf(
      (1L, "aa aa bb", "en", "s1"),
      (2L, "cc bb", "en", "s2")), "source", topK = 10)
      .orderBy("grp", "rk").collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("rk"),
        r.getAs[String]("tok"), r.getAs[Long]("c_g"), r.getAs[Long]("score")))
    assert(got.toSeq == Seq(
      ("s1", 1L, "aa", 2L, 1L), ("s1", 2L, "bb", 1L, 0L),
      ("s2", 1L, "cc", 1L, 1L), ("s2", 2L, "bb", 1L, 0L)))
  }

  test("nbEvaluate: per-class tp/fp/fn from the prediction pass") {
    val train = docsOf(
      (2L, "cat cat dog", "en", "s"),
      (4L, "chien chien chat", "fr", "s"))
    // doc1 -> en (true en: tp for en); doc3 -> fr (true en: fp for fr,
    // fn for en); no true fr docs in test
    val test = docsOf(
      (1L, "cat dog", "en", "s"),
      (3L, "chien chat", "en", "s"))
    val got = TextAnalysis.nbEvaluate(train, test)
      .orderBy("lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Long]("fn")))
    assert(got.toSeq == Seq(("en", 1L, 0L, 1L), ("fr", 0L, 1L, 0L)))
    val rows = TextAnalysis.nbEvaluate(train, test).orderBy("lang").collect()
    assert(rows(0).getAs[Double]("precision") == 1.0
      && rows(0).getAs[Double]("recall") == 0.5)
    // fr was predicted once (wrongly) but never true: recall is NULL
    assert(rows(1).getAs[Double]("precision") == 0.0
      && rows(1).isNullAt(rows(1).fieldIndex("recall")))
  }

  test("blocklistHits: token occurrences vs distinct types, word-boundary only") {
    val got = TextAnalysis.blocklistHits(docsOf(
      (1L, "spark spark merge ok", "en", "s"),
      (2L, "sparkle merger", "en", "s"), // substrings do NOT hit at word level
      (3L, "sort", "en", "s")),
      Seq("spark", "merge", "sort"))
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bad_tokens"), r.getAs[Long]("n_bad_types")))
    assert(got.toList == List((1L, 3L, 2L), (3L, 1L, 1L)))
  }

  test("sourceDiversity: Simpson exact pair probability, bits entropy, single-doc NULL") {
    val docs = docsOf(
      // mono: 3 docs one lang -> simpson 1, ent_bits 3*1 - 3*1 = 0
      (1L, "x", "en", "mono"), (2L, "x", "en", "mono"), (3L, "x", "en", "mono"),
      // bal: 2+2 across two langs -> simpson (2+2)/(4*3) = 1/3,
      // ent_bits = 4*2 - (2*1 + 2*1) = 4
      (4L, "x", "en", "bal"), (5L, "x", "en", "bal"),
      (6L, "x", "de", "bal"), (7L, "x", "de", "bal"),
      // solo: one doc -> 0/0 -> NULL simpson
      (8L, "x", "fr", "solo"))
    val got = TextAnalysis.sourceDiversity(docs).orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_langs"), r.getAs[Long]("ent_bits"),
        if (r.isNullAt(r.fieldIndex("simpson"))) None
        else Some(r.getAs[Double]("simpson"))))
    assert(got.toList == List(
      ("bal", 4L, 2L, 4L, Some(4.0 / 12.0)),
      ("mono", 3L, 1L, 0L, Some(1.0)),
      ("solo", 1L, 1L, 0L, None)))
  }

  test("chao1Richness: bias-corrected singleton/doubleton estimate") {
    // tokens a a b b c -> V=3, F1=1 (c), F2=2 (a,b) -> 3 + 1*0/(2*3) = 3.0
    val r1 = TextAnalysis.chao1Richness(docsOf((1L, "a a b b c", "en", "w")))
      .collect().head
    assert(r1.getAs[Long]("vocab") == 3L && r1.getAs[Long]("f1") == 1L
      && r1.getAs[Long]("f2") == 2L && r1.getAs[Double]("chao1") == 3.0)
    // tokens a b c c -> V=3, F1=2, F2=1 -> 3 + 2*1/(2*2) = 3.5
    val r2 = TextAnalysis.chao1Richness(docsOf((1L, "a b c c", "en", "w")))
      .collect().head
    assert(r2.getAs[Double]("chao1") == 3.5)
    // no doubletons: a b -> 2 + 2*1/(2*1) = 3.0 (bias correction keeps
    // the estimate finite where the classic F1^2/(2 F2) would divide by 0)
    val r3 = TextAnalysis.chao1Richness(docsOf((1L, "a b", "en", "w")))
      .collect().head
    assert(r3.getAs[Long]("f2") == 0L && r3.getAs[Double]("chao1") == 3.0)
  }
  test("goodTuring: frequency-of-frequencies, lead gap handling, unseen mass") {
    // unigram form — counts a:3 b:2 c:1 -> hist {1:1, 2:1, 3:1}, N=6, n1=1
    val got = TextAnalysis.goodTuring(docsOf(
      (1L, "a a a b b c", "en", "s")), n = 1).orderBy("r").collect()
    assert(got.map(_.getAs[Long]("r")).toSeq == Seq(1L, 2L, 3L))
    val r1 = got(0)
    assert(r1.getAs[Long]("n_r") == 1L && r1.getAs[Long]("n_r1") == 1L)
    assert(r1.getAs[Double]("r_star") == 2.0) // (1+1)*1/1
    assert(r1.getAs[Double]("p0") == 1.0 / 6.0)
    assert(got(1).getAs[Double]("r_star") == 3.0) // (2+1)*1/1
    assert(got(2).getAs[Long]("n_r1") == 0L
      && got(2).getAs[Double]("r_star") == 0.0, "absent n_{r+1} is raw 0")

    // count classes with a GAP: x:4 y:1 -> lead lands on r=4, NOT r=2,
    // so n_r1 at r=1 must be 0 — the lead/adjacency distinction
    val gap = TextAnalysis.goodTuring(docsOf(
      (1L, "x x x x y", "en", "s")), n = 1).orderBy("r").collect()
    assert(gap.map(_.getAs[Long]("r")).toSeq == Seq(1L, 4L))
    assert(gap(0).getAs[Long]("n_r1") == 0L
      && gap(0).getAs[Double]("r_star") == 0.0)
    assert(gap(0).getAs[Double]("p0") == 0.2)

    // maxR truncates the report, not the totals: p0 still reads ALL mass
    val cut = TextAnalysis.goodTuring(docsOf(
      (1L, "x x x x y", "en", "s")), n = 1, maxR = 1).collect()
    assert(cut.length == 1 && cut(0).getAs[Double]("p0") == 0.2)

    // trigram default: "a b a b a" -> {"a b a":2, "b a b":1}; docs
    // shorter than the gram order contribute nothing
    val tri = TextAnalysis.goodTuring(docsOf(
      (1L, "a b a b a", "en", "s"),
      (2L, "a b", "en", "s"))).orderBy("r").collect()
    assert(tri.map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_r"))).toSeq
      == Seq((1L, 1L), (2L, 1L)))
    assert(tri(0).getAs[Double]("r_star") == 2.0) // (1+1)*1/1
    assert(tri(0).getAs[Double]("p0") == 1.0 / 3.0)
  }

  test("zipfSlope: hand-computed floor-log2 staircase OLS") {
    // freqs 8,4,2,1 -> ranks 1..4: x = bits(rank) = 0,1,1,2 and
    // y = bits(freq) = 3,2,1,0; OLS: den = 4*6-16 = 8,
    // num = 4*3-4*6 = -12 -> slope -1.5
    val text = (Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++
      Seq.fill(2)("w3") ++ Seq("w4")).mkString(" ")
    val got = TextAnalysis.zipfSlope(docsOf((1L, text, "en", "s"))).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n") == 4L)
    assert(got(0).getAs[Double]("slope") == -1.5)

    // a single-type source has zero x-variance -> NULL slope, and the
    // topK cap bounds the fit window
    val one = TextAnalysis.zipfSlope(docsOf((1L, "only only", "en", "s")))
      .collect()
    assert(one(0).getAs[Long]("n") == 1L
      && one(0).isNullAt(one(0).fieldIndex("slope")))
    val capped = TextAnalysis.zipfSlope(
      docsOf((1L, text, "en", "s")), topK = 2).collect()
    assert(capped(0).getAs[Long]("n") == 2L)
    intercept[IllegalArgumentException] {
      TextAnalysis.zipfSlope(docsOf((1L, "a", "en", "s")), topK = 1)
    }
  }
  test("unicodeAudit: per-lang NFC and strip counts over the decomposed prefix") {
    // prefix "Cafe"+U+0301+" " is 6 codepoints raw, 5 after NFC; ASCII
    // doc bodies are normalization-fixed, so per doc: raw = 6 + len,
    // nfc = 5 + len, every doc changed by NFC and again by stripping
    val got = TextAnalysis.unicodeAudit(docsOf(
      (1L, "abc", "en", "s"),
      (2L, "de", "en", "s"),
      (3L, "xyzw", "fr", "s"))).orderBy("lang").collect()
    val en = got(0)
    assert(en.getAs[Long]("n_docs") == 2L)
    assert(en.getAs[Long]("raw_chars") == (6 + 3) + (6 + 2))
    assert(en.getAs[Long]("nfc_chars") == (5 + 3) + (5 + 2))
    assert(en.getAs[Long]("changed_nfc") == 2L
      && en.getAs[Long]("changed_strip") == 2L)
    assert(en.getAs[String]("nfc_head") == "Café abc"
      && en.getAs[String]("strip_head") == "Cafe abc")
    val fr = got(1)
    assert(fr.getAs[String]("nfc_head") == "Café xyz")

    // empty prefix: a pure-ASCII corpus is a fixed point — zero changes
    val asIs = TextAnalysis.unicodeAudit(
      docsOf((1L, "plain", "en", "s")), decomposedPrefix = "").collect()
    assert(asIs(0).getAs[Long]("changed_nfc") == 0L
      && asIs(0).getAs[Long]("changed_strip") == 0L
      && asIs(0).getAs[Long]("raw_chars")
        == asIs(0).getAs[Long]("nfc_chars"))
  }
  test("paddingWaste: band edges, exact waste, fraction") {
    // lengths 3, 4, 5 with bandWidth 4: band 0 holds {3} (upper 4,
    // waste 1), band 1 holds {4, 5} (upper 8, padded 16, waste 7)
    val got = TextAnalysis.paddingWaste(docsOf(
      (1L, "a b c", "en", "s"),
      (2L, "a b c d", "en", "s"),
      (3L, "a b c d e", "en", "s")), bandWidth = 4L)
      .orderBy("band").collect()
    assert(got.length == 2)
    val b0 = got(0)
    assert(b0.getAs[Long]("band") == 0L && b0.getAs[Long]("docs") == 1L)
    assert(b0.getAs[Long]("band_upper") == 4L && b0.getAs[Long]("waste") == 1L)
    assert(b0.getAs[Double]("waste_frac") == 0.25)
    val b1 = got(1)
    assert(b1.getAs[Long]("docs") == 2L && b1.getAs[Long]("tokens") == 9L)
    assert(b1.getAs[Long]("padded") == 16L && b1.getAs[Long]("waste") == 7L)
    assert(b1.getAs[Double]("waste_frac") == 7.0 / 16.0)
  }
  test("tokenizerFertility: hand-computed per-lang subword and compression rates") {
    // "ab1 cd": ws 2; bpe segments ab|1, cd -> 3; chars 5
    // "x!" : ws 1; bpe x|! -> 2; chars 2
    val got = TextAnalysis.tokenizerFertility(docsOf(
      (1L, "ab1 cd", "en", "s"),
      (2L, "x!", "fr", "s"))).orderBy("lang").collect()
    val en = got(0)
    assert(en.getAs[Long]("ws_tokens") == 2L
      && en.getAs[Long]("bpe_tokens") == 3L
      && en.getAs[Long]("chars") == 5L)
    assert(en.getAs[Double]("fertility") == 1.5
      && en.getAs[Double]("chars_per_token") == 5.0 / 3.0)
    val fr = got(1)
    assert(fr.getAs[Double]("fertility") == 2.0
      && fr.getAs[Double]("chars_per_token") == 1.0)
  }
}
