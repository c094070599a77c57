package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("incrementalFlags: exact and near dups flagged against the corpus only") {
    val corpus = docsOf((1L, base), (2L, "one two three four five six seven"))
    val increment = docsOf(
      (10L, base),                         // exact dup of corpus 1
      (11L, base + " lambda"),             // near-dup of corpus 1
      (12L, "entirely different words here x y z"), // clean
      (13L, base))                         // exact (and near) dup of corpus 1
    val out = Dedup.incrementalFlags(corpus, increment, k = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (10L, 1L, 1L),  // exact implies shingle-identical -> near too
      (11L, 0L, 1L),
      (12L, 0L, 0L),
      (13L, 1L, 1L)))
    // increment-vs-increment pairs are NOT consulted: 10 and 13 duplicate
    // each other but only their corpus match flags them; a doc duplicated
    // only WITHIN the increment stays clean here (that is exactDedup's job)
    val intraOnly = Dedup.incrementalFlags(
      corpus, docsOf((20L, "p q r s t u v"), (21L, "p q r s t u v")))
    assert(intraOnly.agg(sum(col("exact_dup")), sum(col("near_dup")))
      .collect().head.toSeq == Seq(0L, 0L))
  }

  test("shingles: distinct word 3-grams; short docs yield empty") {
    val out = docsOf((1L, "a b c d"), (2L, "x y"))
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](1).isEmpty)
  }

  test("exactGroups/exactDedup: identical texts collapse to min doc_id") {
    val docs = docsOf((1L, base), (2L, base), (3L, "other text entirely"))
    val groups = Dedup.exactGroups(docs).orderBy("canonical_id").collect()
    assert(groups.map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_count"))).toSeq ==
      Seq((1L, 2L), (3L, 1L)))
    assert(Dedup.exactDedup(docs).select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("ingestDedup drops replayed messages by uniqueness key") {
    val sd = streamDataOf(
      msg("s", 0, 1000, 0), msg("s", 0, 1000, 1), msg("s", 0, 2000, 0))
    val replayed = sd.unionByName(sd.limit(2))
    assert(replayed.count() == 5)
    assert(Dedup.ingestDedup(replayed).count() == 3)
  }

  test("ngramJaccardPairs finds planted near-dup, not unrelated docs") {
    val nearDup = base.replace("epsilon", "EPSILON") // 1-word edit
    val docs = docsOf((1L, base), (2L, nearDup),
      (3L, "one two three four five six seven eight nine ten"))
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.1).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert((p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b")) == (1L, 2L))
    // 8 shingles each, 3 contain the edited word => inter=5, union=11
    assert(p.getAs[Long]("inter") == 5L)
    assert(p.getAs[Long]("union_size") == 11L)
    assert(math.abs(p.getAs[Double]("jaccard") - 5.0 / 11) < 1e-12)
  }

  test("ngramJaccardPairs: maxDocFrequency drops ubiquitous shingles") {
    // 'x y z' appears in every doc; with the cap it stops linking docs
    val docs = docsOf(
      (1L, "x y z unrelated alpha beta"),
      (2L, "x y z other gamma delta"),
      (3L, "x y z more epsilon zeta"))
    val without = Dedup.ngramJaccardPairs(docs, threshold = 0.01)
    assert(without.count() == 3) // all pairs linked by the shared shingle
    val withCap = Dedup.ngramJaccardPairs(docs, threshold = 0.01,
      maxDocFrequency = Some(2))
    assert(withCap.count() == 0)
  }

  test("minhashLshPairs surfaces the near-dup pair with high estimated sim") {
    // one appended word: Jaccard 8/9 — deterministically shares 2 of 4
    // bands under the md5 hash family (verified against the oracle math)
    val docs = docsOf(
      (1L, base), (2L, base + " lambda"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "eleven twelve thirteen fourteen fifteen sixteen seventeen"))
    val pairs = Dedup.minhashLshPairs(docs).collect()
    assert(pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("est_sim") >= 0.5)
  }

  test("simhash: identical docs equal; near-dups within small hamming distance") {
    val docs = docsOf((1L, base), (2L, base),
      (3L, base.replace("epsilon", "EPSILON")),
      (4L, "one two three four five six seven eight nine ten"))
    val fp = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <= 8)   // 1-word edit
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(4L)) > 8)    // unrelated
  }

  test("simhashPairs: identical docs pair at hamming 0") {
    val docs = docsOf((1L, base), (2L, base),
      (4L, "one two three four five six seven eight nine ten"))
    val out = Dedup.simhashPairs(docs, maxHamming = 0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L, 0L)))
  }

  test("dupClusters: transitive pairs collapse to min-id components, singletons canonical") {
    val s = spark
    import s.implicits._
    val docs = (0L until 8L).toDF("doc_id")
    // component {0,1,2,3} via a chain (transitivity required), {5,6}, and
    // singletons 4, 7
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      0L -> (0L, 1L), 1L -> (0L, 0L), 2L -> (0L, 0L), 3L -> (0L, 0L),
      4L -> (4L, 1L), 5L -> (5L, 1L), 6L -> (5L, 0L), 7L -> (7L, 1L)))
    // exactly one canonical doc per cluster
    assert(got.values.count(_._2 == 1L) == 4)
    // the >threshold DISTRIBUTED star-contraction path (forced via
    // localThreshold = 0) must produce the identical labeling
    val dist = Dedup.dupClusters(docs, pairs, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dist == got)
  }

  test("simhashPairs multi-probe: recall 1.0 vs exact all-pairs Hamming when maxHamming < rotations") {
    // varied corpus: singleton word edits produce fingerprints whose
    // differing bits land in arbitrary blocks — including the top block a
    // single-rotation plan is blind to
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")
    val docs = docsOf((0 until 40).map { i =>
      val mutated = words.updated(i % words.length, s"w$i").mkString(" ")
      (i.toLong, if (i % 3 == 0) base else mutated)
    }: _*)
    val fp = Dedup.simhash(docs)
    val exact = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val blocked = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty) // the corpus must actually exercise the path
    assert(blocked == exact) // pigeonhole: no pair within distance 3 is missed
  }

  test("canonicalByQuality: longest cluster member survives, singletons canonical") {
    val s = spark
    import s.implicits._
    val docs = docsOf(
      (1L, base),                  // cluster {1,2,3}: 2 is the longest
      (2L, base + " lambda mu"),
      (3L, base + " nu"),
      (9L, "standalone words only here"))
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.canonicalByQuality(docs, Dedup.dupClusters(docs, pairs))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 1L, 0L),
      (2L, 1L, 1L),  // longest member of cluster 1, not the min id
      (3L, 1L, 0L),
      (9L, 9L, 1L))) // singleton keeps itself
  }

  test("dupSpans: shared 5-gram runs merge into maximal spans; unique docs absent") {
    // docs 1 and 2 share tokens 'c d e f g h i' — a 7-token duplicated
    // region = three overlapping 5-grams at positions 2,3,4 (doc 1) and
    // 0,1,2 (doc 2) that must merge into ONE span each
    val d1 = "a b c d e f g h i x y"
    val d2 = "c d e f g h i q r s t"
    val docs = docsOf((1L, d1), (2L, d2),
      (3L, "totally unrelated words nothing shared here at all"))
    val got = Dedup.dupSpans(docs, n = 5)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 2L, 8L, 7L),   // tokens c..i at offsets 2..8
      (2L, 0L, 6L, 7L)))  // tokens c..i at offsets 0..6
  }

  test("dupSpans: two disjoint duplicated regions stay two spans") {
    // shared run 1: tokens p q r s t (positions 0..4 in both);
    // shared run 2: u v w x y — separated by unique middles wider than n
    val docs = docsOf(
      (1L, "p q r s t m1 m2 m3 m4 m5 m6 u v w x y"),
      (2L, "p q r s t k1 k2 k3 k4 k5 k6 u v w x y"))
    val got = Dedup.dupSpans(docs, n = 5)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 4L, 5L), (1L, 11L, 15L, 5L),
      (2L, 0L, 4L, 5L), (2L, 11L, 15L, 5L)))
  }

  private def segRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("fuzzyContamination: exact overlap on LSH candidates, bipartite only") {
    val bench = docsOf((1L, base), (2L, "one two three four five six seven"))
    val corpus = docsOf(
      (10L, base),                                   // identical to bench 1
      (11L, base + " lambda mu"),                    // near-dup of bench 1
      (12L, "entirely different words here x y z"),  // clean
      (13L, "one two three four five six seven"))    // identical to bench 2
    val out = Dedup.fuzzyContamination(corpus, bench)
      .orderBy("doc_id", "bench_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // identical docs MUST be candidates (every band collides) with
    // overlap exactly 1.0; the clean doc must not appear
    assert(out.map(t => (t._1, t._2)).contains((10L, 1L)))
    assert(out.map(t => (t._1, t._2)).contains((13L, 2L)))
    assert(!out.map(_._1).contains(12L))
    out.filter(t => t._1 == 10L || t._1 == 13L).foreach(t => assert(t._4 == 1.0))
    // the near-dup, when banding surfaces it, carries its TRUE containment
    // (8 of 10 shingles of doc 11 are in bench 1), never an estimate
    out.filter(_._1 == 11L).foreach { t =>
      assert(t._2 == 1L && t._3 == 8L && t._4 == 0.8)
    }
    // corpus-vs-corpus pairs are never reported (10 and 13 both duplicate
    // bench docs, not each other; no (corpus, corpus) row can exist by
    // construction — every bench_id is a benchmark doc)
    assert(out.forall(t => Set(1L, 2L).contains(t._2)))
  }

  test("segmentDedup keeps globally-first segments and reassembles in order") {
    // 2-token segments: doc 1 [a b][c d], doc 2 [a b][x y], doc 3 [c d][a b]
    // first occurrences: "a b"→(1,0), "c d"→(1,1), "x y"→(2,1)
    val docs = docsOf((1L, "a b c d"), (2L, "a b x y"), (3L, "c d a b"))
    assert(segRows(Dedup.segmentDedup(docs, segTokens = 2)) == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 2L, 0L, "")))
  }

  test("segmentDedup dropEmptied removes fully-deduplicated docs only") {
    // doc 3 empties (both segments first occurred in doc 1); doc 2 keeps
    // one segment and must survive
    val docs = docsOf((1L, "a b c d"), (2L, "a b x y"), (3L, "c d a b"))
    assert(segRows(Dedup.segmentDedup(docs, segTokens = 2, dropEmptied = true)) == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y")))
  }

  test("segmentDedup collapses repeats WITHIN one document too") {
    // [a b][a b][c]: the second window repeats the first inside the doc
    val docs = docsOf((1L, "a b a b c"))
    assert(segRows(Dedup.segmentDedup(docs, segTokens = 2)) == Seq(
      (1L, 3L, 2L, "a b c")))
  }

  test("segmentDedup: short docs are a single segment; distinct docs untouched") {
    val docs = docsOf((1L, "only three tokens"), (2L, "a different doc"))
    assert(segRows(Dedup.segmentDedup(docs, segTokens = 10)) == Seq(
      (1L, 1L, 1L, "only three tokens"),
      (2L, 1L, 1L, "a different doc")))
  }

  private def contamRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id", "bench_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("contaminationPairsBloom matches the exact variant bit-for-bit") {
    val bench = Seq((1L, base), (2L, "one two three four five six"))
    val corpus = (10 until 40).map { i =>
      val mutated = base.split(" ").updated(i % 10, s"w$i").mkString(" ")
      (i.toLong, if (i % 4 == 0) base else mutated)
    }
    val b = docsOf(bench: _*)
    val c = docsOf(corpus: _*)
    val exact = contamRows(Dedup.contaminationPairs(c, b))
    assert(exact.nonEmpty) // fixture must exercise the contaminated path
    assert(contamRows(Dedup.contaminationPairsBloom(c, b)) == exact)
  }

  private def snmDocs(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang")
  }

  test("snmPairs finds suffix-edit near-dups adjacent in sort order") {
    // docs 1/2 share a long prefix, differ at the tail — shingle-free
    // SNM territory; doc 3 sorts between unrelated texts
    val docs = snmDocs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta TAIL ONE", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta TAIL TWO XX", "en"),
      (3L, "zz totally different text", "en"))
    val out = Dedup.snmPairs(docs, window = 2, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("snmPairs: neighborhoods never cross blocks; window bounds reach") {
    // same text, different lang -> different block -> no pair
    val cross = snmDocs((1L, "same text here", "en"), (2L, "same text here", "de"))
    assert(Dedup.snmPairs(cross, window = 3, maxDist = 50).count() == 0)
    // window=1: docs 1,3 are 2 apart in sort order (2 between) -> no pair;
    // each adjacent pair differs by > maxDist
    val spread = snmDocs(
      (1L, "aaa identical body", "en"),
      (2L, "aam wholly unrelated string qqqqqqqq", "en"),
      (3L, "aaz identical body", "en"))
    assert(Dedup.snmPairs(spread, window = 1, maxDist = 5).count() == 0)
    // widening to 2 reaches the (1,3) pair
    val wide = Dedup.snmPairs(spread, window = 2, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(wide == Seq((1L, 3L)))
  }

  test("winnow == reference selection; shared-substring guarantee; pairs") {
    val s = spark
    import s.implicits._
    def md60(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.take(15), 16)
    def ref(text: String, k: Int, w: Int): Set[(Long, Long)] =
      if (text.length < k + w - 1) Set.empty
      else {
        val h = (0 to text.length - k).map(i => md60(text.substring(i, i + k)))
        (0 to h.size - w).map { j =>
          val win = h.slice(j, j + w)
          val m = win.min
          ((j + win.lastIndexOf(m) + 1).toLong, m)
        }.toSet
      }
    // docs 1/2 share the 12-char span "shared  span" >= w+k-1=6 chars;
    // doc 3 is below the length threshold and must vanish
    val texts = Map(1L -> "xx shared span qq", 2L -> "yyyy shared span zz",
      3L -> "tiny")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val got = Dedup.winnow(docs, k = 4, w = 3).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == Set(1L, 2L))
    texts.filter(_._2.length >= 6).foreach { case (id, t) =>
      assert(got(id) == ref(t, 4, 3), s"doc $id selection mismatch")
    }
    // the winnowing guarantee: a shared substring of length >= w+k-1
    // selects at least one common fingerprint hash
    val fps = got.view.mapValues(_.map(_._2)).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    val pairs = Dedup.winnowPairs(docs, k = 4, w = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("md5_shingles native expression == declarative shingles (spaces, unicode, multiset)") {
    // Md5Shingles replaced the transform/concat_ws/array_distinct chain
    // (r18): pin both variants against the declarative columns on texts
    // with consecutive/leading/trailing spaces (empty tokens), multi-byte
    // chars, repeated spans (multiset multiplicity), and short docs
    val s = spark
    import s.implicits._
    val texts = Seq(
      1L -> "a b c d e",
      2L -> "a  b   c d",      // empty tokens between spaces
      3L -> " a b c ",          // leading/trailing empties
      4L -> "x y x y x y x y",  // repeated shingles (distinct vs multiset)
      5L -> "añé βγ δ ñ ü",
      6L -> "one two",          // below k=3 tokens -> empty
      7L -> "")
    val docs = texts.toDF("doc_id", "text")
    // independent declarative reference (the pre-r18 chain, spelled out —
    // Dedup.shinglesAll itself is native now, so the reference must not
    // route through it)
    def declShinglesAll(text: org.apache.spark.sql.Column, k: Int) = {
      val toks = split(text, " ")
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k), i =>
          concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    }
    for (k <- Seq(1, 2, 3)) {
      val declDistinct = docs.select(col("doc_id"),
        transform(array_distinct(declShinglesAll(col("text"), k)),
          g => graft.text.TextAnalysis.md5Int60(g)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val declAll = docs.select(col("doc_id"),
        transform(declShinglesAll(col("text"), k),
          g => graft.text.TextAnalysis.md5Int60(g)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // TokenGrams (the native shinglesAll) against the same reference
      val natStrings = docs.select(col("doc_id"),
        graft.functions.TokenGrams.token_grams(col("text"), k).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val declStrings = docs.select(col("doc_id"),
        declShinglesAll(col("text"), k).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val natDistinct = docs.select(col("doc_id"),
        graft.functions.Md5Shingles.md5_shingles(col("text"), k, distinct = true).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val natAll = docs.select(col("doc_id"),
        graft.functions.Md5Shingles.md5_shingles(col("text"), k, distinct = false).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // md5Int32-width variant (digits = 8): the DSIR/simhash feature hash
      val declAll32 = docs.select(col("doc_id"),
        transform(declShinglesAll(col("text"), k),
          g => graft.text.TextAnalysis.md5Int32(g)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val natAll32 = docs.select(col("doc_id"),
        graft.functions.Md5Shingles.md5_shingles(
          col("text"), k, distinct = false, digits = 8).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      texts.foreach { case (id, _) =>
        assert(natDistinct(id) == declDistinct(id), s"doc $id k=$k distinct mismatch")
        assert(natAll(id) == declAll(id), s"doc $id k=$k multiset mismatch")
        assert(natAll32(id) == declAll32(id), s"doc $id k=$k digits=8 mismatch")
        assert(natStrings(id) == declStrings(id), s"doc $id k=$k gram-string mismatch")
      }
    }
  }

  test("winnow native expression == naive reference on tie-heavy and unicode text") {
    // the WinnowFps codegen expression replaced the declarative fold
    // (r18): pin it against a naive scala replay — tiny alphabet forces
    // repeated grams (rightmost-tie rule exercised), multi-byte chars pin
    // the character-based substring semantics
    val s = spark
    import s.implicits._
    def md60(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.take(15), 16)
    def ref(text: String, k: Int, w: Int): Set[(Long, Long)] =
      if (text.codePointCount(0, text.length) < k + w - 1) Set.empty
      else {
        val chars = text.toSeq.map(_.toString) // BMP-only fixtures below
        val h = (0 to chars.size - k).map(i => md60(chars.slice(i, i + k).mkString))
        (0 to h.size - w).map { j =>
          val win = h.slice(j, j + w)
          val m = win.min
          ((j + win.lastIndexOf(m) + 1).toLong, m)
        }.toSet
      }
    val rnd = new scala.util.Random(7)
    val texts = (1L to 20L).map { id =>
      // alphabet of 2: dense gram collisions => tied window minima
      id -> (1 to (8 + rnd.nextInt(60))).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
    } :+ (21L -> "añoñería grüße ñañañaña βββαβ") :+ (22L -> "aaaaaaaaaaaaaaaa")
    val docs = texts.toDF("doc_id", "text")
    for ((k, w) <- Seq((4, 3), (2, 5), (1, 1))) {
      val got = Dedup.winnow(docs, k = k, w = w).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      texts.foreach { case (id, t) =>
        val expect = ref(t, k, w)
        assert(got.getOrElse(id, Set.empty) == expect,
          s"doc $id k=$k w=$w selection mismatch")
      }
    }
  }

  test("winnowPairs: maxDf drops boilerplate fingerprints before the self-join") {
    val s = spark
    import s.implicits._
    // docs 1-3 identical (every fingerprint df=3 — "boilerplate"),
    // doc 4 unrelated
    val docs = Seq(1L -> "common boilerplate text", 2L -> "common boilerplate text",
      3L -> "common boilerplate text", 4L -> "something else entirely ok")
      .toDF("doc_id", "text")
    val all = Dedup.winnowPairs(docs, k = 4, w = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(all == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // df cap 2 removes every df=3 fingerprint -> no candidate pairs left
    val capped = Dedup.winnowPairs(docs, k = 4, w = 3, minShared = 1, maxDf = 2)
      .collect()
    assert(capped.isEmpty)
  }

  test("linkagePairs: hand-computed FS weights, verdict bands, block isolation") {
    val s = spark
    import s.implicits._
    // N=4 -> bits(4)=2; source web x2 / books x1 / other x1;
    // p16 "hello world aaaa" x2
    val docs = Seq(
      (1L, "hello world aaaaaaaa", "en", "web"),   // len 20
      (2L, "hello world aaaaaaab", "en", "web"),   // len 20, same p16
      (3L, "hello there", "en", "books"),          // len 11
      (4L, "zzz alone", "en", "other"))            // block en:z — isolated
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    val out = Dedup.linkagePairs(docs, window = 3)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("w_source"),
        r.getAs[Long]("w_len"), r.getAs[Long]("w_prefix"),
        r.getAs[Long]("score"), r.getAs[String]("verdict")))
    // (1,2): src agree web -> bits(4)-bits(2)=1; len band +2; p16 agree
    // -> 1; score 4 -> possible. (1,3)/(2,3): all disagree -> -2-1-1=-4
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 2L, 1L, 4L, "possible"),
      (1L, 3L, -2L, -1L, -1L, -4L, "nonmatch"),
      (2L, 3L, -2L, -1L, -1L, -4L, "nonmatch")))
    // the block is a caller knob (the snmPairs sharding discipline): one
    // coarse block makes doc 4 — isolated under the default en:z block —
    // a window candidate of every other doc. Sort order by text prefix is
    // 3 < 1 < 2 < 4, so window=3 yields all 6 pairs.
    val oneBlock = Dedup.linkagePairs(docs, window = 3,
      block = Some(org.apache.spark.sql.functions.lit("*")))
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(oneBlock == Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    // a custom sortKey reorders the window: sorting by doc_id descending
    // proxy (negated via lpad of (9 - doc_id)) still yields the same set
    // under one block at window=3 over 4 docs — but a window of 1 pairs
    // only sort-adjacent docs, proving the key is actually applied
    val adjacent = Dedup.linkagePairs(docs, window = 1,
      block = Some(org.apache.spark.sql.functions.lit("*")),
      sortKey = Some(org.apache.spark.sql.functions.lpad(
        (org.apache.spark.sql.functions.lit(9) - org.apache.spark.sql.functions.col("doc_id"))
          .cast("string"), 2, "0")))
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // sort order under 9-doc_id: 4, 3, 2, 1 -> adjacent pairs (3,4), (2,3), (1,2)
    assert(adjacent == Seq((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("weightedJaccardPairs: repeated spans keep their mass, df cap changes semantics") {
    // unigram shingles (k=1) make the bag arithmetic auditable by hand
    val docs = docsOf(
      (1L, "a a b c"),     // bag {a:2, b:1, c:1}
      (2L, "c b a a"),     // same bag, permuted -> wj = 1.0
      (3L, "a a a q"),     // shares only 'a' mass with 1/2
      (4L, "x y z w"))
    val got = Dedup.weightedJaccardPairs(docs, threshold = 0.3, k = 1)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // (1,2): inter 4, union 4, wj 1.0; (1,3): min(a)=2, union 4+4-2=6,
    // wj 1/3 — set semantics would score (1,3) at 1/6 and (1,2)=(1,3)
    assert(got.toSeq == Seq(
      (1L, 2L, 4L, 4L, 1.0),
      (1L, 3L, 2L, 6L, 2.0 / 6.0),
      (2L, 3L, 2L, 6L, 2.0 / 6.0)))
    // df cap at 2 drops 'a' (df 3): doc 3 no longer pairs with anything,
    // (1,2) still identical bags {b,c}
    val capped = Dedup.weightedJaccardPairs(docs, threshold = 0.3, k = 1,
      maxDocFrequency = Some(2))
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(capped.toSeq == Seq((1L, 2L, 2L, 2L, 1.0)))
  }

  test("weightedJaccardPairs: self-repetition dilutes where set Jaccard saturates") {
    // doc 2 = doc 1's span repeated 3x: identical 3-shingle SETS, but the
    // bag measure sees the tripled mass plus the 2 junction shingles
    val span = "alpha beta gamma delta"
    val docs = docsOf((1L, span), (2L, s"$span $span $span"))
    val setJ = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.0).collect()
    assert(setJ.length == 1 && setJ(0).getAs[Double]("jaccard") < 1.0,
      "junction shingles keep even the set measure below 1.0")
    val got = Dedup.weightedJaccardPairs(docs, threshold = 0.1, k = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    // doc1: 2 shingles; doc2: 10 (3x2 span + 4 junction): min-sum = 2,
    // union = 2 + 10 - 2 = 10 -> 0.2; the set measure scores 2/4
    assert(got.toSeq == Seq((2L, 10L, 0.2)))
  }

  test("prefixFilterPairs equals brute-force shingle Jaccard (no false negatives)") {
    // doc 2 = doc 1 with one tail edit (high overlap); doc 3 shares a few
    // shingles with 1 (below threshold); doc 4 disjoint
    val docs = docsOf(
      (1L, base),
      (2L, base.replace("kappa", "KAPPA2")),
      (3L, "alpha beta gamma COMPLETELY other words here now"),
      (4L, "one two three four five six seven eight"))
    def shingles(t: String) =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
      sa = shingles(docs.filter(col("doc_id") === a).head.getString(1))
      sb = shingles(docs.filter(col("doc_id") === b).head.getString(1))
      inter = (sa & sb).size
      j = inter.toDouble / (sa ++ sb).size
      if j >= 0.3
    } yield (a, b, inter.toLong, (sa ++ sb).size.toLong)).toSeq
    val got = Dedup.prefixFilterPairs(docs, threshold = 0.3)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected.sorted)
    assert(got.exists(t => t._1 == 1L && t._2 == 2L), "near-dup pair must survive")
    assert(!got.exists(t => t._2 == 3L || t._2 == 4L), "sub-threshold pairs must not")
  }

  test("prefixFilterPairs: boundary jaccard == threshold is kept") {
    // 6 tokens -> 4 shingles each; docs share 2 of their 4 shingles:
    // inter=2, union=6, j=1/3 — exactly the threshold
    val docs = docsOf(
      (1L, "a b c d e f"),
      (2L, "a b c d X Y"))
    val got = Dedup.prefixFilterPairs(docs, threshold = 1.0 / 3.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 6L)))
  }

  test("qgramEditPairs finds HEAD-edit near-dups that sort-order blocking misses") {
    val tail = "the quick brown fox jumps over the lazy dog again and again tonight"
    val docs = docsOf(
      (1L, s"AAAA $tail"),   // same tail, different heads: sort order
      (2L, s"ZZZZ $tail"),   // separates them, shared grams do not
      (3L, "completely unrelated content that shares nothing with the others at all xyz"))
    val got = Dedup.qgramEditPairs(docs, maxDist = 10, q = 3, prefixLen = 160)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 4L)), s"got ${got.toSeq}")
    // the same pair is invisible to snmPairs at window 1 over this corpus
    // when a doc sorts between them — q-grams don't depend on adjacency
    val wedge = docsOf(
      (1L, s"AAAA $tail"),
      (2L, s"ZZZZ $tail"),
      (3L, s"M completely different middle text here to occupy the sort gap okay"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    assert(Dedup.snmPairs(wedge, window = 1, maxDist = 10).count() == 0)
    assert(Dedup.qgramEditPairs(wedge, maxDist = 10).count() == 1)
  }

  test("qgramEditPairs: contract excludes unprunable short strings; maxDist binds") {
    val long1 = "a sufficiently long document body with plenty of distinct grams here one"
    val docs = docsOf(
      (1L, long1),
      (2L, long1 + " x"),
      (3L, "tiny doc"),        // < 31 distinct grams -> excluded
      (4L, "tiny dog"))
    val got = Dedup.qgramEditPairs(docs, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)), "short docs are out of contract")
    // widening the edit budget does not admit the excluded strings
    assert(!Dedup.qgramEditPairs(docs, maxDist = 12)
      .collect().exists(r => r.getLong(0) >= 3L))
  }

  test("qgramEditPairs: auditMaxDocId bounds the pass in-API, None audits all") {
    val tail = "the quick brown fox jumps over the lazy dog again and again tonight"
    val docs = docsOf(
      (1L, s"AAAA $tail"),
      (2L, s"ZZZZ $tail"),
      (10L, s"QQQQ $tail"),
      (11L, s"RRRR $tail"))
    // bound at 10: only the (1,2) pair is in scope — identical to the
    // caller pre-filtering doc_id < 10 (the old call-site convention)
    val bounded = Dedup.qgramEditPairs(docs, maxDist = 10,
        auditMaxDocId = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded == Set((1L, 2L)))
    val manual = Dedup.qgramEditPairs(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") < 10),
        maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded == manual)
    // None = full input: all six cross-pairs of the shared tail
    assert(Dedup.qgramEditPairs(docs, maxDist = 10).count() == 6)
  }

  test("snmPairs: custom block column re-blocks; bounded sort key ties on doc_id") {
    import org.apache.spark.sql.functions.{col, substring}
    // default block (lang:first-char) would pair these; a finer custom
    // block on a 3-char prefix separates them into different blocks
    val docs = snmDocs(
      (1L, "abc shared text body one", "en"),
      (2L, "abd shared text body one", "en"))
    assert(Dedup.snmPairs(docs, window = 2, maxDist = 5).count() == 1)
    val fine = Dedup.snmPairs(docs, window = 2, maxDist = 5,
      block = Some(substring(col("text"), 1, 3)))
    assert(fine.count() == 0)
    // sortPrefixLen shorter than the shared prefix: order falls back to
    // doc_id deterministically and the pair is still found
    val tied = Dedup.snmPairs(docs, window = 2, maxDist = 5, sortPrefixLen = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(tied == Seq((1L, 2L)))
  }

  test("contaminationPairsBloom stays exact under a saturated 64-bit bloom") {
    // one word of filter → nearly every gram false-positives through the
    // prune; the exact re-join must still reproduce the exact result
    val b = docsOf((1L, base))
    val c = docsOf((10L, base), (11L, "totally unrelated words here now yes"))
    assert(contamRows(Dedup.contaminationPairsBloom(c, b, bloomBits = 64)) ==
      contamRows(Dedup.contaminationPairs(c, b)))
  }

  test("snapshotDiff: added/removed/changed/unchanged by content digest") {
    val prev = docsOf((1L, "same text"), (2L, "old text"), (3L, "gone"))
    val curr = docsOf((1L, "same text"), (2L, "new text"), (4L, "fresh"))
    val out = Dedup.snapshotDiff(prev, curr, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // the diff plan carries digests, not documents: no text column survives
    // past the per-side projection
    val plan = Dedup.snapshotDiff(prev, curr, "doc_id", col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("lshRecall: identical docs land in decile 9 with recall 1") {
    // 1 and 2 identical (jaccard 1.0 -> decile 9, identical signatures so
    // every band collides); 3 unrelated contributes no true pair
    val d = docsOf(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six"))
    val out = Dedup.lshRecall(d, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("sim_decile"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toSeq
    assert(out == Seq((9L, 1L, 1L, 1.0)))
  }

  test("lshRecall: hits never exceed truth, recall within [0, 1]") {
    val d = docsOf((0L until 40L).map(i =>
      (i, s"tok${i % 7} shared common words here tok${i % 5} tail$i")): _*)
    val out = Dedup.lshRecall(d, threshold = 0.2)
      .collect().map(r => (r.getAs[Long]("n_true"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall")))
    assert(out.nonEmpty)
    out.foreach { case (t, h, rc) =>
      assert(h <= t && rc >= 0.0 && rc <= 1.0)
      assert(rc == h.toDouble / t.toDouble)
    }
  }

  test("noveltyFraction: first occurrence wins, repeats collapse, short docs drop") {
    val got = Dedup.noveltyFraction(docsOf(
      (1L, "a b c"),      // grams "a b","b c" — both novel
      (2L, "a b x"),      // "a b" seen, "b x" novel
      (3L, "a"),          // shorter than n — dropped
      (4L, "b c b c")),   // distinct {"b c","c b"}; only "c b" novel
      n = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_micro")))
    assert(got.toList == List(
      (1L, 2L, 2L, 1000000L),
      (2L, 2L, 1L, 500000L),
      (4L, 2L, 1L, 500000L)))
  }

  test("dupRateBySource: corpus-wide groups attributed per source") {
    val s = spark
    import s.implicits._
    // "x" appears in s1 AND s2 (cross-source dup counts for both);
    // "y" twice within s1; "z" unique to s2
    val docs = Seq(
      (1L, "x", "s1"), (2L, "y", "s1"), (3L, "y", "s1"),
      (4L, "x", "s2"), (5L, "z", "s2"))
      .toDF("doc_id", "text", "source")
    val got = graft.dedup.Dedup.dupRateBySource(docs)
      .orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dup_docs"), r.getAs[Double]("dup_rate")))
    assert(got.toSeq == Seq(("s1", 3L, 3L, 1.0), ("s2", 2L, 1L, 0.5)))
  }
  test("containmentPairs: quoted short doc scores ~1 on its side, low Jaccard") {
    val s = spark
    import s.implicits._
    // doc 1 = 4 tokens fully quoted inside doc 2's 12 tokens:
    // doc1 shingles (k=3): 2, all shared -> cont_a = 1.0, cont_b = 0.2
    val docs = Seq(
      (1L, "q w e r"),
      (2L, "a b c d e f q w e r x y"),
      (3L, "totally unrelated text here")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, k = 3, threshold = 0.5,
      maxDocFrequency = None).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("inter") == 2L
      && r.getAs[Long]("na") == 2L && r.getAs[Long]("nb") == 10L)
    assert(r.getAs[Double]("cont_a") == 1.0
      && r.getAs[Double]("cont_b") == 0.2)
    // the same pair fails the symmetric Jaccard at the same bar:
    // 2 / (2 + 10 - 2) = 0.2 — the asymmetry is the point
    val jac = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5)
    assert(jac.collect().isEmpty)
    intercept[IllegalArgumentException](
      Dedup.containmentPairs(docs, threshold = 0.0))
  }

  test("consensusPairs: identical docs trip all three signals, unrelated none") {
    // identical long docs: jaccard 1.0, simhash hamming 0, shared winnow
    // fingerprints — all three fire; the unrelated doc pairs with nothing
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val c = "completely different subject matter covering solar panels and wind farms"
    val docs = docsOf((1L, a), (2L, a), (3L, c))
    val got = Dedup.consensusPairs(docs)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_signals"), r.getAs[String]("signals")))
    assert(got.toSeq == Seq((1L, 2L, 3L, "jaccard,simhash,winnow")),
      got.mkString(","))
    // minSignals = 1 widens to single-signal pairs; 3 stays the same set
    assert(Dedup.consensusPairs(docs, minSignals = 3).count() == 1L)
    intercept[IllegalArgumentException](
      Dedup.consensusPairs(docs, minSignals = 0))
  }

  test("consensusFromPairs: pre-computed generator frames compose to the same verdict") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val c = "completely different subject matter covering solar panels and wind farms"
    val docs = docsOf((1L, a), (2L, a), (3L, c), (4L, a + " extra"))
    // a pipeline that already gated (and persisted) the three signals
    // composes them without re-deriving — output must be IDENTICAL to
    // the docs-shaped entry point at the same parameters
    val composed = Dedup.consensusFromPairs(
      Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.1,
        maxDocFrequency = Some(5)),
      Dedup.simhashPairs(docs, maxHamming = 3),
      Dedup.winnowPairs(docs, maxDf = 1000))
    val direct = Dedup.consensusPairs(docs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_signals"), r.getAs[String]("signals"))).toSet
    assert(rows(composed) == rows(direct) && rows(direct).nonEmpty)
  }

  test("dedupApply: kept and dropped partition the corpus; audit names survivors") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val c = "completely different subject matter covering solar panels and wind farms"
    // {1,2,5} collapse transitively (1-2, 2-5 edges), 3 and 4 singletons
    val docs = docsOf((1L, a), (2L, a), (3L, c),
      (4L, "yet another unrelated piece about gardening tulips in spring"), (5L, a))
    val verdict = Dedup.dedupApply(docs,
      Dedup.consensusPairs(docs).select(col("doc_a"), col("doc_b")))
    val rows = verdict.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("cluster"), r.getAs[Long]("kept"),
      r.getAs[Long]("kept_id"), r.getAs[Long]("n_dropped"))).toSeq
    // partition: every input doc appears exactly once
    assert(rows.map(_._1).sorted == Seq(1L, 2L, 3L, 4L, 5L))
    val (kept, dropped) = rows.partition(_._3 == 1L)
    // keep-lowest-id: 1 survives its cluster and reports 2 deletions;
    // singletons survive with 0
    assert(kept.map(r => r._1 -> r._5).toMap ==
      Map(1L -> 2L, 3L -> 0L, 4L -> 0L))
    // every dropped doc names a KEPT survivor, and it is its cluster min
    assert(dropped.map(_._1).sorted == Seq(2L, 5L))
    assert(dropped.forall(r => r._4 == 1L && kept.exists(_._1 == r._4)))
    // doc passthrough columns survive the join (text rides along)
    assert(verdict.columns.contains("text"))
  }

  test("dedupApply: 90%-one-cluster corpus — sizes via partial agg, no corpus window") {
    // 20 docs, 18 chained into ONE cluster (the mega-cluster shape that
    // would pin a PARTITION BY cluster window's buffer to one task)
    val docs = docsOf((0L until 20L).map(i => (i, s"doc $i body")): _*)
    val s = spark
    import s.implicits._
    val pairs = (0L until 17L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val verdict = Dedup.dedupApply(docs, pairs)
    val rows = verdict.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("kept"), r.getAs[Long]("kept_id"),
      r.getAs[Long]("n_dropped"))).toSeq
    assert(rows.map(_._1).sorted == (0L until 20L))
    val kept = rows.filter(_._2 == 1L)
    // doc 0 survives the 18-member chain reporting 17 deletions;
    // 18 and 19 are singletons
    assert(kept.map(r => r._1 -> r._4).toMap ==
      Map(0L -> 17L, 18L -> 0L, 19L -> 0L))
    assert(rows.filter(_._2 == 0L).forall(_._3 == 0L))
    // the plan must size clusters by partial-combinable aggregation, not
    // a corpus-partitioned window (which cannot stripe a mega-cluster)
    val plan = verdict.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"dedupApply plans a window over the corpus: $plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"dedupApply lost the partial cluster-size aggregation: $plan")
  }
}
