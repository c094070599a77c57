package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, over the
  * `documents(doc_id, text, lang, source, n_chars)` relation: token counting,
  * quality scoring, language identification, and document fingerprinting.
  *
  * All operators are single-pass narrow projections (no shuffle) — at 100 TB
  * they run as a map stage fused into the parquet scan by whole-stage
  * codegen, with column pruning reading only `text` (+ keys). Every value is
  * either an exact integer or a double derived from exact integers through a
  * fixed expression tree, so results are bit-identical across engines (the
  * DuckDB oracle twin lives in [[graft.SparkEntry.oracleSql]]).
  */
object TextAnalysis {

  /** BPE-ish token pattern: letter runs, digit runs, or single punctuation
    * marks — the pre-tokenization split most BPE vocabularies apply. Kept to
    * a subset understood identically by Java regex and RE2 (DuckDB). */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Fixed stopword list used for the quality ratio (ordinary English
    * function words that occur in the corpus vocabulary). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Marker vocabularies for language-ID scoring. With natural corpora these
    * would be per-language character n-grams/function words; the synthetic
    * corpus shares one vocabulary across langs, so markers are fixed word
    * sets — the scoring/argmax machinery is the operator under test, and the
    * prediction is deterministic regardless of corpus. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("window", "batch", "group"),
    "en" -> Seq("the", "data", "row"),
    "es" -> Seq("column", "line", "value"),
    "fr" -> Seq("merge", "join", "key"),
    "zh" -> Seq("hash", "scan", "sort"))

  /** Whitespace tokens (single-space separated corpus). */
  def wsTokens(text: Column): Column = split(text, " ")

  /** 32-bit integer hash of a string via md5 — identical in any engine with
    * a standard md5 (reference partitioner uses the same md5-prefix trick,
    * `src/helpers/partition.ts:10-12`). Native codegen expression
    * ([[graft.functions.Md5Int]]) — value-identical to
    * `conv(substring(md5(c), 1, 8), 16, 10)` without the hex round-trip. */
  def md5Int32(c: Column): Column =
    graft.functions.Md5Int.md5_int(c, 8)

  /** 60-bit variant (15 hex chars — stays inside signed int64): the
    * fixed-width join/shuffle key for shingles and similar high-cardinality
    * strings. */
  def md5Int60(c: Column): Column =
    graft.functions.Md5Int.md5_int(c, 15)

  /** Per-document token counts + quality features. One row per doc:
    * whitespace tokens, BPE-ish tokens, char sum of tokens, stopword count,
    * punctuation count, and a composite [0,1]-ish quality score
    * (length/stopword/punct ratios — the standard heuristic trio). */
  def stats(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val nTok = size(toks)
    // sum of token lengths == non-space char count (true for any number of
    // consecutive spaces, since extra spaces yield empty tokens) — one
    // codegen'd replace instead of an interpreted aggregate(transform(...))
    val charSum = length(regexp_replace(col("text"), " ", ""))
    val stopCount = size(filter(toks, t => t.isInCollection(Stopwords)))
    val punctCount = regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("int")
    // counts as BIGINT so engine outputs hash-compare identically
    docs.select(
      col("doc_id"),
      nTok.cast("long").as("n_ws_tokens"),
      regexp_count(col("text"), lit(BpeTokenPattern)).cast("long").as("n_bpe_tokens"),
      charSum.cast("long").as("token_chars"),
      stopCount.cast("long").as("stopword_count"),
      punctCount.cast("long").as("punct_count"),
      (charSum.cast("double") / nTok.cast("double")).as("avg_token_len"),
      (stopCount.cast("double") / nTok.cast("double") * lit(0.5)
        + (lit(1.0) - punctCount.cast("double") / col("n_chars").cast("double")) * lit(0.5))
        .as("quality_score"))
  }

  /** Repetition quality signals (the Gopher-rule family): repeated words
    * and repeated adjacent word pairs mark boilerplate, OCR noise, and
    * generation loops. One row per doc: word totals/distincts, the most
    * repeated word's count, and the top bigram's count + character-free
    * fraction — exact integer ratios, divided once at the output edge.
    *
    * Shape: two explode→count→per-doc aggregates (each map-side combined;
    * the shuffles carry one row per distinct token per doc, bounded by
    * document length) joined on doc_id. Nothing corpus-sized shuffles
    * un-reduced. */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val words = docs.select(col("doc_id"), explode(toks).as("w"))
    // Docs with <2 tokens have no bigrams: emit an empty array (explode then
    // yields no rows, so the inner join below drops them — exactly like the
    // oracle's `range(len-1)` + inner join). Without the guard, size-2 goes
    // negative and sequence() produces a descending index list whose
    // element_at(0) throws at runtime.
    val bigrams = docs.select(col("doc_id"),
      explode(graft.dedup.Dedup.shinglesAll(col("text"), 2)).as("b"))
    val wordStats = words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("top_word_count"))
    val bigramStats = bigrams.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_count"))
    wordStats.join(bigramStats, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        ((col("n_words") - col("n_distinct_words")).cast("double")
          / col("n_words").cast("double")).as("dup_word_frac"),
        col("top_word_count"), col("n_bigrams"), col("top_bigram_count"),
        (col("top_bigram_count").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"))
  }

  /** Token-entropy quality signal — the information-theoretic gibberish /
    * boilerplate detector the ratio heuristics ([[stats]], [[repetition]])
    * miss: near-zero entropy flags looped generation and template spam
    * (one token dominating), near-log2(n) entropy flags hash soup / OCR
    * noise (every token distinct). Shannon entropy needs float logs, so
    * this reports the floor-log2 PROXY the engine's LM scores use:
    * `ent_bits = Σ c_i · (bits(n) − bits(c_i))` with `bits(x) =
    * length(bin(x)) − 1` — exact integer arithmetic, identical on any
    * engine, order-equivalent to entropy at the granularity quality
    * filters threshold on. `mean_bits = ent_bits / n` is the per-token
    * figure; 0 ⇔ a single repeated token, and ≤ the true entropy ≤
    * mean_bits + 2 by the floor-log2 sandwich.
    *
    * Shape: one explode → per-(doc, token) count → per-doc aggregate,
    * both map-side combined; nothing corpus-sized shuffles un-reduced —
    * the [[repetition]] scale shape with one more integer column. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * bits(col("c"))).as("sb"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("n_tokens") * bits(col("n_tokens")) - col("sb")).as("ent_bits"))
      .withColumn("mean_bits",
        col("ent_bits").cast("double") / col("n_tokens").cast("double"))
  }

  /** Split documents into fixed-size token windows with overlap — the
    * pre-training chunking pass (long documents become `maxTokens`-token
    * training sequences; `overlap` tokens of context carry across chunk
    * boundaries). One row per (doc, chunk): `(doc_id, chunk_idx,
    * chunk_text, n_chunk_tokens)`.
    *
    * Chunk count comes from exact integer arithmetic
    * (`ceil((n-overlap)/stride)` as `(n - overlap + stride - 1) div
    * stride`), so engines agree bit-for-bit; every doc yields at least one
    * chunk. A narrow explode: the shuffle-free map shape, output rows
    * bounded by tokens/stride per doc. */
  def chunk(docs: DataFrame, maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val stride = (maxTokens - overlap).toLong
    val toks = wsTokens(col("text"))
    val nTok = size(toks).cast("long")
    // Column `/` is double division; floor of it is still the exact
    // integer ceil-div here (operands are exact ints << 2^53, and a
    // non-integer quotient sits >= 1/stride away from any integer — far
    // beyond one ulp), and the oracle's integer `//` computes the same
    // mathematical floor
    val nChunks = greatest(
      floor((nTok - lit(overlap.toLong) + lit(stride - 1)).cast("double")
        / lit(stride.toDouble)).cast("long"),
      lit(1L))
    docs.select(col("doc_id"), toks.as("toks"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(
        col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(maxTokens)))
          .as("chunk_text"),
        size(slice(col("toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(maxTokens)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** PII scrub patterns — deliberately simple character-class regexes that
    * parse identically under Java regex and RE2 (DuckDB), so the redaction
    * is engine-reproducible. Order matters: email first (an address
    * contains digits a later pattern could mangle). */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "[0-9][0-9][0-9][-.][0-9][0-9][0-9][-.][0-9][0-9][0-9][0-9]" -> "<PHONE>")

  /** Redact PII from a text column: every pattern match replaced by its
    * token. One narrow codegen'd map — the pre-training scrub pass. */
  def redact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (re, token)) =>
      regexp_replace(acc, re, token)
    }

  /** Per-source PII exposure report — the governance DETECTION companion
    * to [[redact]] (scrub): for each source, how many docs carry each PII
    * type and how many total matches exist. The release-gate table a
    * privacy review reads before a corpus ships; sources with exposure
    * route to the scrub pass or get dropped.
    *
    * Counts via `regexp_count` over the SAME [[PiiPatterns]] the scrubber
    * applies (one source of truth — detect and scrub can never disagree),
    * aggregated map-side onto |sources| rows. One narrow scan, no
    * shuffle beyond the tiny final rollup. */
  def piiReport(docs: DataFrame): DataFrame = {
    val Seq((emailRe, _), (phoneRe, _)) = PiiPatterns
    docs
      .select(col("source"),
        regexp_count(col("text"), lit(emailRe)).cast("long").as("n_email"),
        regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phone"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_email") > 0).cast("long")).as("docs_with_email"),
        sum((col("n_phone") > 0).cast("long")).as("docs_with_phone"),
        sum(col("n_email")).as("total_emails"),
        sum(col("n_phone")).as("total_phones"))
  }

  /** Flagged-phrase audit in ONE corpus scan: per doc, the total number of
    * occurrences of any pattern (all positions, overlapping included) and
    * the number of distinct patterns present — the C4-style
    * blocklist/contamination-phrase gate. Docs with zero hits are dropped
    * (at 100 TB the clean majority never leaves the scan stage).
    *
    * The kernel is the flattened Aho–Corasick DFA
    * ([[graft.functions.MultiPatternCount]]): O(bytes) per row regardless
    * of pattern count, fused into the parquet scan by whole-stage codegen —
    * vs N separate `regexp_count` passes for the declarative spelling. No
    * shuffle; scales as a pure map stage. */
  def multiPatternHits(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val counts =
      graft.functions.MultiPatternCount.multi_pattern_count(col("text"), patterns)
    docs
      .select(col("doc_id"), counts.as("counts"))
      .select(col("doc_id"),
        aggregate(col("counts"), lit(0L), (a, x) => a + x).as("n_hits"),
        size(filter(col("counts"), _ > lit(0L))).cast("long").as("n_pats"))
      .filter(col("n_hits") > 0)
  }

  /** Word-boundary blocklist filter (the token-level sibling of
    * [[multiPatternHits]]): per doc, occurrences of blocklisted words among
    * the whitespace tokens and the distinct blocklisted types present; docs
    * with no hit are dropped. The word list broadcasts as a literal array —
    * one narrow codegen'd map over the scan, no shuffle. */
  def blocklistHits(docs: DataFrame, words: Seq[String]): DataFrame = {
    val bad = array(words.map(lit): _*)
    docs
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(filter(col("toks"), t => array_contains(bad, t)))
          .cast("long").as("n_bad_tokens"),
        size(array_intersect(col("toks"), bad)).cast("long").as("n_bad_types"))
      .filter(col("n_bad_tokens") > 0)
  }

  /** Distinct-vocabulary overlap between two sub-corpora: |V_a|, |V_b|,
    * |V_a ∩ V_b| and the Jaccard — the domain-shift smell test run before
    * mixing a new source into a training corpus (high overlap → redundant;
    * low → distribution shift to sanity-check).
    *
    * One pass: tokens keyed once, per-token membership flags OR-folded via
    * `max`, then a single global sum — the classic two-set-cardinality
    * shape with ONE shuffle on the token key (map-side combined) and a
    * one-row result; |V| never materializes driver-side. Jaccard is the
    * single IEEE division at the output edge over exact counts. */
  def vocabOverlap(docs: DataFrame, srcA: String, srcB: String): DataFrame =
    docs
      .filter(col("source").isin(srcA, srcB))
      .select(col("source"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(max(when(col("source") === srcA, 1L).otherwise(0L)).as("in_a"),
        max(when(col("source") === srcB, 1L).otherwise(0L)).as("in_b"))
      .agg(sum(col("in_a")).as("n_a"), sum(col("in_b")).as("n_b"),
        sum(col("in_a") * col("in_b")).as("n_common"))
      .select(col("n_a"), col("n_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))

  /** Gopher-style quality gate (the word-level subset of the Rae et al.
    * heuristics that applies to single-line corpora): word count bounds,
    * mean word length bounds, symbol-to-word ratio, and the
    * alphabetic-word fraction, plus the combined pass/fail verdict the
    * filter pipeline consumes. Exact integers divided once at the output
    * edge; the four counters come from ONE native codegen byte walk
    * ([[graft.functions.GopherStats]] — replaces the interpreted
    * `filter(toks, rlike)` HOF plus two regexp passes, value-identical
    * by the expression's contract, GopherStatsSpec-pinned). */
  def gopherQuality(docs: DataFrame,
      minWords: Int = 5, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8): DataFrame = {
    // two projection steps so the byte walk runs ONCE per row (the
    // derived ratios reference the counters eight times; going through a
    // materialized struct column never relies on codegen subexpression
    // elimination to avoid 8 walks)
    val counted = docs.select(col("doc_id"),
      graft.functions.GopherStats.gopher_stats(col("text")).as("__g"))
    val nWords = col("__g.n_words")
    val charSum = col("__g.word_chars")
    val alphaWords = col("__g.n_alpha_words")
    val symbolCount = col("__g.n_symbols")
    val meanLen = charSum.cast("double") / nWords.cast("double")
    val symbolRatio = symbolCount.cast("double") / nWords.cast("double")
    val alphaFrac = alphaWords.cast("double") / nWords.cast("double")
    counted.select(
      col("doc_id"), nWords.as("n_words"), charSum.as("word_chars"),
      alphaWords.as("n_alpha_words"), symbolCount.as("n_symbols"),
      meanLen.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
      alphaFrac.as("alpha_frac"),
      (nWords >= minWords && nWords <= maxWords &&
        meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
        symbolRatio <= maxSymbolRatio && alphaFrac >= minAlphaFrac)
        .cast("long").as("passes_gopher"))
  }

  /** [[gopherQuality]]'s verdict as a direct FILTER: keeps exactly the
    * rows (all columns preserved) whose doc would have
    * `passes_gopher = 1` — for a frame with unique `doc_id`s this is
    * value-identical to the
    * `docs.join(gopherQuality(docs).filter(passes).select(doc_id),
    * "left_semi")` composition the curation chains used, minus the
    * self-join (the chains re-scanned `docs` twice and paid a join to
    * re-attach a verdict that is a pure per-row function — guide §2.4).
    * Null text propagates to a null verdict and the row drops, exactly
    * as the semi-join dropped it. One [[graft.functions.GopherStats]]
    * byte walk per row via a materialized struct column. */
  def gopherKeep(docs: DataFrame,
      minWords: Int = 5, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8): DataFrame =
    // single-expression verdict: a struct-column + multi-field predicate
    // would get its alias substituted by predicate pushdown into one
    // byte walk PER FIELD REFERENCE (nine) — GopherPass's scaladoc
    docs.filter(graft.functions.GopherStats.gopher_pass(col("text"),
      minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolRatio, minAlphaFrac))

  /** Language-ID: score each language's marker set against the document's
    * tokens (with multiplicity); predicted language = argmax with
    * alphabetical tiebreak. Emitted per doc with the true label for
    * downstream confusion analysis. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val scored = docs.select(
      (col("doc_id") +: col("lang") +:
        LangMarkers.map { case (l, markers) =>
          size(filter(toks, t => t.isInCollection(markers))).as(s"score_$l")
        }): _*)
    // alphabetical-preference argmax: first lang whose score >= all others
    val langs = LangMarkers.map(_._1)
    val pred = langs.init.foldRight(lit(langs.last): Column) { (l, rest) =>
      val ge = langs.filter(_ != l).map(o => col(s"score_$l") >= col(s"score_$o"))
        .reduce(_ && _)
      when(ge, lit(l)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Confusion-matrix rollup of [[langId]]: one shuffle of ≤|langs|² rows. */
  def langConfusion(docs: DataFrame): DataFrame =
    langId(docs)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  /** TF-IDF keyword extraction: the top-`topK` most characteristic terms
    * per document. The idf factor is the *linear* ratio `N/df` rather than
    * `log(N/df)` — log is a transcendental whose last-ulp rounding differs
    * between engines, while `double(tf*N) / double(df)` is one exactly-
    * rounded IEEE division of exact integers, so scores (and therefore
    * ranks) are bit-identical across Spark and the DuckDB oracle. Within a
    * fixed document tf is positive, so per-doc ordering by `tf*N/df` is a
    * monotone transform of ordering by `tf/df` — the standard keyword
    * ranking, just without the log damping.
    *
    * Shape (100 TB): explode → partial-aggregated `tf` per (doc, term), one
    * explicit `repartition(term)` exchange that BOTH the `df` rollup and the
    * tf⋈df join read (the [[graft.dedup.Dedup.ngramJaccardPairs]] shared-
    * exchange pattern — the tf subtree is scanned once), then one window per
    * doc over the joined rows. The df join key skews on stopword-grade
    * terms; aggregates are map-side combined and AQE's skew-join split
    * handles the probe side — nothing buffers a full term group in memory.
    * Vocabulary at corpus scale is too large to broadcast, hence the
    * shuffle join. */
  def tfidf(docs: DataFrame, topK: Int = 3): DataFrame = {
    val nDocs = docs.count() // exact corpus size: one cheap count job
    val tf = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .repartition(col("term"))
    // tf has one row per (doc, term), so count(*) per term == document
    // frequency; both this rollup and the join below reuse tf's exchange
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .withColumn("score",
        (col("tf") * lit(nDocs)).cast("double") / col("df").cast("double"))
      .withColumn("kw_rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("kw_rank") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("kw_rank"))
  }

  /** BM25 top-k retrieval scoring (Robertson-Spärck Jones; the ranking
    * function behind retrieval-based data curation — "find the corpus
    * documents most relevant to these query terms"), re-expressed with
    * EXACT integer arithmetic so the gate is bit-reproducible across
    * engines:
    *
    *  - idf is quarter-log2 fixed point: `floor(4·log2((N+1)/df))`,
    *    computed exactly as `bitlen((N+1)⁴ div df⁴) − 1` — the identity
    *    `floor(log2(a/b)) = bitlen(a div b) − 1` holds because for
    *    integer 2^k, `2^k ≤ a/b ⟺ 2^k ≤ a div b`; raising to the 4th
    *    power buys 2 fractional bits so common-but-distinct df values
    *    still separate (the [[lmBits]] floor-log2-via-`bin()` idiom).
    *  - the tf saturation `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    *    the standard k1=1.2, b=0.75 and avgdl=L/N clears denominators to
    *    the exact rational `22·L·tf / (10·L·tf + 3·L + 9·dl·N)`, scored
    *    as its floor at 1e6 fixed point (integer div).
    *
    * Score = Σ_terms idf4 · tfnorm_1e6, summed per document; top-k by
    * (score DESC, doc_id) — a total order, so the k-boundary is
    * deterministic. Output: `(doc_id, score, terms)`.
    *
    * Scale (100 TB): the corpus pays one stats pass (N, L — a 1-row
    * broadcast) and one token scan FILTERED to the query terms before the
    * only exchange, so the shuffle carries ≤ |terms| rows per document;
    * df comes from that same tiny table and broadcasts back. Top-k is
    * TakeOrdered (per-partition heaps, no global sort). Exact-mode int64
    * headroom: the BINDING bound is the pow4 idf — (n+1)^4 wraps past
    * 55,107 documents, guarded in-plan with a loud error — with the
    * 1e6·22·L·tf product (L·tf < 4e11) the next constraint;
    * `exactFixedPoint = false` runs the SAME plan
    * with the textbook double-arithmetic BM25 (k1 = 1.2, b = 0.75, the
    * Robertson–Spärck Jones idf), the corpus-scale mode: exactness is a
    * property the oracle gate needs, not the ranking. Reference
    * relevance: the reference broker has no retrieval surface; this
    * extends the pipeline family (SURVEY §2.9 extensions). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], topK: Int = 20,
      exactFixedPoint: Boolean = true): DataFrame = {
    require(terms.nonEmpty && topK >= 1, "need query terms and topK >= 1")
    val t = docs.select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val stats = t.agg(count(lit(1)).cast("long").as("n"),
      sum(size(col("toks"))).cast("long").as("l"))
    val tf = t
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isInCollection(terms))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val scored = tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
    val contrib =
      if (exactFixedPoint)
        scored
          // the pow4 idf wraps int64 once n+1 > 55108 (55109^4 > 2^63) —
          // a FAR tighter exact-mode bound than the 1e6·22·L·tf product's
          // L·tf < 4e11; fail loudly instead of ranking on wrapped
          // garbage (non-ANSI Spark would not throw on its own). The
          // guard lives INSIDE the idf expression so column pruning can
          // never elide it.
          .withColumn("idf4",
            when(col("n") + 1 <= 55108,
              bits(expr("((n+1)*(n+1)*(n+1)*(n+1)) div (df*df*df*df)")))
              .otherwise(raise_error(lit(
                "bm25TopK exactFixedPoint overflows past 55107 documents; " +
                  "use exactFixedPoint = false"))))
          .withColumn("c",
            col("idf4") * expr("(1000000*22*l*tf) div (10*l*tf + 3*l + 9*dl*n)"))
      else
        // the overflow-free corpus-scale mode: plain double BM25 with the
        // same k1/b; ln and division are per-row scalars on the already
        // term-filtered rows, so the plan shape is unchanged
        scored.withColumn("c",
          log((col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
              (col("df").cast("double") + lit(0.5)) + lit(1.0)) *
            (col("tf").cast("double") * lit(2.2) /
              (col("tf").cast("double") + lit(1.2) *
                (lit(0.25) + lit(0.75) * col("dl").cast("double") *
                  col("n").cast("double") / col("l").cast("double")))))
    contrib
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("score"), count(lit(1)).as("terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Cross-document boilerplate detection: word k-grams appearing in at
    * least `minDocs` distinct documents are "boilerplate" (headers,
    * footers, license blurbs, templated spans — the C4/CCNet repeated-span
    * heuristic), and each document is scored by the fraction of its k-gram
    * instances that are boilerplate. One row per doc with >= 1 k-gram:
    * `(doc_id, n_grams, n_boiler, boiler_frac)`; docs shorter than k
    * tokens drop (no k-grams — the empty-array explode, matching the
    * oracle's inner grouping).
    *
    * Grams shuffle as md5-int60 keys (8 bytes instead of the k-word
    * string — [[graft.dedup.Dedup]]'s shingle idiom; the oracle hashes
    * identically so any collision is shared). Shape: explode →
    * partial-aggregated per-(doc, gram) counts on one explicit
    * `repartition(gh)` exchange reused by the document-frequency rollup
    * and the back-join, then a per-doc aggregate. All counting is
    * aggregate-based (map-side combined) — no window over a gram
    * partition, which a universal gram would skew at corpus scale. */
  def boilerplate(docs: DataFrame, k: Int = 3, minDocs: Int = 5): DataFrame = {
    require(k >= 1 && minDocs >= 1, "need k >= 1 and minDocs >= 1")
    // native multiset shingle hasher (r18): same md5Int60 values as the
    // interpreted transform/concat_ws chain, one codegen loop per row;
    // <k-token docs yield an empty array exactly like the old guard
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.Md5Shingles.md5_shingles(
        col("text"), k, distinct = false)).as("gh"))
    val docGram = grams.groupBy(col("doc_id"), col("gh"))
      .agg(count(lit(1)).as("c"))
      .repartition(col("gh"))
    // one row per (doc, gram) ⇒ count(*) per gram == distinct-doc frequency
    val docFreq = docGram.groupBy(col("gh")).agg(count(lit(1)).as("nd"))
    docGram.join(docFreq, "gh")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("nd") >= minDocs, col("c")).otherwise(lit(0L)))
          .as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_grams").cast("double"))
          .as("boiler_frac"))
  }

  /** Corpus n-gram vocabulary induction stats: the `topK` token n-grams by
    * corpus term frequency, with document frequency alongside — the
    * counting step of a BPE-style merge table (n = 2 ranks merge
    * candidates) and the inspection surface for corpus-wide boilerplate.
    * Deterministic: ties at the cut break on the gram string, so the same
    * corpus yields the same table in any engine.
    *
    * Shape: explode → one map-side-combined aggregate keyed on the gram
    * (tf = count, df = distinct docs via the standard two-phase expansion),
    * then a global TakeOrdered of k rows — no full sort materializes. */
  def ngramVocab(docs: DataFrame, n: Int = 2, topK: Int = 100): DataFrame = {
    require(n >= 1 && topK >= 1, "need n >= 1 and topK >= 1")
    val toks = wsTokens(col("text"))
    // all occurrences (NOT distinct — tf counts repeats within a doc)
    val grams = docs.select(col("doc_id"),
      explode(graft.dedup.Dedup.shinglesAll(col("text"), n)).as("ngram"))
    grams.groupBy(col("ngram"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("ngram"))
      .limit(topK)
  }

  /** Rolling polynomial fingerprint over the token sequence:
    * `acc = (acc*31 + md5Int32(token)) mod P` with P = 1e12+39 (prime; keeps
    * every intermediate < 3.2e13, exact in int64 on any engine). Equal
    * fingerprints ⇔ equal token sequences (mod collisions) — the cheap
    * near-exact-dup key for a 100 TB corpus: one narrow map + one groupBy
    * on an 8-byte key instead of text-length shuffles. */
  val FingerprintMod = 1000000000039L

  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // native codegen fold — the declarative aggregate() HOF ran
      // interpreted (closure + boxed Long per token in the hottest text map)
      graft.functions.FingerprintFold
        .fingerprint_fold(wsTokens(col("text")), FingerprintMod)
        .as("fp"))

  /** Bigram language-model quality score — the CCNet-style "rank documents
    * by LM cross-entropy" filter (Wenzek et al. 2020, arXiv:1911.00359),
    * re-expressed in integer arithmetic so the score is bit-identical on
    * any engine. With add-one smoothing, a bigram's negative log2
    * probability is log2((c(w1)+V)/(c(w1 w2)+1)); this uses the floor-log2
    * proxy `bits(x) = length(bin(x)) - 1` (exact — a string length of the
    * binary expansion, no float log anywhere; Math.log/ln is NOT
    * correctly-rounded and diverges across engines, which would break the
    * oracle hash). Score = mean proxy bits per bigram: high = surprising
    * under the corpus LM (rare constructions, noise), low = fluent/common.
    *
    * Scale: the corpus n-gram count tables are the LM; both joins are
    * key-partitioned shuffles on the gram (the standard distributed LM
    * scoring shape — counts sharded by gram, never driver-held), and the
    * per-doc aggregate is map-side combined. Docs with < 2 tokens have no
    * bigrams and drop, same as [[repetition]]. */
  /** Self-scored variant: the corpus is its own LM (every gram count ≥ 1).
    * Because train == score, the bigram table is tokenized ONCE and its
    * count `c12` comes from a window over that same table (one bigram-keyed
    * exchange) instead of the two-corpus form's second tokenization pass +
    * count join — observationally identical (the window counts the same
    * rows the join's aggregate would), one fewer corpus scan. */
  def lmBits(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c1 = docs.select(explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).as("vocab"))
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    docBigrams(docs)
      .withColumn("c12",
        count(lit(1)).over(Window.partitionBy(col("bigram"))))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(c1, col("w1") === col("tok"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        (bits(coalesce(col("c1"), lit(0L)) + col("vocab"))
          - bits(col("c12") + 1)).as("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("b")).as("sum_bits"))
      .withColumn("mean_bits",
        col("sum_bits").cast("double") / col("n_bigrams").cast("double"))
  }

  private def docBigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.dedup.Dedup.shinglesAll(col("text"), 2)).as("bigram"))

  /** Two-corpus form — the actual CCNet shape: the LM counts come from
    * `train` (the clean reference corpus), `score` is the corpus being
    * ranked. Grams absent from the training counts contribute their full
    * add-one surprisal (`c=0` → bits(V) − bits(1)), so out-of-domain text
    * scores high — the signal the filter exists for. */
  def lmBits(train: DataFrame, score: DataFrame): DataFrame = {
    val c1 = train.select(explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    // V as a lazy 1-row aggregate cross-joined in (the DuckDB oracle's
    // `CROSS JOIN v` shape) — no eager job at build time, and the vocab
    // count rides on c1's existing exchange instead of a second corpus pass
    val v = c1.agg(count(lit(1)).as("vocab"))
    val c12 = docBigrams(train).groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    docBigrams(score)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(c12, Seq("bigram"), "left")
      .join(c1, col("w1") === col("tok"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        (bits(coalesce(col("c1"), lit(0L)) + col("vocab"))
          - bits(coalesce(col("c12"), lit(0L)) + 1)).as("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("b")).as("sum_bits"))
      .withColumn("mean_bits",
        col("sum_bits").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Trigram Stupid-Backoff LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the higher-order upgrade
    * of [[lmBits]]: a position is scored by its trigram if the training
    * corpus has seen it, else backs off to the bigram, else to the
    * add-one unigram, each backoff step paying a fixed penalty. Stupid
    * Backoff is THE web-scale LM formulation precisely because its
    * scores are count ratios with a constant backoff factor — no
    * discount re-normalization pass over the count tables — which is
    * what makes it computable as three shuffled aggregations.
    *
    * Integer-exact ([[lmBits]] rule — no float log anywhere): a tier's
    * surprisal is `bits(contextCount) − bits(gramCount)` with
    * `bits(x) = length(bin(x)) − 1` (floor-log2), and the backoff factor
    * α = 0.4 becomes the integer penalty `BackoffPenaltyBits = 2` per
    * backed-off tier (⌈−log2 0.4⌉ = 2; the ceiling only shifts tiers by
    * a constant, order within a tier is untouched). A trigram present in
    * `train` guarantees its context bigram is too (every trigram
    * occurrence contains one), so tier arithmetic never sees NULL and
    * `bits(ctx) ≥ bits(gram)` holds by containment — scores are
    * non-negative by construction. OOV words pay the full add-one
    * unigram surprisal `bits(N+V) − bits(1)` plus both penalties.
    *
    * Scale: the three count tables are the sharded LM (gram-keyed
    * map-side-combined aggregates, never driver-held); scoring is five
    * key-partitioned left joins (c2 and c1 each reused under two keys)
    * plus one map-side-combined per-doc aggregate — the standard
    * distributed-LM-scoring shape at any corpus size. Docs with < 3
    * tokens have no trigram positions and drop, as in [[lmBits]]. */
  val BackoffPenaltyBits = 2L

  def lmBackoffBits(train: DataFrame, score: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    def grams(docs: DataFrame, n: Int, out: String): DataFrame =
      docs.filter(size(toks) >= n).select(col("doc_id"),
        explode(graft.dedup.Dedup.shinglesAll(col("text"), n)).as(out))
    val c1 = grams(train, 1, "tok").groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val totals = c1.agg(sum(col("c1")).as("n_tok"), count(lit(1)).as("vocab"))
    val c2 = grams(train, 2, "bg").groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c3 = grams(train, 3, "tri").groupBy(col("tri")).agg(count(lit(1)).as("c3"))
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val parts = split(col("tri"), " ")
    val pos = grams(score, 3, "tri").select(col("doc_id"), col("tri"),
      concat_ws(" ", parts.getItem(0), parts.getItem(1)).as("ctx2"),
      concat_ws(" ", parts.getItem(1), parts.getItem(2)).as("bg"),
      parts.getItem(1).as("ctx1"),
      parts.getItem(2).as("w"))
    val pen = lit(BackoffPenaltyBits)
    pos
      .join(c3, Seq("tri"), "left")
      .join(c2.toDF("ctx2", "c2ctx"), Seq("ctx2"), "left")
      .join(c2.toDF("bg", "c2bg"), Seq("bg"), "left")
      .join(c1.toDF("ctx1", "c1ctx"), Seq("ctx1"), "left")
      .join(c1.toDF("w", "c1w"), Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        when(col("c3").isNotNull, bits(col("c2ctx")) - bits(col("c3")))
          .when(col("c2bg").isNotNull,
            pen + bits(col("c1ctx")) - bits(col("c2bg")))
          .otherwise(pen * 2 + bits(col("n_tok") + col("vocab"))
            - bits(coalesce(col("c1w"), lit(0L)) + 1))
          .as("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"), sum(col("b")).as("sum_bits"))
      .withColumn("mean_bits",
        col("sum_bits").cast("double") / col("n_tri").cast("double"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * per language, split the corpus into head / middle / tail terciles by
    * LM score — low surprisal (fluent, Wikipedia-like) is `head`, high
    * surprisal (noise, boilerplate, OOV soup) is `tail`. The canonical
    * relative quality filter: downstream pipelines keep head+middle, or
    * sample the terciles at different rates.
    *
    * Tercile boundaries are VALUE thresholds, not row ranks: `c1` is the
    * smallest score whose cumulative doc count reaches ⌈n/3⌉, `c2` the
    * smallest reaching ⌈2n/3⌉; docs with equal scores always share a
    * bucket (CCNet's own percentile-threshold semantics). That definition
    * is what makes the shape scale: the corpus is never globally sorted —
    * the cumulative walk runs over the per-`(lang, score)` COUNT table
    * (bounded by distinct scores, aggregated map-side before its one keyed
    * shuffle), and the 2-cutoff-per-language result broadcasts back onto
    * the corpus as a range comparison. At 100 TB the distinct-score table
    * can be coarsened by pre-binning the score before the walk; the
    * per-document scan stays untouched either way.
    *
    * Scores are [[lmBits]] `mean_bits` — exact integer sums divided once,
    * so the doubles (and therefore every `<=` against the cutoffs) are
    * bit-identical across engines. */
  def pplBuckets(docs: DataFrame): DataFrame = {
    val scored = lmBits(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val hist = scored.groupBy(col("lang"), col("mean_bits"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("lang")).orderBy(col("mean_bits"))))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy(col("lang"))))
    val cutoffs = cum.groupBy(col("lang")).agg(
      min(when(col("cum") * 3 >= col("tot"), col("mean_bits"))).as("c1"),
      min(when(col("cum") * 3 >= col("tot") * 2, col("mean_bits"))).as("c2"))
    scored.join(broadcast(cutoffs), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("mean_bits"),
        when(col("mean_bits") <= col("c1"), lit("head"))
          .when(col("mean_bits") <= col("c2"), lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /** Word-association mining: the top-K bigrams by pointwise mutual
    * information (Church & Hanks 1990, "Word association norms, mutual
    * information, and lexicography"), the classic collocation detector —
    * used in pipeline analysis to surface boilerplate phrases, templated
    * spans, and domain jargon that per-token stats miss. PMI's exponential
    * is reported instead of its log: `lift = p(w1 w2) / (p(w1)·p(w2)) =
    * (c_ab·nu²) / (nb·c_a·c_b)` — a ratio of exact integer counts, so the
    * double is a deterministic IEEE chain (multiplications then one
    * division, identical association order in the oracle SQL) with no
    * transcendental log to diverge across engines (the [[lmBits]] rule).
    * `minCount` floors the bigram count, the standard guard against the
    * PMI rare-pair bias (a hapax bigram of two hapax words lifts to nu²/nb).
    *
    * Scale: both count tables are gram-keyed map-side-combined aggregates
    * (the distributed LM shape [[lmBits]] uses); the two unigram joins are
    * key-partitioned on the word, the corpus totals ride as 1-row
    * broadcasts, and the top-K is a TakeOrdered (no global sort). */
  def bigramLift(docs: DataFrame, minCount: Long = 5, topK: Int = 100): DataFrame = {
    val uni = docs.select(explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nu = uni.agg(sum(col("c")).as("nu"))
    val big = docBigrams(docs).groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
    val nb = big.agg(sum(col("c_ab")).as("nb"))
    big.filter(col("c_ab") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("tok").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(nu))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        ((col("c_ab").cast("double") * col("nu").cast("double") *
          col("nu").cast("double")) /
          (col("nb").cast("double") * col("c_a").cast("double") *
            col("c_b").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Heavy hitters: every token whose corpus frequency strictly exceeds
    * `total_tokens / k`, by the classic two-pass distributed Misra-Gries
    * scheme (Misra & Gries 1982; the MAX/SpaceSaving family of
    * streaming-frequency summaries).
    *
    * Pass 1 (candidates): each partition runs a Misra-Gries summary with
    * `k` counters over its tokens — O(k) memory regardless of partition
    * size. Any token with global frequency > n/k has local frequency >
    * n_p/k in at least one partition (averaging), and MG with k counters
    * retains every item whose local frequency exceeds local_n/k — so the
    * union of partition summaries contains ALL global heavy hitters (no
    * false negatives). This is genuine per-partition imperative state, the
    * one case where `mapPartitions` beats any Catalyst formulation: a full
    * `groupBy(token)` would shuffle the entire token multiset (the thing a
    * 100 TB corpus cannot afford), while candidates are ≤ k ×
    * numPartitions rows.
    *
    * Pass 2 (exact): re-count ONLY the candidates (a broadcast semi-join
    * pruned scan) and keep those with `freq * k > total`. The output is
    * exact and deterministic — the sketch only prunes, it never decides —
    * which is what makes the operator oracle-checkable against plain SQL.
    * Pass 1 also carries each partition's token count out as a sentinel
    * row, so `total` needs no third corpus scan.
    */
  /** Count-min sketch frequency estimation (Cormode & Muthukrishnan 2005,
    * "An improved data stream summary: the count-min sketch and its
    * applications") — the mergeable bounded-memory frequency summary next
    * to the KLL quantile sketch and Misra-Gries [[heavyHitters]]:
    * `depth` hash rows × `width` buckets of counts, `est(x) =
    * min_d sketch[d][h_d(x)]`. One-sided error: `est ≥ true` always
    * (collisions only ADD), and `est − true ≤ e·N/width` w.h.p. — the
    * 100 TB answer for per-key frequency under a fixed memory budget.
    *
    * Fully deterministic (row hashes are md5 of `"d:token"`), so the
    * DuckDB oracle REBUILDS the identical sketch and the estimates
    * hash-gate exactly — no rows-only concession like HLL sketches need.
    *
    * Shape: one corpus explode fanned ×depth, aggregated map-side to the
    * depth×width count table (broadcast-sized model state — the entire
    * point of a sketch); probing joins the top-K truth table × depth
    * against that broadcast. The corpus never shuffles un-reduced.
    * Output (gate-oriented): the `topK` true tokens with `true_count`
    * and `cms_est`, so the overestimate property is visible per row. */
  def cmsEstimates(docs: DataFrame, depth: Int = 4, width: Int = 512,
      topK: Int = 50): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth/width >= 1: $depth/$width")
    val toks = docs.select(explode(wsTokens(col("text"))).as("tok"))
    def bucket = pmod(md5Int32(
      concat(col("d").cast("string"), lit(":"), col("tok"))), lit(width.toLong))
    val sketch = toks
      .select(col("tok"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d"), bucket.as("b"))
      .groupBy(col("d"), col("b")).agg(count(lit(1)).as("c"))
    val truth = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("tok").asc).limit(topK)
    truth
      .select(col("tok"), col("true_count"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("b", bucket)
      .join(broadcast(sketch), Seq("d", "b"))
      .groupBy(col("tok"), col("true_count"))
      .agg(min(col("c")).as("cms_est"))
  }

  def heavyHitters(docs: DataFrame, k: Int = 200): DataFrame = {
    require(k >= 2, "need k >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(wsTokens(col("text"))).as("tok"))
    // pass 1 emits BOTH the candidate keys and the partition's token count
    // (as a null-key sentinel row) — total and candidates from ONE corpus
    // scan, so the whole operator reads the corpus exactly twice
    val pass1 = toks.select(col("tok")).as[String].mapPartitions { it =>
      // Misra-Gries with k-1 counters (guarantees freq > n/k retained)
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      it.foreach { t =>
        np += 1L
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < k - 1) counters(t) = 1L
        else {
          // decrement-all step; drop zeros
          val dead = List.newBuilder[String]
          counters.keysIterator.foreach { key =>
            val v = counters(key) - 1L
            if (v == 0L) dead += key else counters(key) = v
          }
          dead.result().foreach(counters.remove)
        }
      }
      Iterator.single((null: String, np)) ++ counters.keysIterator.map((_, 0L))
    }.collect()
    // pass1 is ≤ k rows per partition + one sentinel each — driver-bounded
    // metadata, collected ONCE so candidates and total don't each re-run
    // the corpus scan (two DataFrame branches over an unpersisted
    // mapPartitions would execute it twice, plus the recount: 3 scans)
    val total = pass1.iterator.collect { case (null, np) => np }.sum
    val candidates = pass1.iterator.collect { case (t, _) if t != null => t }
      .toSeq.distinct.toDF("tok")
    val counted = toks.join(broadcast(candidates), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    // integer cross-multiplied threshold: freq * k > total — no division
    counted
      .filter(col("freq") * k > total)
      .select(col("tok"), col("freq"), lit(total).as("total"))
  }

  /** DSIR-style importance scores for target-domain data selection (Xie
    * et al. 2023, arXiv:2302.03169): represent each document by hashed
    * n-gram features (unigrams + bigrams, md5-hashed into `buckets`
    * buckets), fit add-one-smoothed bag-of-features models over the
    * `target` and `raw` corpora, and score each raw document by the
    * importance log-ratio `log p_target(doc) − log p_raw(doc)` — high
    * score = looks like the target domain, so selecting the top-k
    * resamples raw data toward the target distribution.
    *
    * Arithmetic is the same floor-log2 bits proxy as [[lmBits]] (no float
    * log anywhere, so the score is bit-identical on any engine):
    * `score = Σ_f [bits(c_t(f)+1) − bits(c_r(f)+1)]
    *          + n_feats × [bits(T_r + B) − bits(T_t + B)]`
    * where `c_x(f)` are corpus feature counts, `T_x` their totals, and
    * `B = buckets` the add-one mass.
    *
    * Output: one row per raw document, `(doc_id, n_feats, score,
    * selected)` with `selected = 1` for the `selectK` highest scores
    * (ties broken by doc_id).
    *
    * Scale (100 TB): the feature map is a narrow explode; both count
    * tables aggregate to exactly `buckets` rows — broadcast-sized model
    * state, the entire point of DSIR's hashed features — so scoring is a
    * map-stage broadcast join against the corpus (the corpus never
    * shuffles to be scored) plus one map-side-combined doc_id aggregate.
    * Selection reuses the salted two-phase top-k (per-slice row_number,
    * then a global rank over ≤ slices × k survivors) — no single-reducer
    * sort of the scored corpus. */
  def dsirScores(target: DataFrame, raw: DataFrame, buckets: Int = 256,
      selectK: Int = 100, slices: Int = 32): DataFrame = {
    def features(docs: DataFrame): DataFrame = {
      import graft.functions.Md5Shingles.md5_shingles
      // unigrams ++ bigrams through the native multiset hasher at
      // md5Int32 width (r18): same feature hash values as exploding the
      // token/bigram strings and hashing each, without the interpreted
      // transform/concat_ws chain
      docs.select(col("doc_id"),
        explode(concat(md5_shingles(col("text"), 1, distinct = false, digits = 8),
          md5_shingles(col("text"), 2, distinct = false, digits = 8))).as("g"))
        .select(col("doc_id"), pmod(col("g"), lit(buckets.toLong)).as("b"))
    }
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val ft = features(target)
    val fr = features(raw)
    val ct = ft.groupBy(col("b")).agg(count(lit(1)).as("c_t"))
    val cr = fr.groupBy(col("b")).agg(count(lit(1)).as("c_r"))
    val totals = ct.agg(sum(col("c_t")).as("t_t"))
      .crossJoin(cr.agg(sum(col("c_r")).as("t_r")))
    val scored = fr
      .join(broadcast(ct), Seq("b"), "left")
      .join(broadcast(cr), Seq("b"), "left")
      .select(col("doc_id"),
        (bits(coalesce(col("c_t"), lit(0L)) + 1)
          - bits(coalesce(col("c_r"), lit(0L)) + 1)).as("d"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("d")).as("sum_d"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_feats"),
        (col("sum_d") + col("n_feats")
          * (bits(col("t_r") + buckets.toLong) - bits(col("t_t") + buckets.toLong)))
          .as("score"))
      // consumed TWICE (top-k selection + the final score join): an EAGER
      // localCheckpoint materializes the feature explode + broadcast
      // scoring pass exactly once, HERE, so both branches read the
      // checkpoint — and unlike persist(), it does not register with the
      // CacheManager, so a later identical call re-pays the real cost
      // instead of silently reusing a cache another invocation left
      // behind (the r10 bench showed a 4.08s-first / 0.60s-min split
      // that was cross-run cache reuse masquerading as steady-state) —
      // the Graph.scala iteration discipline applied to a two-consumer DAG
      .localCheckpoint()
    // salted two-phase top-k selection (same shape as Similarity's ANN
    // ranking): the global window only ever sees slice-local survivors
    val order = Seq(col("score").desc, col("doc_id").asc)
    val local = scored
      .withColumn("salt", pmod(spark_partition_id(), lit(slices)))
      .withColumn("lr", row_number().over(
        Window.partitionBy(col("salt")).orderBy(order: _*)))
    val chosen = local.filter(col("lr") <= selectK)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .filter(col("rank") <= selectK)
      .select(col("doc_id"), lit(1L).as("selected"))
    scored.join(broadcast(chosen), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_feats"), col("score"),
        coalesce(col("selected"), lit(0L)).as("selected"))
  }

  /** Chi-square (χ²) feature selection over token document-presence (Yang &
    * Pedersen 1997, "A comparative study on feature selection in text
    * categorization" — χ² was their top-scoring selector): rank every token
    * by how strongly its presence discriminates the `posLang` class from the
    * rest, the standard first step before training a quality/domain
    * classifier on a corpus.
    *
    * Per token, the 2×2 contingency table over document presence is
    * `a` (pos docs containing), `b` (neg containing), `c = nPos − a`,
    * `d = nNeg − b`, and `χ² = n·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`.
    * Every cell is an exact integer; the double is the [[bigramLift]]
    * deterministic-IEEE-chain form — factors cast individually, identical
    * multiply/divide order in the oracle SQL — so it hash-gates exactly.
    * `ad − bc` is computed in int64 and guarded in-plan (the [[bigramLift]]
    * / bm25 loud-overflow rule): it wraps once nPos·nNeg exceeds int64, so
    * past ~3e9 docs per class the plan raises instead of corrupting ranks.
    * Tokens present in EVERY document (c+d = 0 ⇒ 0/0 = NaN, whose sort
    * order differs across engines) are excluded — a token carried by every
    * doc has no selective power by definition.
    *
    * Scale: presence is a narrow `array_distinct` explode fused into the
    * scan; the only shuffle is the token-keyed count (map-side combined);
    * class totals ride as a 1-row broadcast; top-K is a TakeOrdered, never
    * a global sort. */
  def chiSquareTokens(docs: DataFrame, posLang: String = "en",
      minDf: Long = 5, topK: Int = 100): DataFrame = {
    require(topK >= 1 && minDf >= 1, s"need topK/minDf >= 1: $topK/$minDf")
    val pres = docs.select(col("lang"),
      explode(array_distinct(wsTokens(col("text")))).as("tok"))
    val counts = pres.groupBy(col("tok")).agg(
      sum(when(col("lang") === posLang, 1L).otherwise(0L)).as("a"),
      sum(when(col("lang") =!= posLang, 1L).otherwise(0L)).as("b"))
    val totals = docs.agg(
      sum(when(col("lang") === posLang, 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("lang") =!= posLang, 1L).otherwise(0L)).as("n_neg"))
    counts.crossJoin(broadcast(totals))
      .filter(col("a") + col("b") >= minDf)
      .withColumn("c", col("n_pos") - col("a"))
      .withColumn("d", col("n_neg") - col("b"))
      .filter(col("c") + col("d") > 0)
      // a·d and b·c are each ≤ nPos·nNeg; bounding both totals by
      // floor(sqrt(Long.Max)) keeps the products (and so their
      // difference, both non-negative) inside int64 exactly
      .withColumn("diff",
        when(col("n_pos") <= 3037000499L && col("n_neg") <= 3037000499L,
          col("a") * col("d") - col("b") * col("c"))
          .otherwise(raise_error(lit(
            "chiSquareTokens contingency product overflows int64 past ~3e9 docs per class"))))
      .select(col("tok"), col("a").as("df_pos"), col("b").as("df_neg"),
        (((col("n_pos") + col("n_neg")).cast("double")
          * col("diff").cast("double") * col("diff").cast("double"))
          / ((col("a") + col("b")).cast("double")
            * (col("c") + col("d")).cast("double")
            * col("n_pos").cast("double")
            * col("n_neg").cast("double"))).as("chi2"))
      .orderBy(col("chi2").desc, col("tok").asc)
      .limit(topK)
  }

  /** Skip-gram co-occurrence counts (Mikolov et al. 2013 word2vec data
    * prep; with the distance column kept this is also the GloVe
    * co-occurrence matrix before its 1/d weighting): for every ordered
    * token pair at positional distance `d ∈ [1, window]` within a document,
    * the corpus-wide count — the raw statistic embedding trainers,
    * collocation miners, and distributional-similarity measures consume.
    * [[bigramLift]] is the `window = 1` PMI special case; this emits the
    * full (w1, w2, dist) surface so the consumer chooses the weighting.
    *
    * Shape: pair generation is a pure array expression — `transform` over
    * the distance range nested in `transform` over positions, flattened
    * and exploded — so it fuses into the scan with NO join and NO shuffle
    * before the single map-side-combined count aggregate. Fan-out is
    * exactly `window` rows per token (bounded, corpus-linear); the
    * alternative positional self-join would shuffle the exploded corpus
    * twice. `minCount` prunes the hapax tail before the result
    * materializes. */
  def skipGramPairs(docs: DataFrame, window: Int = 3,
      minCount: Long = 2): DataFrame = {
    require(window >= 1, s"need window >= 1: $window")
    val toks = wsTokens(col("text"))
    val pairT = "array<struct<w1:string,w2:string,dist:bigint>>"
    docs
      .select(explode(flatten(transform(
        sequence(lit(1), lit(window)),
        d => when(size(toks) > d,
          transform(sequence(lit(0), size(toks) - d - 1), i =>
            struct(
              element_at(toks, i + 1).as("w1"),
              element_at(toks, i + d + 1).as("w2"),
              d.cast("long").as("dist"))))
          .otherwise(array().cast(pairT))))).as("p"))
      .select(col("p.w1"), col("p.w2"), col("p.dist"))
      .groupBy(col("w1"), col("w2"), col("dist"))
      .agg(count(lit(1)).as("pairs"))
      .filter(col("pairs") >= minCount)
  }

  /** Multinomial Naive Bayes language classification with hashed token
    * features (McCallum & Nigam 1998, "A comparison of event models for
    * Naive Bayes text classification"; hashing per Weinberger et al. 2009):
    * fit per-class add-one-smoothed feature counts on `train`, score every
    * `test` document against every class, and emit the argmax prediction
    * next to the true label — the classifier-inference shape quality/domain
    * filters run over a whole corpus (fastText-style: linear scores over
    * hashed bags of words).
    *
    * Scoring is the [[lmBits]]/[[dsirScores]] integer floor-log2 proxy, so
    * scores and the argmax are bit-identical across engines:
    * `score_L = Σ_b m_b·bits(c_L(b)+1) − n_feats·bits(T_L + B) +
    * bits(docs_L)` (the last term the class prior). Ties break on lang asc.
    *
    * Scale (100 TB): the model is `|classes| × buckets` count rows —
    * broadcast-sized by construction, the point of hashed features. Test
    * docs reduce FIRST to (doc_id, bucket, multiplicity) via a
    * map-side-combined aggregate, so the ×|classes| scoring fan-out
    * multiplies the reduced table (≤ docs×buckets rows), not the raw token
    * stream; per-class scores aggregate keyed on (doc, class) and the
    * argmax is a row_number over |classes| rows per doc — every stage is
    * keyed, nothing collects. */
  def nbClassify(train: DataFrame, test: DataFrame,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"need buckets >= 1: $buckets")
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    def feats(docs: DataFrame, key: Column): DataFrame =
      docs.select(key.as("k"), explode(wsTokens(col("text"))).as("tok"))
        .select(col("k"),
          pmod(md5Int32(col("tok")), lit(buckets.toLong)).as("b"))
    val ftrain = feats(train, col("lang"))
    val model = ftrain.groupBy(col("k").as("cand"), col("b"))
      .agg(count(lit(1)).as("c"))
    val clsTot = ftrain.groupBy(col("k").as("cand"))
      .agg(count(lit(1)).as("t"))
    val prior = train.groupBy(col("lang").as("cand"))
      .agg(count(lit(1)).as("n_docs"))
    val fd = feats(test, col("doc_id"))
      .groupBy(col("k").as("doc_id"), col("b"))
      .agg(count(lit(1)).as("m"))
    val scored = fd
      .crossJoin(broadcast(prior.select(col("cand"))))
      .join(broadcast(model), Seq("cand", "b"), "left")
      .groupBy(col("doc_id"), col("cand"))
      .agg(sum(col("m")).as("n_feats"),
        sum(col("m") * bits(coalesce(col("c"), lit(0L)) + 1)).as("sum_bits"))
      .join(broadcast(clsTot), Seq("cand"))
      .join(broadcast(prior), Seq("cand"))
      .select(col("doc_id"), col("cand"),
        (col("sum_bits") - col("n_feats") * bits(col("t") + buckets.toLong)
          + bits(col("n_docs"))).as("score"))
    val top = scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cand").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cand").as("predicted"), col("score"))
    top.join(test.select(col("doc_id"), col("lang").as("true_lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("true_lang"), col("predicted"), col("score"),
        when(col("predicted") === col("true_lang"), 1L).otherwise(0L)
          .as("correct"))
  }

  /** Distinctive terms per group ("keyness" / fightin'-words analysis —
    * Monroe, Colaresi & Quinn 2008, "Fightin' Words: Lexical Feature
    * Selection and Evaluation for Identifying the Content of Political
    * Conflict"): for each `group` value, the top-K tokens whose
    * add-one-smoothed rate in the group most exceeds their rate in the
    * REST of the corpus — the "what is this source actually about" report
    * behind per-domain quality review and topic drift monitoring.
    * [[chiSquareTokens]] ranks one class's features by significance; this
    * profiles EVERY group at once by effect direction.
    *
    * Score is the [[lmBits]] integer floor-log2 log-odds proxy:
    * `[bits(c_g+1) − bits(T_g+V)] − [bits(c_rest+1) − bits(T_rest+V)]`
    * with V the corpus vocabulary size as the add-one mass — exact
    * integers, ties on tok asc, so per-group rankings are
    * engine-identical.
    *
    * Scale: one (group, token)-keyed count (map-side combined), a
    * token-keyed rollup JOINED BACK keyed on token (never broadcast — the
    * vocabulary is corpus-sized), group totals and the 1-row corpus
    * totals as broadcasts, and a per-group top-K window that
    * short-circuits via WindowGroupLimit. */
  def groupWords(docs: DataFrame, group: String = "source",
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"need topK >= 1: $topK")
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val toks = docs.select(col(group).as("grp"),
      explode(wsTokens(col("text"))).as("tok"))
    val byGrp = toks.groupBy(col("grp"), col("tok"))
      .agg(count(lit(1)).as("c_g"))
    val byTok = byGrp.groupBy(col("tok")).agg(sum(col("c_g")).as("c_all"))
    val grpTot = byGrp.groupBy(col("grp")).agg(sum(col("c_g")).as("t_g"))
    val totals = byTok.agg(sum(col("c_all")).as("t_all"),
      count(lit(1)).as("vocab"))
    byGrp.join(byTok, "tok")
      .join(broadcast(grpTot), "grp")
      .crossJoin(broadcast(totals))
      .withColumn("c_rest", col("c_all") - col("c_g"))
      .withColumn("t_rest", col("t_all") - col("t_g"))
      .withColumn("score",
        (bits(col("c_g") + 1) - bits(col("t_g") + col("vocab")))
          - (bits(col("c_rest") + 1) - bits(col("t_rest") + col("vocab"))))
      .withColumn("rk", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("score").desc, col("tok").asc)).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("grp"), col("rk"), col("tok"), col("c_g"), col("score"))
  }

  /** Vocabulary coverage curve — the tokenizer-design question "how many
    * vocabulary entries cover X% of corpus tokens": for each percentage
    * threshold, the smallest top-frequency vocabulary prefix whose
    * occurrence mass reaches it (Zipf's law makes this curve the budget
    * chart every BPE vocab-size decision reads).
    *
    * Scale-honest decomposition: tokens with EQUAL counts are
    * interchangeable for coverage, so instead of a global sort of the
    * (possibly billions-row) vocabulary, the cumulative runs over the
    * count HISTOGRAM — |distinct count values| rows, a metadata-sized
    * table (the [[graft.operators.RobustStats.globalRank]] bucket trick
    * applied to frequencies; the unpartitioned window is bounded by that
    * histogram, never by the vocabulary). Within the bracketing count
    * class the needed entries are a ceiling division — all integer:
    * `target = ceil(total·pct/100)`, `k = prev_vocab +
    * ceil((target − prev_toks)/c)`. */
  def vocabCoverage(docs: DataFrame,
      thresholds: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(p => p >= 1 && p <= 100),
      s"thresholds must be in [1,100]: $thresholds")
    val cnt = docs.select(explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val hist = cnt.groupBy(col("c")).agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("c").desc)
    val cum = hist
      .withColumn("cum_toks", sum(col("c") * col("m")).over(w))
      .withColumn("cum_vocab", sum(col("m")).over(w))
      .withColumn("prev_toks", col("cum_toks") - col("c") * col("m"))
      .withColumn("prev_vocab", col("cum_vocab") - col("m"))
    // total rides the SAME histogram sort as the cumulative (full
    // frame): a 1-row aggregate branch would re-run the token count —
    // two corpus scans — since Spark duplicates shared plan subtrees
    val allRows = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum.withColumn("total", sum(col("c") * col("m")).over(allRows))
      .withColumn("pct", explode(typedLit(thresholds.map(_.toLong))))
      .withColumn("target", expr("(total * pct + 99) div 100"))
      .filter(col("prev_toks") < col("target")
        && col("target") <= col("cum_toks"))
      .withColumn("needed",
        expr("(target - prev_toks + c - 1) div c"))
      .select(col("pct"),
        (col("prev_vocab") + col("needed")).as("vocab_size"),
        (col("prev_toks") + col("needed") * col("c")).as("tokens_covered"),
        col("total").as("total_tokens"))
  }

  /** Per-class precision/recall evaluation of [[nbClassify]] — the
    * measure-before-deploy step every corpus filter needs: a quality or
    * language classifier with 99% precision on `en` but 40% recall on `fr`
    * silently skews the training mixture, and this report is where that
    * shows up. Emits, per class: `tp` (predicted = true = class), `fp`
    * (predicted class, true differs), `fn` (true class, predicted
    * differs), and precision/recall as single divisions of those exact
    * counts. Classes never predicted report NULL precision (0/0 — the
    * honest value, matching SQL division semantics); classes absent from
    * the test set report NULL recall.
    *
    * Scale: the prediction pass is [[nbClassify]]'s (broadcast model, all
    * keyed); the eval itself is two |classes|-row aggregates full-outer
    * joined — metadata-sized. */
  def nbEvaluate(train: DataFrame, test: DataFrame,
      buckets: Int = 256): DataFrame = {
    val pred = nbClassify(train, test, buckets)
    val byPred = pred.groupBy(col("predicted").as("lang"))
      .agg(sum(col("correct")).as("tp_p"), count(lit(1)).as("pred_n"))
    val byTrue = pred.groupBy(col("true_lang").as("lang"))
      .agg(sum(col("correct")).as("tp_t"), count(lit(1)).as("true_n"))
    byTrue.join(byPred, Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("tp_t"), col("tp_p"), lit(0L)).as("tp"),
        (coalesce(col("pred_n"), lit(0L))
          - coalesce(col("tp_p"), lit(0L))).as("fp"),
        (coalesce(col("true_n"), lit(0L))
          - coalesce(col("tp_t"), lit(0L))).as("fn"),
        (coalesce(col("tp_p"), lit(0L)).cast("double")
          / col("pred_n").cast("double")).as("precision"),
        (coalesce(col("tp_t"), lit(0L)).cast("double")
          / col("true_n").cast("double")).as("recall"))
  }

  /** Per-source corpus diversity over the language distribution — the
    * "is this source monolingual spam or a balanced crawl" governance
    * panel a mixture designer reads before assigning sampling weights:
    * Simpson concentration `λ = Σ nᵢ(nᵢ−1) / (N(N−1))` (the exact
    * probability two random docs from the source share a language —
    * 1 ⇔ monolingual, 1/k ⇔ k balanced languages) and the Shannon
    * diversity in the engine's floor-log2 bits proxy
    * (`ent_bits = N·bits(N) − Σ nᵢ·bits(nᵢ)`, the [[tokenEntropy]]
    * identity over languages instead of tokens).
    *
    * Exactness: λ's numerator and denominator accumulate in
    * DECIMAL(38,0) (no int64 wrap at any corpus size) and λ is ONE
    * double division, NULL for single-doc sources (0/0); `ent_bits` is
    * pure int64 (N·bits(N) ≤ n·63).
    *
    * Scale: a (source, lang)-keyed count — |sources|·|langs| rows,
    * metadata-sized — then a per-source aggregate; the corpus is
    * scanned once and shuffles only the counted pairs. */
  def sourceDiversity(docs: DataFrame): DataFrame = {
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_langs"),
        sum(col("c") * bits(col("c"))).as("sb"),
        sum(dec(col("c")) * dec(col("c") - 1L)).as("pair_num"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        (col("n_docs") * bits(col("n_docs")) - col("sb")).as("ent_bits"),
        when(col("n_docs") > 1,
          col("pair_num").cast("double")
            / (dec(col("n_docs")) * dec(col("n_docs") - 1L)).cast("double"))
          .as("simpson"))
  }

  /** Chao1 vocabulary-richness estimate (Chao 1984, "Nonparametric
    * estimation of the number of classes in a population") from the
    * token count histogram: how many token types the corpus WOULD show
    * with unbounded sampling — the "how much unseen vocabulary remains"
    * companion to [[vocabCoverage]] (which reads the seen distribution).
    * Uses the bias-corrected form `V + F₁(F₁−1) / (2(F₂+1))` (defined
    * even when no doubletons exist), where F₁/F₂ are the singleton /
    * doubleton type counts: many singletons relative to doubletons ⇒
    * the crawl is still discovering vocabulary.
    *
    * Exactness: V/F₁/F₂ are exact counts, F₁(F₁−1) accumulates in
    * DECIMAL(38,0), and the estimate is ONE double division plus one
    * addition — identical on any engine.
    *
    * Scale: token counts are the [[vocabCoverage]] aggregation; the
    * histogram-of-counts is ≤ |distinct counts| rows, and the final
    * reduce is a 1-row aggregate. Nothing vocabulary-sized sorts. */
  def chao1Richness(docs: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    docs.select(explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("vocab"), col("f1"), col("f2"),
        (col("vocab").cast("double") +
          (dec(col("f1")) * dec(col("f1") - 1L)).cast("double")
            / (lit(2L) * (col("f2") + 1L)).cast("double")).as("chao1"))
  }
  /** Simple Good–Turing frequency-of-frequencies table (Good 1953; Gale &
    * Sampson 1995, "Good-Turing frequency estimation without tears") over
    * word `n`-grams: for each low count `r`, how many gram types occur
    * exactly `r` times (`n_r`), the adjusted Turing count
    * `r* = (r+1)·n_{r+1}/n_r`, and the unseen-mass estimate `p0 = n_1/N`
    * — the smoothing table every count-based LM ([[lmBits]],
    * [[lmBackoffBits]]) reads to decide how much probability the corpus
    * still owes to unseen events. Defaults to trigrams, the gram order
    * [[lmBackoffBits]] backs off from (unigrams in a crawl are all
    * high-count; the low-r tail GT describes lives in the higher orders).
    *
    * Exactness: all counts are exact; `r*` and `p0` are each ONE double
    * division of DECIMAL(38,0)-exact integers (guarded), identical on any
    * engine. `n_{r+1}` comes from a `lead` over the count histogram —
    * 0 when the next count class is absent (the raw-Turing convention;
    * Gale–Sampson's smoothed fallback is a caller-side fit).
    *
    * Scale: the frequency-of-frequencies table is |distinct count
    * values| rows — metadata-sized (the [[vocabCoverage]] bounded-window
    * rule), so the global lead/total windows never see the gram
    * vocabulary, only its count histogram. */
  def goodTuring(docs: DataFrame, n: Int = 3, maxR: Int = 10): DataFrame = {
    require(n >= 1, s"need n >= 1: $n")
    require(maxR >= 1, s"need maxR >= 1: $maxR")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"goodTuring: $what exceeds the exact DECIMAL(38) bound")))
    val toks = wsTokens(col("text"))
    val hist = docs.filter(size(toks) >= n)
      .select(explode(graft.dedup.Dedup.shinglesAll(col("text"), n)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("r"))
      .groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    val byR = Window.orderBy(col("r").asc)
    val full = byR.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("total", sum(dec(col("r")) * dec(col("n_r"))).over(full))
      .withColumn("n1",
        sum(when(col("r") === 1L, col("n_r")).otherwise(lit(0L))).over(full))
      .withColumn("r_next", lead(col("r"), 1).over(byR))
      .withColumn("n_next", lead(col("n_r"), 1).over(byR))
      .filter(col("r") <= maxR)
      .withColumn("n_r1",
        when(col("r_next") === col("r") + 1L, col("n_next")).otherwise(lit(0L)))
      .select(col("r"), col("n_r"), col("n_r1"),
        ((dec(col("r") + 1L) * dec(col("n_r1"))).cast("double")
          / col("n_r").cast("double")).as("r_star"),
        (col("n1").cast("double")
          / exact(col("total"), "token total").cast("double")).as("p0"))
  }

  /** Banded Zipf-law fit per source: the least-squares slope of
    * floor-log2(frequency) against floor-log2(rank) over each source's
    * top-`topK` tokens (Zipf 1949; slope ≈ −s of `f ∝ r^−s`) — the
    * one-number "is this source natural language or boilerplate/spam"
    * distribution check next to [[sourceDiversity]]: natural text sits
    * near −1, template spam flattens, ID dumps steepen.
    *
    * Exactness: both axes are floor-log2 INTEGER bands (the
    * `length(bin(x))−1` identity shared with [[groupWords]]), the OLS
    * sufficient statistics accumulate in DECIMAL(38,0) with guards, and
    * the slope is ONE double division — identical on any engine. The
    * banding makes this a fit of the log-log STAIRCASE, disclosed in the
    * name; rank banding collapses [2^k, 2^k+1) to one x, which is the
    * resolution trade, not an approximation of the banded statistic.
    *
    * Scale: per-source top-K needs the per-source rank window over the
    * (source, token) counts — the [[groupWords]] cost, accepted there;
    * everything after is ≤ topK rows per source. */
  def zipfSlope(docs: DataFrame, topK: Int = 128): DataFrame = {
    require(topK >= 2, s"need topK >= 2: $topK")
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"zipfSlope: $what exceeds the exact DECIMAL(38) bound")))
    val pts = docs
      .select(col("source"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("tok").asc)).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("source"), dec(bits(col("rk"))).as("x"),
        dec(bits(col("c"))).as("y"))
    val stats = pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val den = exact(dec(col("n")) * col("sxx") - col("sx") * col("sx"),
      "n*sxx - sx*sx")
    val num = exact(dec(col("n")) * col("sxy") - col("sx") * col("sy"),
      "n*sxy - sx*sy")
    stats.select(col("source"), col("n"),
      when(den > 0, num.cast("double") / den.cast("double")).as("slope"))
  }
  /** NFC normalization of a column — [[graft.functions.UnicodeNorm]]. */
  def nfc(text: Column): Column =
    graft.functions.UnicodeNorm.unicode_norm(text, "NFC")

  /** Combining-mark accent stripping: NFD, drop the `Mn` category, NFC —
    * value-identical to DuckDB's `strip_accents(nfc_normalize(x))` for
    * combining-sequence accents (é/ü/ñ …). Deliberately does NOT fold
    * single-codepoint letters (ø, ß): that is a locale policy table, not
    * Unicode normalization. */
  def stripMarks(text: Column): Column =
    graft.functions.UnicodeNorm.unicode_norm(
      regexp_replace(
        graft.functions.UnicodeNorm.unicode_norm(text, "NFD"),
        "\\p{Mn}", ""),
      "NFC")

  /** Per-language Unicode canonicalization audit — the "how much of this
    * corpus is byte-divergent for the same logical text" report run
    * before any hash-keyed dedup: per lang, document count, codepoint
    * counts before/after NFC, how many documents NFC actually changed,
    * how many accent stripping changed beyond NFC, and the normalized /
    * stripped head of the lexicographically-first document (a direct
    * cross-engine check of the normalized BYTES, not just lengths).
    *
    * `decomposedPrefix` exists because a SYNTHETIC corpus can be pure
    * ASCII end to end, which would make every column a trivial identity:
    * the default prepends a fixed decomposed "Cafe" + U+0301 + space to
    * every document, so the audit exercises the real composition path on
    * any corpus deterministically (disclosed in the gate comment; pass
    * "" to audit the corpus as-is).
    *
    * Scale: one narrow projection + one lang-keyed aggregate; the
    * normalization is the [[graft.functions.UnicodeNorm]] codegen
    * expression with its ASCII fast-path, so the audit is scan-bound. */
  def unicodeAudit(docs: DataFrame,
      decomposedPrefix: String = "Cafe\u0301 "): DataFrame = {
    val aug = concat(lit(decomposedPrefix), col("text"))
    docs
      .select(col("lang"), aug.as("t"), nfc(aug).as("tn"),
        stripMarks(aug).as("ts"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("t"))).as("raw_chars"),
        sum(length(col("tn"))).as("nfc_chars"),
        sum(when(col("tn") =!= col("t"), 1L).otherwise(0L)).as("changed_nfc"),
        sum(when(col("ts") =!= col("tn"), 1L).otherwise(0L))
          .as("changed_strip"),
        min(substring(col("tn"), 1, 8)).as("nfc_head"),
        min(substring(col("ts"), 1, 8)).as("strip_head"))
  }
  /** Padding-waste audit for length-bucketed batching: when a training
    * batcher groups documents into `bandWidth`-token length buckets and
    * pads each document to its bucket's upper edge, how many pad tokens
    * does each bucket burn? Per band: document count, real tokens, the
    * padded cost `docs · band_upper`, the waste, and the waste fraction
    * (ONE double division of exact integers) — the audit that decides
    * band width before a packing run ([[graft.operators.Packing]] is the
    * zero-waste alternative; this measures what naive bucketing costs).
    *
    * Scale: one narrow projection and one band-keyed aggregate. */
  def paddingWaste(docs: DataFrame, bandWidth: Long = 64L): DataFrame = {
    require(bandWidth >= 1, s"bandWidth must be >= 1: $bandWidth")
    docs.select((size(wsTokens(col("text")))).cast("long").as("len"))
      .select(col("len"), expr(s"len div $bandWidth").as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("docs"), sum(col("len")).as("tokens"))
      .withColumn("band_upper", (col("band") + 1L) * bandWidth)
      .withColumn("padded", col("docs") * col("band_upper"))
      .withColumn("waste", col("padded") - col("tokens"))
      .withColumn("waste_frac",
        col("waste").cast("double") / col("padded").cast("double"))
  }
  /** Per-language tokenizer fertility and compression — the
    * tokenizer-budget table every multilingual mixture decision reads
    * (Rust et al. 2021, "How good is your tokenizer?"): `fertility` =
    * subword tokens per whitespace word (high fertility means the
    * tokenizer fragments that language, inflating its effective cost
    * per character of training signal) and `chars_per_token` = non-space
    * characters per subword token (the compression rate that converts a
    * byte budget into a token budget). Uses the engine's BPE-ish regex
    * segmentation ([[BpeTokenPattern]], the [[stats]] convention); each
    * ratio is ONE double division of exact per-lang integer sums.
    *
    * Scale: one narrow projection, one lang-keyed aggregate. */
  def tokenizerFertility(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    docs.select(col("lang"),
        size(toks).cast("long").as("w"),
        regexp_count(col("text"), lit(BpeTokenPattern)).cast("long").as("b"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("w")).as("ws_tokens"),
        sum(col("b")).as("bpe_tokens"), sum(col("c")).as("chars"))
      .select(col("lang"), col("docs"), col("ws_tokens"), col("bpe_tokens"),
        col("chars"),
        when(col("ws_tokens") > 0,
          col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))
          .as("fertility"),
        when(col("bpe_tokens") > 0,
          col("chars").cast("double") / col("bpe_tokens").cast("double"))
          .as("chars_per_token"))
  }
}
