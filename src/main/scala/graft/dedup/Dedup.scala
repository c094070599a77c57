package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.StreamMessage
import graft.text.TextAnalysis.{md5Int32, md5Int60}

/** Deduplication operators for large-scale training-data pipelines: exact
  * (hash groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash, and the
  * broker's ingest-replay dedup (`dropDuplicates` on the message uniqueness
  * key — the Spark equivalent of the reference's Cassandra primary-key
  * upsert, SURVEY §2.6 / §7.4).
  *
  * Scale design: everything is expressed as narrow maps + key-partitioned
  * shuffles. At 100 TB the only all-pairs-shaped step is the LSH candidate
  * self-join, which shuffles on (band, bandKey) — cardinality ≈ corpus size ×
  * bands, with join fan-out bounded by bucket occupancy rather than n². The
  * exact-Jaccard verifier joins on shared shingles, which is the standard
  * candidate-generation trick (pairs only materialize where overlap exists).
  * Hashes are md5-derived so any engine (and the DuckDB oracle) reproduces
  * them bit-for-bit.
  */
object Dedup {

  /** All word k-gram shingles of a single-space-tokenized text in document
    * order (multiset — repeated spans keep their multiplicity); empty
    * array when the document has fewer than k tokens. */
  def shinglesAll(text: Column, k: Int = 3): Column =
    // native codegen expression (r18): same gram strings as the
    // transform/concat_ws window chain (each gram is a zero-copy byte
    // slice of the text), empty array below k tokens
    graft.functions.TokenGrams.token_grams(text, k)

  /** Distinct word k-gram shingles of a single-space-tokenized text; empty
    * array when the document has fewer than k tokens. */
  def shingles(text: Column, k: Int = 3): Column =
    array_distinct(shinglesAll(text, k))

  /** Exact dedup groups: one row per distinct text hash, with the canonical
    * (minimum) doc id and the duplicate count. One shuffle on a 16-byte key
    * regardless of document size. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Per-source duplication report: for each `source`, how many documents
    * it contributed and how many of them belong to a corpus-wide exact
    * duplicate group (group size > 1 over the [[exactGroups]] text hash) —
    * the "which domains are recycling content" audit every crawl-curation
    * pass runs before setting per-source quotas, and the natural monitor
    * next to [[exactDedup]] (which removes) and [[dupSizeHistogram]]
    * (which profiles sizes): this one ATTRIBUTES.
    *
    * `dup_rate` is one division of two exact counts. Duplication is
    * corpus-wide by design: a source copying another source's text counts
    * as duplicated even if unique within its own source.
    *
    * Scale: the group size rides a whole-partition count window over the
    * SAME 16-byte-hash shuffle the dedup family uses (no join, no second
    * scan), then a map-side-combined rollup to |sources| rows. */
  def dupRateBySource(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col("source"), md5(col("text")).as("text_hash"))
      .withColumn("gsz",
        count(lit(1)).over(Window.partitionBy(col("text_hash"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("gsz") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
      .withColumn("dup_rate",
        col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
  }

  /** Exact dedup: keep one row per distinct text (the minimum doc_id). */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.join(
      exactGroups(docs).select(col("canonical_id").as("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Ingest-replay dedup over the message uniqueness key (SURVEY §2.6;
    * key: `Storage.ts:109-112`). The reference's Cassandra upsert is
    * last-WRITE-wins; a batch engine has no arrival order inside a batch,
    * so the winner is chosen deterministically instead (max payload
    * lexicographically) — same observable semantics for true replays
    * (identical payloads), deterministic rather than arbitrary when a
    * redelivery mutated the body.
    *
    * `key` defaults to the full uniqueness key; callers operating inside a
    * single partition scope (e.g. bucket-level compaction, where stream_id
    * and stream_partition are directory levels, not columns) pass the
    * columns present in that scope. */
  def ingestDedup(streamData: DataFrame,
      key: Seq[String] = StreamMessage.uniqueKey): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // payload decides; the remaining envelope columns break payload ties —
    // a redelivery can carry the same body with a different signature or
    // group key, and without full-row ordering the surviving row would be
    // partition-read-order dependent (nondeterministic across runs)
    val tiebreakers = streamData.columns.toSeq
      .filterNot(key.contains).filterNot(_ == "payload")
      .sorted.map(col(_).desc_nulls_last)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("payload").desc +: tiebreakers: _*)
    streamData
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** (doc_id, shingle) pairs, distinct per document, with the shingle
    * hashed to a fixed-width 60-bit key — strings this hot in a join/
    * shuffle path should never travel as strings (collisions are ~2e-7 at
    * a million distinct shingles, and occur identically on any engine, so
    * oracle parity holds). Kept to exactly one expensive expression per
    * row: carrying derived columns (e.g. set sizes) alongside the explode
    * looks free but makes ProjectCollapse inline — and thus recompute —
    * the whole shingle array per reference. */
  private def shingleTable(docs: DataFrame, k: Int): DataFrame =
    // one native codegen expression ([[graft.functions.Md5Shingles]]):
    // the k-token windows are contiguous byte slices of the text, hashed
    // in place — replaces the interpreted transform/concat_ws/
    // array_distinct chain + per-gram md5Int60, value-identical by the
    // expression's contract (r18: this map dominated every shingle-keyed
    // operator's CPU)
    docs.select(col("doc_id"), explode(
      graft.functions.Md5Shingles.md5_shingles(col("text"), k, distinct = true))
      .as("shingle"))

  /** n-gram Jaccard similarity for all pairs sharing ≥1 shingle and
    * clearing `threshold`.
    *
    * With `maxDocFrequency = Some(cap)` (the production shape): shingles
    * present in more than `cap` documents are dropped — they carry no
    * near-dup signal but drive an O(df²) pair fan-out — then pairs
    * materialize exactly like the exact variant, via the shared-shingle
    * self-join of the kept table. The cap bounds the worst-case per-key
    * join fan-out at C(cap,2) rows, and the whole path stays inside
    * whole-stage codegen (no collected lists, no interpreted higher-order
    * functions).
    *
    * Uncapped (`None`): the exact variant — the same self-join with no df
    * filter (never n²; pairs only where overlap exists), with per-doc set
    * sizes carried ON the shingle rows and a lossless size-ratio
    * prefilter in the join condition (see the case body). Semantics-
    * changing cap => the two variants are gated by separate oracles.
    *
    * One shingle materialization per plan: the scan → explode → md5 subtree
    * is routed through a single explicit `repartition(shingle)` exchange, so
    * every consumer (df count, both self-join sides, per-doc sizes) reads
    * that one shuffle output — Spark's ReuseExchange / AQE stage reuse
    * dedupes the identical exchange subtrees, and the downstream
    * shingle-keyed aggregate and join need no further shuffle because the
    * required distribution is already satisfied. */
  /** Threshold above which the uncapped variant's size-ratio prefilter
    * pays for its carry cost. The filter keeps pairs with
    * `min(na,nb)/max(na,nb) >= t`: at t = 0.5 it kills every pair whose
    * set sizes differ more than 2× (selective on real corpora); at
    * t = 0.1 it only kills >10× mismatches (r19 measured the prefiltered
    * shape 0.3–0.8 s SLOWER there — the wider pair aggregate and the
    * struct-wrapped explode cost more than the filter saves), so weak
    * thresholds keep the classic shape. Both shapes emit identical rows
    * (the filter is lossless), so the cutover is a pure plan choice. */
  private val SizeRatioPrefilterMinThreshold = 0.25

  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.1,
      maxDocFrequency: Option[Int] = None): DataFrame =
    ngramJaccardPairsImpl(docs, k, threshold, maxDocFrequency,
      prefilter = threshold >= SizeRatioPrefilterMinThreshold)

  private[graft] def ngramJaccardPairsImpl(docs: DataFrame, k: Int,
      threshold: Double, maxDocFrequency: Option[Int],
      prefilter: Boolean): DataFrame = maxDocFrequency match {
    case None if prefilter =>
      // Uncapped variant at a SELECTIVE threshold: per-doc set sizes ride
      // the shingle rows instead of a separate doc-keyed aggregation —
      // `n` comes out of the SAME explode via
      // [[graft.functions.WithSize]] (no join, no extra shuffle, ONE
      // md5_shingles eval per row — see WithSize's scaladoc for the
      // InferFiltersFromGenerate triple-eval trap a plain `size(__arr)` +
      // `explode(__arr)` pair falls into). That enables
      //   (1) a LOSSLESS size-ratio prefilter inside the join condition:
      //       jaccard = inter/union ≤ min(na,nb)/max(na,nb) exactly, and
      //       double rounding is monotone, so fl(inter/union) ≥ t implies
      //       fl(min/max) ≥ t — a pair dropped here could never clear the
      //       final `jaccard >= threshold` filter. At the crawl chain's
      //       t = 0.5 this kills every pair whose sizes differ > 2×
      //       BEFORE the O(shared-shingles) pair stream is aggregated
      //       (guide §3.2 — reduce the join output early);
      //   (2) na/nb folded into the pair aggregate (max of a constant),
      //       deleting the two doc-keyed size joins of the old tail.
      val sh = docs
        .select(col("doc_id"), explode(graft.functions.WithSize.with_size(
          graft.functions.Md5Shingles.md5_shingles(
            col("text"), k, distinct = true))).as("e"))
        .select(col("doc_id"), col("e.n").cast("long").as("n"),
          col("e.v").as("shingle"))
        .repartition(col("shingle"))
      val pairs = sh.as("a").hint("shuffle_hash")
        .join(sh.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id") &&
            least(col("a.n"), col("b.n")).cast("double") /
              greatest(col("a.n"), col("b.n")).cast("double") >= threshold)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"),
          max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
      pairs
        .withColumn("union_size", col("na") + col("nb") - col("inter"))
        .withColumn("jaccard", col("inter").cast("double") / col("union_size").cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("union_size"), col("jaccard"))
    case capOpt =>
      // Classic shape (capped, and uncapped at weak thresholds where the
      // prefilter does not pay — see SizeRatioPrefilterMinThreshold).
      val sh = shingleTable(docs, k).repartition(col("shingle"))
      val shc = capOpt match {
        case Some(cap) =>
          val kept = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
            .filter(col("df") <= cap).select(col("shingle"))
          sh.join(kept, Seq("shingle"))
        case None => sh
      }
      val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      // SHUFFLE_HASH: the equi-key self-join needs no sorted output and
      // the per-partition build side is one shingle-hash slice of narrow
      // long pairs, so a hash join skips the two full sorts the default
      // sort-merge join pays on both reads of the shared exchange (guide
      // §3.1 — pick the strategy deliberately; r18 measured the SMJ sorts
      // as pure overhead on this shape). Skew safety of the hash build:
      // with a `cap`, a build partition holds at most `cap` rows per
      // shingle key; uncapped call sites rely on Spark 4's spillable
      // ShuffledHashJoin (degrades, never OOMs) — see the scaladoc.
      val pairs = shc.as("a").hint("shuffle_hash")
        .join(shc.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .withColumn("union_size", col("na") + col("nb") - col("inter"))
        .withColumn("jaccard", col("inter").cast("double") / col("union_size").cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("union_size"), col("jaccard"))
  }

  /** Weighted (multiset) Jaccard near-dup pairs over k-shingle BAGS:
    * `Σ min(tf_a, tf_b) / Σ max(tf_a, tf_b)` — the frequency-aware
    * complement to [[ngramJaccardPairs]]' set semantics (the measure
    * behind weighted-MinHash dedup, e.g. Ioffe 2010 "Improved consistent
    * sampling, weighted minhash and L1 sketching"; computed exactly here,
    * no sketch). Set Jaccard saturates on documents that REPEAT spans —
    * a doc and its 10×-self-concatenation are identical sets — while the
    * bag measure keeps multiplicity, so templated/looped boilerplate
    * scores by its true mass. `Σ max = n_a + n_b − Σ min` with n the
    * total shingle count, so only the min-sum travels through the
    * aggregation.
    *
    * Scale: identical shape to [[ngramJaccardPairs]] — per-doc shingle
    * counts, one gram-keyed exchange reused by both self-join sides,
    * pairs only where shingles are shared. Hot boilerplate shingles are
    * the fan-out hazard at corpus scale: `maxDocFrequency` drops grams
    * present in more than that many documents (semantics-changing, like
    * the ngram df cap — gate the capped variant separately), the same
    * O(df²)-bounding knob. */
  def weightedJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
      k: Int = 3, maxDocFrequency: Option[Int] = None): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val tc = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        // multiset variant of the native shingle hasher (distinct=false)
        explode(graft.functions.Md5Shingles.md5_shingles(
          col("text"), k, distinct = false)).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .repartition(col("tok"))
    val kept = maxDocFrequency match {
      case Some(cap) =>
        val ok = tc.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("tok"))
        tc.join(ok, Seq("tok"))
      case None => tc
    }
    val sizes = kept.groupBy(col("doc_id")).agg(sum(col("cnt")).as("n"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(least(col("a.cnt"), col("b.cnt"))).as("inter_w"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("union_w", col("na") + col("nb") - col("inter_w"))
      .withColumn("wjaccard",
        col("inter_w").cast("double") / col("union_w").cast("double"))
      .filter(col("wjaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter_w"), col("union_w"),
        col("wjaccard"))
  }

  /** Prefix-filtered set-similarity self-join — the AllPairs/PPJoin family
    * (Chaudhuri et al., ICDE 2006; Bayardo et al., WWW 2007; Xiao et al.,
    * WWW 2008) over k-shingle sets: order every document's shingles by a
    * single global canonical order (document frequency ascending, token
    * ascending — rarest first), keep only each document's first
    * `|d| − ⌈t·|d|⌉ + 1` tokens as its probing prefix, and generate
    * candidate pairs ONLY where two prefixes share a token. The prefix
    * lemma guarantees zero false negatives for Jaccard ≥ t, so after the
    * exact verification join the output is exactly the pairs an all-pairs
    * scan would produce — this is the fourth candidate-generation family
    * next to df-capped shingle joins, MinHash/SimHash banding, and
    * sorted-neighborhood windows, and the only one of the four that is
    * simultaneously exact AND never materializes the full shared-token
    * join (hot stopword keys never enter the candidate join at all,
    * because common tokens sort LAST and fall outside every prefix —
    * the pruning the df cap approximates, derived instead of assumed).
    *
    * Scale (100 TB): the shingle explode runs ONCE — the plan is a linear
    * pipeline through three explicit exchanges, each reused by every
    * consumer (ReuseExchange): (1) the token-keyed exchange feeding the
    * df count and the df join; (2) the doc-keyed exchange under the
    * single Window pass (row_number + partition count share one sort —
    * per-document set size is a window count, never a separate sizes
    * aggregate) — also the verification joins' token source; (3) the
    * prefix re-exchange on the token key that both candidate-join sides
    * read. Set sizes ride THROUGH the candidate join, so no sizes join
    * exists at all. Candidate cardinality is bounded by rare-prefix-token
    * collisions — orders of magnitude below the shared-ANY-token join —
    * and the verification touches candidate pairs only. All pruning
    * thresholds are epsilon-guarded toward KEEPING boundary candidates,
    * so float rounding can only admit an extra candidate for the exact
    * verifier to reject, never drop a true pair. */
  def prefixFilterPairs(docs: DataFrame, threshold: Double = 0.5,
      k: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val eps = 1e-9
    val W = org.apache.spark.sql.expressions.Window
    val tok = shingleTable(docs, k).withColumnRenamed("shingle", "tok")
      .repartition(col("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfreq, "tok")
      .repartition(col("doc_id"))
      .withColumn("sz", count(lit(1)).over(W.partitionBy(col("doc_id"))))
      .withColumn("pos", row_number().over(
        W.partitionBy(col("doc_id")).orderBy(col("df").asc, col("tok").asc)))
    val tokByDoc = ranked.select(col("doc_id"), col("tok"))
    val pre = ranked
      .filter(col("pos") <=
        col("sz") - ceil(lit(threshold) * col("sz").cast("double") - lit(eps)) + 1)
      .select(col("doc_id"), col("tok"), col("sz"))
      .repartition(col("tok"))
    val cand = pre.as("a")
      .join(pre.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            lit(threshold) * greatest(col("a.sz"), col("b.sz")).cast("double") - lit(eps))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("na"), col("b.sz").as("nb"))
      .distinct()
    cand
      .join(tokByDoc.select(col("doc_id").as("doc_a"), col("tok")), "doc_a")
      .join(tokByDoc.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("union_size", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / col("union_size").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("union_size"),
        col("jaccard"))
  }

  /** Benchmark decontamination: flag corpus documents that share more than
    * `maxOverlap` of their shingles with ANY benchmark document — the
    * train/eval contamination scrub every LLM data pipeline runs before
    * training. Returns one row per contaminated (corpus doc, benchmark
    * doc) pair with the overlap fraction (shared shingles / corpus doc's
    * shingles); a left-anti join of the corpus against `.select("doc_id")`
    * of this result is the clean set.
    *
    * Scale: the benchmark side is small by nature (an eval suite, not a
    * corpus) — its shingle table broadcasts, so the corpus scan stays
    * map-side. Nothing corpus-sized ever shuffles: the sizes aggregate is
    * map-side combined (its exchange carries ~one row per document, the
    * minimal representation of the sizes relation), the per-(pair) count's
    * cardinality is bounded by matches, and AQE broadcasts that small pair
    * set for the sizes join. The corpus is scanned twice (join side +
    * sizes) — two cheap pruned scans beat materializing the corpus-sized
    * (doc, shingle) table through an exchange. */
  def contaminationPairs(corpus: DataFrame, benchmark: DataFrame, k: Int = 3,
      maxOverlap: Double = 0.5): DataFrame = {
    val c = shingleTable(corpus, k)
    val b = shingleTable(benchmark, k)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    val sizes = c.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    c.join(broadcast(b), "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes, "doc_id")
      .withColumn("overlap", col("shared").cast("double") / col("n").cast("double"))
      .filter(col("overlap") > maxOverlap)
      .select(col("doc_id"), col("bench_id"), col("shared"), col("overlap"))
  }

  /** Bloom-pruned decontamination: same output as [[contaminationPairs]]
    * bit-for-bit (bloom filters have no false negatives, and the exact
    * join re-checks every survivor), but the corpus gram stream is
    * pre-filtered by a packed bloom filter over the benchmark's shingles
    * before anything reaches the join.
    *
    * Why this is the 100 TB shape: [[contaminationPairs]] broadcasts the
    * full benchmark shingle table (~100 bytes/gram as join-hashtable
    * entries), which caps how much eval suite fits in executor memory. The
    * bloom is ~`bloomBits / grams` bits per gram (default 2^21 bits =
    * 256 KiB total) — two orders of magnitude smaller — so the same
    * executor budget covers a 100x larger benchmark union, and the grams
    * that survive the prune (true matches + the tiny false-positive tail)
    * are the only rows the exact broadcast join ever hashes. The corpus
    * side stays a pure map → filter inside whole-stage codegen: two
    * xxhash64 probes and two word lookups in a literal array per gram, no
    * exchange, no state.
    *
    * The packed words are built driver-side from a benchmark-sized
    * aggregation — the array length is `bloomBits / 64` (data-independent;
    * 32 Ki longs at the default), the same bounded driver-held-model shape
    * as the k-means centroids (`Similarity.scala`). */
  def contaminationPairsBloom(corpus: DataFrame, benchmark: DataFrame,
      k: Int = 3, maxOverlap: Double = 0.5,
      bloomBits: Int = 1 << 21): DataFrame = {
    require(bloomBits >= 64 && bloomBits % 64 == 0,
      "bloomBits must be a positive multiple of 64")
    val b = shingleTable(benchmark, k)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    // two independent probes from salted xxhash64 over the 60-bit shingle
    def pos(salt: Int, sh: Column): Column =
      pmod(xxhash64(lit(salt), sh), lit(bloomBits.toLong))
    val words = new Array[Long](bloomBits / 64)
    b.select(explode(array(pos(1, col("shingle")), pos(2, col("shingle"))))
        .as("p"))
      .groupBy((col("p") / 64).cast("int").as("w"))
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64L)).cast("int")))
        .as("bits"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    val bloom = typedLit(words.toSeq)
    def hit(salt: Int): Column = {
      val p = pos(salt, col("shingle"))
      element_at(bloom, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(p, lit(64L)).cast("int"))) =!= lit(0L)
    }
    val c = shingleTable(corpus, k)
    val sizes = c.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    c.filter(hit(1) && hit(2))
      .join(broadcast(b), "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes, "doc_id")
      .withColumn("overlap",
        col("shared").cast("double") / col("n").cast("double"))
      .filter(col("overlap") > maxOverlap)
      .select(col("doc_id"), col("bench_id"), col("shared"), col("overlap"))
  }

  /** Sorted-neighborhood dedup blocking (Hernández–Stolfo SNM): sort each
    * block by a locality-preserving key, slide a `window`-row neighborhood
    * down the sorted order, and emit the pairs whose bounded-prefix edit
    * distance clears `maxDist`. The third blocking family next to hashing
    * (exact/MinHash/SimHash) and embedding blocking: it catches near-dups
    * whose edits are concentrated at the END of the text (shared prefix ⇒
    * adjacent sort positions) at O(window · n) comparisons — no candidate
    * join at all.
    *
    * Scale shape: neighborhoods are scoped INSIDE `block` — the window
    * function is PARTITIONED by block and ordered by (sortKey, doc_id), a
    * keyed shuffle, never the single-partition global-order window the
    * naive SNM formulation implies. Block granularity is the skew knob:
    * (lang, text prefix) at the default yields ~languages × alphabet
    * partitions; real corpora re-block on a longer prefix by passing a
    * custom `block` column. The sort key is bounded to `sortPrefixLen`
    * chars so the window shuffle never carries full document text (ties
    * beyond the bound break deterministically on doc_id); pass `sortKey`
    * to substitute any other locality-preserving key. The comparator
    * runs on a `prefixLen`-bounded prefix via the threshold (banded)
    * levenshtein, so each comparison is O(maxDist·prefixLen) regardless of
    * document length, and every candidate is emitted with its distance for
    * downstream exact verification — the same prune-then-verify contract
    * as the bloom decontamination path. */
  def snmPairs(docs: DataFrame, window: Int = 3, maxDist: Int = 20,
      prefixLen: Int = 160, sortPrefixLen: Int = 512,
      block: Option[Column] = None, sortKey: Option[Column] = None): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(prefixLen > 0, s"prefixLen must be positive: $prefixLen")
    require(sortPrefixLen > 0, s"sortPrefixLen must be positive: $sortPrefixLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("block")).orderBy(col("skey").asc, col("doc_id").asc)
    val base = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      substring(col("text"), 1, prefixLen).as("pfx"),
      block.getOrElse(
        concat(col("lang"), lit(":"), substring(col("text"), 1, 1))).as("block"),
      sortKey.getOrElse(substring(col("text"), 1, sortPrefixLen)).as("skey"))
    // all `window` lags come out of ONE Window operator; the explode runs
    // in a separate downstream projection (generators cannot host window
    // expressions). Null lags = head-of-block, dropped.
    base.select(col("doc_id") +: col("pfx") +:
        (1 to window).flatMap(i => Seq(
          lag(col("doc_id"), i).over(w).as(s"id$i"),
          lag(col("pfx"), i).over(w).as(s"p$i"))): _*)
      .select(col("doc_id"), col("pfx"),
        explode(array((1 to window).map(i => struct(
          col(s"id$i").as("other"), col(s"p$i").as("opfx"))): _*)).as("e"))
      .filter(col("e.other").isNotNull)
      // banded levenshtein: the threshold form computes only the
      // ±maxDist diagonal band (O(maxDist·prefixLen) per comparison, vs
      // O(prefixLen²) unbounded) and returns -1 above the bound — the
      // filter keeps exactly the same pairs, ~4x cheaper on the default
      // 20/160 parameters
      .withColumn("dist",
        levenshtein(col("pfx"), col("e.opfx"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(least(col("doc_id"), col("e.other")).as("doc_a"),
        greatest(col("doc_id"), col("e.other")).as("doc_b"), col("dist"))
  }

  /** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken, SIGMOD
    * 2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    * the MOSS algorithm): hash every `k`-char gram, slide a `w`-hash
    * window, select each window's MINIMUM hash (rightmost on ties, the
    * paper's robust-winnowing rule), and emit the distinct selected
    * `(pos, fp)` pairs per document. The guarantee that makes it the
    * substring-granular complement to shingle/MinHash dedup: any shared
    * substring of length ≥ `w + k − 1` between two documents selects at
    * least one common fingerprint — detection is LOCAL, with expected
    * density 2/(w+1), so the fingerprint table is a tunable fraction of
    * corpus size.
    *
    * Hashes are [[graft.text.TextAnalysis.md5Int60]] (engine-exact); the
    * whole selection is a narrow per-document map (transform over the
    * hash array — no shuffle until the output distinct), so at 100 TB it
    * scans once and shuffles only the ~2n/(w+1) selected fingerprints.
    * Documents shorter than `w + k − 1` chars yield no fingerprints
    * (below the guarantee threshold, the paper's own boundary). */
  def winnow(docs: DataFrame, k: Int = 16, w: Int = 16): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")
    // the gram hashing + rightmost-min window selection runs as ONE
    // native codegen expression ([[graft.functions.WinnowFps]] — an O(n)
    // ascending-minima deque): the declarative transform/fold chain it
    // replaces was an interpreted higher-order function paying a closure
    // call per WINDOW STEP (O(n·w) of them — 73 CPU-seconds on the r18
    // sf0.1 consensus sweep), value-identical by the expression's
    // contract (same md5Int60 gram hashes, same rightmost-tie rule)
    docs.filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"),
        explode(graft.functions.WinnowFps.winnow_fps(col("text"), k, w)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
      .distinct()
  }

  /** MOSS-style match detection over [[winnow]] fingerprints: pairs of
    * documents sharing ≥ `minShared` selected fingerprints, with the
    * shared count as match strength. The join is keyed on the
    * fingerprint hash — pairs only materialize where 16-char substrings
    * actually coincide, the shared-shingle candidate-generation shape.
    *
    * `maxDf` drops fingerprints appearing in more than that many
    * documents BEFORE the self-join — the same hot-key cap the shingle
    * and q-gram joins apply, and the rule MOSS itself uses (boilerplate
    * is dropped above a df threshold): a cookie-banner 16-gram shared by
    * N docs would otherwise alone emit N²/2 candidate pairs. The df pass
    * is one extra groupBy over the fingerprint table (already reduced to
    * ~2n/(w+1) of corpus size), and dropping a ubiquitous fingerprint
    * loses no real match signal — a boilerplate substring shared by half
    * the corpus identifies nothing. */
  def winnowPairs(docs: DataFrame, k: Int = 16, w: Int = 16,
      minShared: Long = 2, maxDf: Int = 1000): DataFrame = {
    require(maxDf >= 2, s"need maxDf >= 2 (pairs need df >= 2): $maxDf")
    // the df cap rides the fp-keyed exchange the self-join needs anyway:
    // a window count over the distinct fingerprint table partitions on
    // fp, the filter drops hot keys in place, and BOTH join sides read
    // that one shuffle output (ReuseExchange — the simhashPairs /
    // shingle-join shape), so the cap costs no extra corpus pass
    val kept = winnow(docs, k, w).select(col("doc_id"), col("fp")).distinct()
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("df") <= maxDf)
      .select(col("doc_id"), col("fp"))
    kept.select(col("doc_id").as("a"), col("fp"))
      .join(kept.select(col("doc_id").as("b"), col("fp").as("fp2")),
        col("fp") === col("fp2") && col("a") < col("b"))
      .groupBy(col("a").as("doc_a"), col("b").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("doc_a"), col("doc_b"), col("shared"))
  }

  /** Ensemble near-duplicate verdict: pairs flagged by at least
    * `minSignals` of the three INDEPENDENT pair generators — df-capped
    * k-shingle Jaccard ([[ngramJaccardPairs]]), SimHash Hamming
    * proximity ([[simhashPairs]]), and winnowing fingerprint overlap
    * ([[winnowPairs]]). This is the precision-boosting consensus a
    * pipeline runs before DESTRUCTIVE deletion: each signal has a
    * different failure mode (shingle Jaccard misses reorderings SimHash
    * tolerates, SimHash's global fingerprint misses local substring
    * copies winnowing catches, winnowing fires on boilerplate spans
    * Jaccard dilutes), so agreement of two is far stronger evidence
    * than any single detector at the same thresholds. Emits
    * `(doc_a, doc_b, n_signals, signals)` with `signals` a sorted
    * comma-joined tag string.
    *
    * Scale: each generator is independently fan-out-bounded (shingle df
    * cap, pigeonhole block join, fingerprint df cap); the consensus adds
    * one union of three pair-set-sized tables and one (a, b)-keyed
    * aggregate — never a corpus-sized shuffle of its own. */
  def consensusPairs(docs: DataFrame, minSignals: Int = 2,
      jaccardThreshold: Double = 0.1, jaccardMaxDf: Int = 5,
      maxHamming: Int = 3, winnowMaxDf: Int = 1000): DataFrame =
    consensusFromPairs(
      ngramJaccardPairs(docs, k = 3, threshold = jaccardThreshold,
        maxDocFrequency = Some(jaccardMaxDf)),
      simhashPairs(docs, maxHamming),
      winnowPairs(docs, maxDf = winnowMaxDf),
      minSignals)

  /** [[consensusPairs]] over ALREADY-COMPUTED pair sets — the composition
    * a real pipeline runs: the three generators are individually gated
    * (and at scale individually persisted), so re-deriving them inside
    * the consensus would re-scan and re-tokenize the corpus three times
    * for tables the pipeline already has. The consensus itself is only a
    * union of three pair-set-sized frames and one (a, b)-keyed aggregate.
    * Signal tags are positional (`jaccard`/`simhash`/`winnow`) — callers
    * substituting a different generator for a slot keep the slot's
    * failure-mode role. */
  def consensusFromPairs(jaccard: DataFrame, simhash: DataFrame,
      winnow: DataFrame, minSignals: Int = 2): DataFrame = {
    require(minSignals >= 1 && minSignals <= 3,
      s"minSignals must be in [1, 3]: $minSignals")
    def tag(pairs: DataFrame, s: String): DataFrame =
      pairs.select(col("doc_a"), col("doc_b")).withColumn("signal", lit(s))
    tag(jaccard, "jaccard")
      .unionByName(tag(simhash, "simhash"))
      .unionByName(tag(winnow, "winnow"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_signals"),
        concat_ws(",", array_sort(collect_list(col("signal")))).as("signals"))
      .filter(col("n_signals") >= minSignals)
  }

  /** Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969, "A
    * Theory for Record Linkage", JASA 64) over SNM-blocked candidates:
    * each candidate pair is scored field by field — agreement on a field
    * VALUE earns that value's surprisal (the classic frequency-based
    * refinement: agreeing on a rare source is strong evidence, agreeing
    * on the dominant one is weak), disagreement pays a small constant
    * penalty — and the summed score is thresholded into the
    * match / possible / nonmatch verdict bands that define the FS
    * decision rule. Weights are the integer floor-log2 surprisal
    * `bits(N) − bits(count(value))` (the [[graft.text.TextAnalysis]]
    * bits rule — engine-exact, no float log), a documented proxy for the
    * real-valued log2(1/u) agreement weight; disagreement penalties are
    * fixed integers rather than EM-estimated m/u odds.
    *
    * Fields: `source` (frequency-weighted, −2 on disagreement), length
    * band (±10% of the shorter: +2 / −1), and the 16-char text prefix
    * (frequency-weighted, −1 — weak negative evidence, the block
    * already guarantees prefix locality).
    *
    * Scale: candidates come from the [[snmPairs]] window shape (block-
    * partitioned, O(window·n), never all-pairs); the source-frequency
    * table is value-cardinality-sized and broadcasts; the prefix
    * frequency join is key-partitioned on the prefix. Totals ride as a
    * 1-row broadcast.
    *
    * `block` / `sortKey` are caller knobs with the [[snmPairs]] defaults
    * (`lang:first-char` block, `sortPrefixLen`-char sort key) — the SNM
    * window puts each block on ONE task, so at corpus scale the caller
    * MUST shard blocks to match the data (e.g. a longer discriminating
    * prefix, or lang + a hash band): a handful of coarse blocks over
    * 100 TB is a single-reducer terabyte sort. Lifting the block into
    * the signature is what keeps that a call-site decision instead of a
    * rebuild. */
  def linkagePairs(docs: DataFrame, window: Int = 3,
      upper: Long = 8, lower: Long = 4, sortPrefixLen: Int = 512,
      block: Option[Column] = None, sortKey: Option[Column] = None): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(upper >= lower, s"upper ($upper) must be >= lower ($lower)")
    require(sortPrefixLen > 0, s"sortPrefixLen must be positive: $sortPrefixLen")
    def bits(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("block")).orderBy(col("skey").asc, col("doc_id").asc)
    val base = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("source"), col("n_chars").cast("long").as("len"),
      substring(col("text"), 1, 16).as("p16"),
      block.getOrElse(
        concat(col("lang"), lit(":"), substring(col("text"), 1, 1))).as("block"),
      sortKey.getOrElse(substring(col("text"), 1, sortPrefixLen)).as("skey"))
    val srcFreq = docs.groupBy(col("source")).agg(count(lit(1)).as("c_src"))
    val pfxFreq = docs.groupBy(substring(col("text"), 1, 16).as("p16"))
      .agg(count(lit(1)).as("c_pfx"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    val fields = Seq("source", "len", "p16")
    val pairs = base.select(Seq(col("doc_id")) ++ fields.map(col) ++
        (1 to window).flatMap(i => Seq(
          lag(col("doc_id"), i).over(w).as(s"id$i"),
          lag(col("source"), i).over(w).as(s"s$i"),
          lag(col("len"), i).over(w).as(s"l$i"),
          lag(col("p16"), i).over(w).as(s"q$i"))): _*)
      .select(Seq(col("doc_id")) ++ fields.map(col) :+
        explode(array((1 to window).map(i => struct(
          col(s"id$i").as("other"), col(s"s$i").as("osource"),
          col(s"l$i").as("olen"), col(s"q$i").as("op16"))): _*)).as("e"): _*)
      .filter(col("e.other").isNotNull)
    val wSrc = when(col("source") === col("e.osource"),
      bits(col("n_docs")) - bits(col("c_src"))).otherwise(lit(-2L))
    val wLen = when(abs(col("len") - col("e.olen")) * 10
        <= least(col("len"), col("e.olen")), lit(2L)).otherwise(lit(-1L))
    val wPfx = when(col("p16") === col("e.op16"),
      bits(col("n_docs")) - bits(col("c_pfx"))).otherwise(lit(-1L))
    pairs
      .join(broadcast(srcFreq), Seq("source"))
      .join(pfxFreq, Seq("p16"))
      .crossJoin(broadcast(totals))
      .select(
        least(col("doc_id"), col("e.other")).as("doc_a"),
        greatest(col("doc_id"), col("e.other")).as("doc_b"),
        wSrc.as("w_source"), wLen.as("w_len"), wPfx.as("w_prefix"))
      .withColumn("score", col("w_source") + col("w_len") + col("w_prefix"))
      .withColumn("verdict",
        when(col("score") >= upper, lit("match"))
          .when(col("score") >= lower, lit("possible"))
          .otherwise(lit("nonmatch")))
  }

  /** Q-gram-filtered edit-distance self-join (Gravano et al., VLDB 2001
    * "Approximate string joins in a database (almost) for free"): ALL
    * document pairs whose `prefixLen`-bounded prefixes are within
    * `maxDist` edits — the completeness upgrade over [[snmPairs]], whose
    * window only sees sort-adjacent candidates. The q-gram count bound
    * (one edit destroys at most `q` distinct character q-grams, so
    * ed ≤ d ⇒ shared grams ≥ |G| − d·q) turns the edit threshold into an
    * overlap threshold, and the prefix-filter lemma then shrinks the
    * probing set to each document's `d·q + 1` RAREST grams in the global
    * (df, gram) order — a CONSTANT-size probing prefix per document,
    * independent of text length. Candidates verify with the banded
    * levenshtein; strings too short to prune (≤ d·q distinct grams — the
    * bound cannot hold) are excluded by contract, documented and mirrored
    * by the oracle.
    *
    * Scale: one gram explode feeds a token-keyed exchange (df count +
    * rank join), one doc-keyed window ranks grams rarest-first, and the
    * candidate join touches only the constant-size prefixes — hot grams
    * (common words, templated spans) sort LAST and never enter the join.
    * The LENGTH filter (|len_a − len_b| ≤ d — each edit moves the length
    * by at most one, so it admits every true pair) prunes candidates
    * before the O(d·prefixLen) banded verification; a distinct-GRAM-count
    * difference bound would need d·q, not d, and is not used. Pruning power is
    * CORPUS-DEPENDENT: it needs the rarest-gram buckets to be sparse,
    * which holds on natural web-scale text (character-gram diversity
    * grows with the corpus) but not on a tiny shared vocabulary, where
    * every gram is hot and the candidate set approaches all-pairs — on
    * such data prefer [[snmPairs]] (adjacency-bounded) and treat this as
    * the completeness-checking audit pass over a bounded sample. That
    * bounded-audit contract is part of the API, not a call-site
    * convention: `auditMaxDocId = Some(n)` restricts the pass to
    * `doc_id < n` (deterministic, id-ordered — the same slice every
    * run), `None` audits the full input. */
  def qgramEditPairs(docs: DataFrame, maxDist: Int = 10, q: Int = 3,
      prefixLen: Int = 160, auditMaxDocId: Option[Long] = None): DataFrame = {
    require(maxDist > 0 && q > 0 && prefixLen > 0,
      s"positive maxDist/q/prefixLen: $maxDist/$q/$prefixLen")
    val W = org.apache.spark.sql.expressions.Window
    val audited = auditMaxDocId.fold(docs)(n => docs.filter(col("doc_id") < n))
    val base = audited.select(col("doc_id").cast("long").as("doc_id"),
      substring(col("text"), 1, prefixLen).as("pfx"))
      .withColumn("plen", length(col("pfx")).cast("long"))
    val eligible = base
      // native char-gram hasher (r18): same distinct grams + md5Int60
      // values as the interpreted array_distinct(transform(substr))
      // chain, one codegen loop per row; shorter-than-q prefixes yield
      // an empty array exactly like the old when/otherwise guard
      .withColumn("grams", graft.functions.Md5CharGrams.md5_chargrams(
        col("pfx"), q, distinct = true))
      .withColumn("ng", size(col("grams")).cast("long"))
      .filter(col("ng") > maxDist * q)
    val tok = eligible
      .select(col("doc_id"), col("plen"), explode(col("grams")).as("tok"))
      .repartition(col("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val pre = tok.join(dfreq, "tok")
      .repartition(col("doc_id"))
      .withColumn("pos", row_number().over(
        W.partitionBy(col("doc_id")).orderBy(col("df").asc, col("tok").asc)))
      .filter(col("pos") <= maxDist * q + 1)
      .select(col("doc_id"), col("plen"), col("tok"))
      .repartition(col("tok"))
    val cand = pre.as("a")
      .join(pre.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.plen") - col("b.plen")) <= maxDist)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("pfx").as("pa")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("pfx").as("pb")), "doc_b")
      .withColumn("dist", levenshtein(col("pa"), col("pb"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** MinHash signatures: numHashes column-wise minima of md5-derived hash
    * families over the shingle set. One groupBy on doc_id. */
  def minhashSignatures(docs: DataFrame, k: Int = 3, numHashes: Int = 16): DataFrame =
    minhashSignaturesOver(shingleTable(docs, k), numHashes)

  /** [[minhashSignatures]] over an arbitrary precomputed token table
    * (`doc_id`, `shingle`) — the shingling unit supplied by the caller
    * (text n-grams, frame hashes, any set-valued feature). Identical
    * hash family, so signatures over equal token sets are equal
    * regardless of what produced the tokens. */
  def minhashSignaturesOver(tokens: DataFrame, numHashes: Int = 16): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(md5Int32(concat(lit(s"$i:"), col("shingle").cast("string")))).as(s"h$i"))
    tokens.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** One row per (doc, band) with the band's md5 bucket key; the full
    * signature rides along so callers that score candidates by signature
    * agreement don't re-aggregate the corpus. */
  private def lshBandEntries(
      docs: DataFrame, k: Int, numHashes: Int, bands: Int): DataFrame =
    lshBandEntriesOver(shingleTable(docs, k), numHashes, bands)

  private def lshBandEntriesOver(
      tokens: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    minhashSignaturesOver(tokens, numHashes).select(
      col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          md5(concat_ws(",",
            (0 until rows).map(r =>
              element_at(col("sig"), b * rows + r + 1).cast("string")): _*)).as("bkey"))
      }: _*)).as("e"))
      .select(col("doc_id"), col("sig"), col("e.band").as("band"), col("e.bkey").as("bkey"))
  }

  /** MinHash + LSH banding: signature split into `bands` bands whose md5
    * keys bucket candidate pairs; each surviving pair is scored by exact
    * signature agreement (matches / numHashes estimates Jaccard). */
  def minhashLshPairs(
      docs: DataFrame, k: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame =
    minhashLshPairsOver(shingleTable(docs, k), numHashes, bands)

  /** [[minhashLshPairs]] over a caller-supplied token table — the
    * banding, candidate join, and signature-agreement scoring unchanged,
    * only the set-valued unit differs. */
  def minhashLshPairsOver(
      tokens: DataFrame, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val bandEntries = lshBandEntriesOver(tokens, numHashes, bands)
    bandEntries.as("a")
      .join(bandEntries.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y), v => v))
          .cast("long").as("matches"))
      .distinct() // pairs sharing >1 band collapse (matches is pair-determined)
      .withColumn("est_sim", col("matches").cast("double") / lit(numHashes.toDouble))
      .select(col("doc_a"), col("doc_b"), col("matches"), col("est_sim"))
  }

  /** LSH recall calibration: joins the exact-Jaccard ground truth
    * ([[ngramJaccardPairs]], uncapped) against the MinHash-LSH candidate
    * pairs ([[minhashLshPairs]]) and reports, per true-similarity decile,
    * how many true pairs the banding surfaced — the measurement that
    * turns LSH's (bands, rows) S-curve from a formula into an observed
    * number on THIS corpus. Run at a small scale factor before committing
    * band parameters for the 100 TB sweep: a decile with recall below
    * target means more bands (or fewer rows per band), not a bigger
    * verify pass. The same calibration pattern as the ANN recall gate
    * (`Similarity.annRecall`), applied to the dedup path.
    *
    * Determinism: deciles come from `floor(jaccard·10)` — one exact IEEE
    * division and one exactly-rounded multiply — and recall is a single
    * long/long division, so any engine reproduces identical doubles.
    *
    * Scale shape: both inputs are the already-blocked pair pipelines
    * (shared-shingle join, band-key join — never n²); the recall join is
    * keyed on the pair and the output is ≤ 10 rows. The exact side is the
    * expensive one — which is the point: calibrate at small sf, then run
    * only the LSH side at corpus scale. */
  def lshRecall(docs: DataFrame, k: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.2): DataFrame = {
    val truth = ngramJaccardPairs(docs, k, threshold, None)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val cand = minhashLshPairs(docs, k, numHashes, bands)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
    truth.join(cand, Seq("doc_a", "doc_b"), "left")
      .withColumn("sim_decile",
        least(floor(col("jaccard") * lit(10.0)), lit(9.0)).cast("long"))
      .groupBy(col("sim_decile"))
      .agg(count(lit(1)).as("n_true"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_true").cast("double"))
  }

  /** Fuzzy benchmark decontamination: the near-duplicate extension of
    * [[contaminationPairs]] (which demands exact shingle containment).
    * Candidate (corpus, benchmark) pairs come from MinHash LSH banding —
    * a corpus doc is a candidate when ANY band key collides with a
    * benchmark doc's — and every candidate is then verified with its
    * EXACT containment overlap (shared shingles / corpus doc's shingles),
    * so the output reports true overlap, never an estimate. The policy
    * threshold is the caller's: pairs with at least one shared shingle
    * are all returned. Defaults use 8 bands of 2 rows (vs the
    * within-corpus pairing's 4×4) because decontamination wants recall —
    * a missed contaminated doc poisons an eval; a false candidate only
    * costs one exact check.
    *
    * Scale (100 TB): the benchmark side is an eval suite, not a corpus —
    * both its band entries and its shingle table broadcast. The corpus's
    * only exchange is the map-side-combined signature aggregate (one row
    * per document); the band join is map-side against the broadcast, and
    * only the candidate doc-pairs (bounded by band collisions, not n²)
    * reach the exact-overlap aggregation. The sizes aggregate is the same
    * one-row-per-doc map-side combine as [[contaminationPairs]]. */
  def fuzzyContamination(corpus: DataFrame, benchmark: DataFrame, k: Int = 3,
      numHashes: Int = 16, bands: Int = 8): DataFrame = {
    val cands = lshBandEntries(corpus, k, numHashes, bands)
      .select(col("doc_id"), col("band"), col("bkey"))
      .join(broadcast(lshBandEntries(benchmark, k, numHashes, bands)
          .select(col("doc_id").as("bench_id"), col("band"), col("bkey"))),
        Seq("band", "bkey"))
      .select(col("doc_id"), col("bench_id")).distinct()
    val cSh = shingleTable(corpus, k)
    val bSh = shingleTable(benchmark, k)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    val sizes = cSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    cands.join(cSh, "doc_id")
      .join(broadcast(bSh), Seq("bench_id", "shingle"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes, "doc_id")
      .withColumn("overlap", col("shared").cast("double") / col("n").cast("double"))
      .select(col("doc_id"), col("bench_id"), col("shared"), col("overlap"))
  }

  /** SimHash fingerprint (default 32 bits): bit j is set when the majority
    * of token hashes (with multiplicity) have bit j set — i.e.
    * `2*Σ bit_j(h) >= n`. Explode + one aggregation; each doc reduces to
    * (count, 32 partial sums) map-side, so the shuffle carries one row per
    * document. */
  def simhash(docs: DataFrame, bits: Int = 32): DataFrame = {
    val tok = docs
      // native 1-gram (token) hasher at md5Int32 width — same values as
      // exploding split(text, " ") and hashing each token (r18)
      .select(col("doc_id"), explode(graft.functions.Md5Shingles.md5_shingles(
        col("text"), 1, distinct = false, digits = 8)).as("h"))
    val sums = (0 until bits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"s$j"))
    tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("doc_id"),
        (0 until bits).map(j =>
          when(col(s"s$j") * 2 >= col("n"), lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxHamming, blocked
    * multi-probe (Manku et al., WWW'07 — the block-permutation trick): each
    * fingerprint is probed under `rotations` disjoint `blockBits`-bit
    * blocks, candidates join per (rotation, block value), and pairs found
    * under several rotations collapse with one `distinct`.
    *
    * Recall: two fingerprints within Hamming distance d differ in at most
    * d of the `rotations` disjoint blocks, so whenever
    * `maxHamming < rotations` the pigeonhole principle guarantees some
    * probed block agrees exactly — recall 1.0 vs the exact all-pairs
    * Hamming join (which is what the oracle gate checks). The defaults
    * (32 bits, 4×8-bit blocks, maxHamming 3) sit exactly at that bound.
    *
    * Scale: candidate fan-out is bounded per (rotation, block) bucket —
    * rotations × C(occupancy,2) worst case, never n²; the shuffle key is
    * the 2-column (rot, block). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, blockBits: Int = 8,
      bits: Int = 32, rotations: Int = 4): DataFrame = {
    require(rotations * blockBits <= bits,
      "rotations*blockBits must fit in the fingerprint")
    val s = simhash(docs, bits)
    // one explicit exchange on the join key: both self-join sides read the
    // same shuffle output (ReuseExchange), so the corpus is fingerprinted
    // once — not once per side (same shape as the Jaccard shingle reuse)
    val withRot = s.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until rotations).map(r =>
        shiftright(col("simhash"), r * blockBits)
          .bitwiseAND(lit((1L << blockBits) - 1))): _*)).as(Seq("rot", "block")))
      .repartition(col("rot"), col("block"))
    withRot.as("a")
      .join(withRot.as("b"),
        col("a.rot") === col("b.rot") && col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
      .distinct() // a pair can surface under several rotations
  }

  /** Incremental dedup: flag each document of a NEW snapshot against the
    * EXISTING corpus — the daily-ingest shape, where the corpus is already
    * deduped and only increment-vs-corpus work should be paid, never a
    * corpus² re-clustering. One row per increment doc:
    * `(doc_id, exact_dup, near_dup)` — `exact_dup` when its text md5
    * already exists in the corpus, `near_dup` when its k-shingle Jaccard
    * against SOME corpus doc clears `threshold`.
    *
    * Scale shape: exact is a semi-join of the increment against the
    * corpus's distinct 16-byte hash set (shuffles ≈ corpus-distinct +
    * increment, both reduced before the exchange). Near-dup joins the
    * increment's shingle table against the corpus's on the shingle key —
    * bipartite, so pairs materialize only where overlap exists and the
    * fan-out is increment-bounded; the big corpus side is scanned, reduced
    * to (doc, shingle), and never self-joined. The increment is small by
    * nature (one snapshot), so AQE broadcasts its reduced aggregates.
    *
    * With `maxDocFrequency = Some(cap)` (the production shape, mirroring
    * [[ngramJaccardPairs]]): shingles present in more than `cap` CORPUS
    * documents are dropped from both sides before sizes and the join. A
    * stop-shingle in `df_inc` increment docs and `df_corp` corpus docs
    * would otherwise materialize `df_inc × df_corp` pair rows before the
    * per-pair count — on the operator that runs at the highest cadence
    * (daily ingest), the one unbounded fan-out the engine must not have.
    * The cap is computed on the corpus side because that's the stable,
    * large table whose hot keys persist snapshot over snapshot; Jaccard is
    * then taken over the filtered shingle space on both sides (same
    * semantics change as the capped Jaccard pair ⇒ separate oracle). */
  def incrementalFlags(corpus: DataFrame, increment: DataFrame, k: Int = 3,
      threshold: Double = 0.5, maxDocFrequency: Option[Int] = None): DataFrame = {
    val textHash = md5(col("text"))
    val corpusHashes = corpus.select(textHash.as("h")).distinct()
    val exact = increment.select(col("doc_id"), textHash.as("h"))
      .join(corpusHashes, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("exact_dup", lit(1L))
    val incRaw = shingleTable(increment, k)
    val corpRaw = shingleTable(corpus, k)
      .select(col("doc_id").as("corpus_id"), col("shingle"))
    val (inc, corp) = maxDocFrequency match {
      case Some(cap) =>
        // one explicit shingle exchange on the corpus side: the df
        // aggregate and the kept-join both read it (ReuseExchange), so the
        // cap costs no extra corpus pass; `kept` is shingle-keys-only and
        // AQE broadcasts it to filter the small increment side
        val corpR = corpRaw.repartition(col("shingle"))
        val kept = corpR.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("shingle"))
        (incRaw.join(kept, Seq("shingle")), corpR.join(kept, Seq("shingle")))
      case None => (incRaw, corpRaw)
    }
    // per-doc shingle counts via explode+groupBy, NOT size(shingles(...))
    // as a scalar: the aggregate is map-side combined (its exchange
    // carries ~one row per doc), while the scalar recomputes the
    // interpreted transform/array_distinct HOF per row — measured 2×
    // slower at sf0.1
    val incSizes = inc.groupBy(col("doc_id")).agg(count(lit(1)).as("na"))
    val corpSizes = corp.groupBy(col("corpus_id")).agg(count(lit(1)).as("nb"))
    val near = inc.join(corp, "shingle")
      .groupBy(col("doc_id"), col("corpus_id")).agg(count(lit(1)).as("inter"))
      .join(incSizes, "doc_id")
      .join(corpSizes, "corpus_id")
      .filter(col("inter").cast("double")
        / (col("na") + col("nb") - col("inter")).cast("double") >= threshold)
      .select(col("doc_id")).distinct()
      .withColumn("near_dup", lit(1L))
    increment.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(0L)).as("exact_dup"),
        coalesce(col("near_dup"), lit(0L)).as("near_dup"))
  }

  /** Duplicate clusters from near-dup pairs — the tail every dedup
    * pipeline needs: pair lists (MinHash/Jaccard/SimHash output) grouped
    * into connected components so one canonical document survives per
    * cluster. Returns `(doc_id, cluster, is_canonical)` for every input
    * doc, cluster = smallest doc_id reachable over dup edges — singletons
    * are their own canonical cluster.
    *
    * Algorithm: alternating large-star / small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond"), which
    * converges in O(log n) rounds regardless of component diameter — the
    * scale answer for chain-shaped dup graphs where plain min-label
    * propagation needs diameter rounds. Each round is two per-node
    * min-aggregations over the edge table (bounded by the pair-list size,
    * never corpus²), and the edge table is eagerly `localCheckpoint`ed per
    * round so the plan stays flat — without that, every iteration re-plans
    * the whole lineage of all prior rounds and driver planning time, not
    * the data, dominates (the round-6 bench measured exactly that
    * pathology at 618 s for a 500-doc graph). Convergence is detected by
    * an exact multiset comparison of successive edge sets (a shuffle over
    * the bounded edge table), not an overflow-prone label-sum probe.
    *
    * Hybrid execution: an edge set at or below `localThreshold` rows is
    * collected and solved with single-pass union-find + path compression
    * on the driver (labels identical by definition — component minimum),
    * because ~log n scheduled star rounds on a driver-sized graph cost
    * pure job-scheduling overhead; the distributed contraction is the
    * above-threshold path. The same adaptive small-side-goes-local
    * decision broadcast joins make, with the same bound discipline. */
  def dupClusters(docs: DataFrame, pairs: DataFrame, maxIter: Int = 20,
      localThreshold: Long = 1L << 20): DataFrame = {
    // star rounds: edges are (node, parent) assignments, treated as
    // undirected; at the fixpoint every component is a star rooted at its
    // minimum node.
    var edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    // small-edge-set fast path: the same small-side-goes-local decision a
    // broadcast join makes. Dedup pair lists are fan-out-bounded by
    // construction (df caps, LSH bands, pigeonhole blocks), so in practice
    // the edge table is FAR below corpus size; when it fits the driver
    // comfortably (<= localThreshold edges ≈ 16 MB of longs at the 2^20
    // default), one pass of union-find with path compression replaces
    // O(log n) scheduled star rounds — each of which costs 3 jobs of pure
    // scheduling overhead on a graph this small. Labels are identical by
    // definition (component minimum); the distributed star-contraction
    // below remains the >threshold path and is property-pinned equal
    // (DedupSpec forces it via localThreshold = 0). ONE job decides AND
    // fetches: limit(threshold+1) collected as primitive tuples over the
    // already-materialized checkpoint blocks — length <= threshold means
    // we hold the whole edge set (use it directly), one extra row means
    // it's too big and the prefix is discarded. The discarded fetch is
    // the distributed path's cost for the local path's saved count job:
    // bounded at ~48 B/edge of transient driver heap (≈50 MB at the 2^20
    // default, GC'd immediately), paid only on >threshold graphs that
    // then run O(log n) multi-job star rounds anyway.
    val s = docs.sparkSession
    import s.implicits._
    val localCap = math.min(localThreshold, Int.MaxValue - 1L).toInt
    val headEdges: Array[(Long, Long)] =
      if (localCap >= 0) edges.limit(localCap + 1).as[(Long, Long)].collect()
      else Array.empty
    if (localCap >= 0 && headEdges.length <= localCap) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      headEdges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by min: smaller id becomes the root
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val labels = parent.keys.toSeq.map(x => (x, find(x))).filter(p => p._1 != p._2)
      val lab = labels.toDF("doc_id", "cluster")
      return docs.select(col("doc_id"))
        .join(broadcast(lab), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .withColumn("is_canonical",
          (col("doc_id") === col("cluster")).cast("long"))
    }
    val nodeWin = org.apache.spark.sql.expressions.Window.partitionBy("u")
    // large-star: around each node u, link every strictly-larger neighbor
    // to min(N(u) ∪ {u}); small-star: orient edges large→small, link every
    // smaller-or-equal neighbor (and u itself) to that minimum.
    def largeStar(e: DataFrame): DataFrame = {
      val both = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      // duplicates tolerated here — small-star's per-node min is
      // unaffected and its final distinct dedups; saves a shuffle per round
      both.withColumn("m", least(col("u"), min("v").over(nodeWin)))
        .where(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      val m = oriented.withColumn("m", least(col("u"), min("v").over(nodeWin)))
      m.select(col("v").as("a"), col("m").as("b"))
        .unionByName(m.select(col("u").as("a"), col("m").as("b")))
        .where(col("a") =!= col("b")).distinct()
    }
    var iter = 0
    var converged = edges.isEmpty
    while (iter < maxIter && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // exact fixpoint test: both distinct sets, so symmetric difference
      // empty ⇔ equal; one bounded shuffle, no sum overflow at any scale
      converged = next.unionByName(edges)
        .groupBy(col("a"), col("b")).count()
        .where(col("count") =!= 2).isEmpty
      // release the previous round's checkpoint blocks — `next` is already
      // materialized (eager checkpoint) and no longer reads them; without
      // this every round's full edge copy stays in executor storage until
      // the job ends
      edges.unpersist(blocking = false)
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIter star rounds — " +
          "labels would be incorrect; raise maxIter")
    // at the star fixpoint every non-root points at its component minimum;
    // roots and singleton docs default to themselves
    val lab = edges.select(col("a").as("doc_id"), col("b").as("cluster"))
      .groupBy("doc_id").agg(min("cluster").as("cluster"))
    docs.select(col("doc_id")).join(lab, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .withColumn("is_canonical",
        (col("doc_id") === col("cluster")).cast("long"))
  }

  /** Execute a dedup verdict END-TO-END — the destructive step every
    * upstream operator here only prepares: route the pair verdict
    * (typically [[consensusPairs]], the precision gate) through the
    * [[dupClusters]] star-contraction union-find, keep the LOWEST doc_id
    * per cluster, and emit every document's disposition in one frame:
    * `(doc_id, <doc passthrough cols>, cluster, kept, kept_id,
    * n_dropped)`. `kept = 1` rows are the deduped corpus; `kept = 0`
    * rows are the audit side-output a pipeline owner reviews (each names
    * the `kept_id` that shadows it); `n_dropped` on a kept row is how
    * many documents its survival deleted (0 for singletons). The two
    * slices PARTITION the corpus by construction — kept ∪ dropped is
    * exactly the input, disjoint (DedupSpec pins it).
    *
    * Scale: [[dupClusters]] bounds the iterative work by the pair-list
    * size (its localCheckpointed edge fixpoint is shared by both slices
    * of this one frame — filtering kept/dropped does NOT re-run the
    * union-find); cluster sizes come from a map-side-combinable
    * `groupBy(cluster).count()` over ONLY the non-canonical rows — a
    * frame bounded by the pair-list endpoints, NOT the corpus — left
    * joined back (singletons coalesce to 1). No `PARTITION BY cluster`
    * window anywhere: a 90%-one-cluster corpus would force that window's
    * buffer to hold the mega-cluster in one task, whereas the partial
    * aggregation combines map-side and the join streams (DedupSpec pins
    * the mega-cluster case; PlanContractSpec pins the window's absence).
    * The join back to `docs` is doc_id-keyed.
    *
    * Precondition: `pairs` endpoints must be drawn from `docs` (every
    * pair producer in this module guarantees it — pairs come from
    * self-joins over the corpus). The non-canonical-count-plus-one size
    * formula counts the cluster ROOT implicitly, so a phantom endpoint
    * absent from `docs` that happens to be a component minimum would
    * inflate `n_dropped` by the phantoms; phantom rows themselves never
    * appear in the output (the doc_id-keyed join back drops them). */
  def dedupApply(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = dupClusters(docs, pairs)
    // every member of a non-trivial cluster except its root is
    // non-canonical, so size = non-canonical count + 1; the grouped frame
    // has one row per NON-TRIVIAL cluster (pair-bounded, never corpus)
    val sizes = labels.where(col("is_canonical") === 0L)
      .groupBy(col("cluster"))
      .agg((count(lit(1)) + 1L).as("n_members"))
    val cl = labels.join(sizes, Seq("cluster"), "left")
      .withColumn("n_members", coalesce(col("n_members"), lit(1L)))
    docs.join(cl, Seq("doc_id"))
      .withColumn("kept", col("is_canonical"))
      .withColumn("kept_id", col("cluster"))
      .withColumn("n_dropped",
        when(col("kept") === 1, col("n_members") - 1L).otherwise(lit(0L)))
      .drop("is_canonical", "n_members")
  }

  /** Quality-aware canonical selection over duplicate clusters: instead of
    * [[dupClusters]]'s min-id convention, each cluster keeps its
    * highest-quality member (here: most tokens, the simplest length-quality
    * proxy — swap in a Gopher score or LM bits without changing the shape),
    * tie-broken by doc_id so the choice is total. One broadcast-sized
    * window per cluster; clusters are pair-bounded so the window partition
    * never exceeds a cluster's size. */
  def canonicalByQuality(docs: DataFrame, clusters: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nw = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("n_words").desc, col("doc_id"))
    clusters.select(col("doc_id"), col("cluster"))
      .join(nw, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("cluster"), col("n_words"),
        (col("rk") === 1).cast("long").as("is_canonical"))
  }

  /** First-occurrence novelty per document: the fraction of each doc's
    * DISTINCT n-grams whose global first occurrence (minimum doc_id) is
    * this doc — the marginal-information curve of a growing corpus. The
    * curation signal behind "the next crawl snapshot adds almost nothing":
    * ingestion-ordered novelty decays as the corpus saturates, and docs
    * with near-zero novelty are template/boilerplate candidates the
    * pairwise dedup family prices per-pair instead of per-doc.
    *
    * All-integer: grams key on the 60-bit md5, the fraction is
    * `1e6·novel div distinct`. Scale: the gram explode is narrow; ONE
    * gram-keyed shuffle serves the per-doc distinct, the first-occurrence
    * min, and the join back (same key, same partitioning); the final
    * rollup is doc-keyed. No pair generation anywhere — this is the O(n)
    * complement to the O(pairs) dedup operators. */
  def noveltyFraction(docs: DataFrame, n: Int = 5): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
    val grams = toks.select(col("doc_id"),
      explode(transform(sequence(lit(0), size(col("t")) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(col("t"), i + j + 1)): _*)))
        .as("g"))
      .select(col("doc_id"), md5Int60(col("g")).as("gh"))
      .distinct()
    val first = grams.groupBy(col("gh")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("first_doc") === col("doc_id")).cast("long")).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("(1000000 * n_novel) div n_grams").as("novelty_micro"))
  }


  /** Exact duplicate-substring spans (the substring-dedup signal of Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 §3.1): every maximal token span of a document whose
    * `n`-gram content also appears in at least one OTHER document. The
    * full suffix-array construction of the paper is replaced by its
    * standard distributed approximation — positioned `n`-gram fingerprints
    * — which finds exactly the duplicated regions of length ≥ `n` tokens
    * (shorter overlaps are below the signal floor by construction).
    *
    * Pipeline: positioned token `n`-grams → 60-bit md5 fingerprint →
    * cross-document frequency (a gram is "duplicated" iff ≥ 2 distinct
    * docs contain it) → per-doc gaps-and-islands merge of overlapping
    * duplicated positions (`pos > prev + n` opens a new span, since
    * [prev, prev+n-1] and [pos, pos+n-1] overlap or touch iff
    * pos ≤ prev+n).
    *
    * Scale: the explode is a narrow ~tokens×1 map (each position emits one
    * gram); the df count and the hit join shuffle once on the 60-bit gram
    * key (uniform by construction); the island merge shuffles once on
    * doc_id and runs inside each doc's partition. Everything is integer
    * arithmetic — no floats anywhere. Returns
    * (doc_id, span_start, span_end, span_len) in token offsets. */
  def dupSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
    val grams = toks.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("t")) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(col("t"), i + j + 1)): _*))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5Int60(col("col")).as("g"))
      .repartition(col("g"))
    // grams in ≥2 distinct docs; both consumers read the one g exchange
    val dupG = grams.groupBy(col("g"))
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).select(col("g"))
    val hits = grams.join(dupG, Seq("g")).select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = hits
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("new_span",
        when(col("prev").isNull || col("pos") > col("prev") + n, 1L).otherwise(0L))
    marked
      .withColumn("span", sum(col("new_span")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** Segment-level exact dedup with document reassembly — the
    * line/paragraph-dedup pass of the CCNet / RefinedWeb pipelines
    * (Wenzek et al. 2020, arXiv:1911.00359 §3.1 removes lines duplicated
    * across shards; Penedo et al. 2023, arXiv:2306.01116 §3.3 drops
    * duplicated spans in place), re-expressed for corpora whose segment
    * boundary is a fixed token window rather than a newline (the segment
    * splitter is the only corpus-specific piece).
    *
    * Semantics: split each document into consecutive `segTokens`-token
    * windows ([[graft.text.TextAnalysis.chunk]] with zero overlap), keep
    * only the globally-first occurrence of each distinct segment — first =
    * minimum (doc_id, seg_idx), so the rule is deterministic and repeated
    * segments WITHIN a document also collapse — then reassemble the
    * survivors in document order. One output row per input document:
    * `(doc_id, n_segs, n_kept, clean_text)`, `clean_text = ""` when every
    * segment was a repeat. `dropEmptied = true` makes the policy explicit
    * and removes those fully-deduplicated rows (`n_kept = 0`) from the
    * output; the default keeps them so callers can count what emptied.
    *
    * Scale (100 TB): one shuffle on the 16-byte segment hash (the
    * first-occurrence window — per-key fan-in bounded by that segment's
    * duplicate count) and one shuffle on doc_id for reassembly; both
    * key-partitioned, nothing pairwise. The reassembly state per doc is
    * the kept segments of ONE document — bounded by document length, the
    * same bound the input row already carries. */
  def segmentDedup(docs: DataFrame, segTokens: Int = 10,
      dropEmptied: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val segs = graft.text.TextAnalysis.chunk(docs, maxTokens = segTokens)
    val firstOcc = Window.partitionBy(md5(col("chunk_text")))
      .orderBy(col("doc_id"), col("chunk_idx"))
    val marked = segs
      .withColumn("keep", row_number().over(firstOcc) === 1)
    val out = marked.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the nulls of non-kept segments; array_sort on
        // (chunk_idx, text) structs restores document order deterministically
        array_join(transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("chunk_idx"), col("chunk_text"))))),
          s => s.getField("chunk_text")), " ").as("clean_text"))
    if (dropEmptied) out.filter(col("n_kept") > 0) else out
  }

  /** Corpus snapshot diff: classify every document across two corpus
    * versions as `added` / `removed` / `changed` / `unchanged` by content
    * hash — the audit step between training-data releases ("what moved
    * between v3 and v4?") that gates incremental re-processing: only
    * `added`+`changed` need re-scoring/deduplication, and `removed` feeds
    * tombstones to downstream indexes.
    *
    * Shape: each side reduces to (key, md5(content)) map-side, then ONE
    * full outer join on the key. At 100 TB that is the minimal possible
    * data movement for a diff — two key-partitioned exchanges carrying a
    * 32-char digest per document instead of documents — and AQE handles
    * any key skew like ordinary join skew. md5, not `hash()`/xxhash64, so
    * any engine (and any prior snapshot's stored digest) reproduces the
    * same verdicts. */
  def snapshotDiff(prev: DataFrame, curr: DataFrame, key: String,
      content: Column): DataFrame = {
    val p = prev.select(col(key).as("k"), md5(content).as("prev_hash"))
    val c = curr.select(col(key).as("k"), md5(content).as("curr_hash"))
    p.join(c, Seq("k"), "full_outer")
      .select(
        col("k").as(key),
        when(col("prev_hash").isNull, lit("added"))
          .when(col("curr_hash").isNull, lit("removed"))
          .when(col("prev_hash") === col("curr_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("prev_hash"), col("curr_hash"))
  }

  /** Content-defined chunking: split each document at positions chosen by
    * the text CONTENT (a rolling-hash cut rule — see
    * [[graft.functions.CdcBoundaries]]) instead of at fixed strides. The
    * property that matters for dedup: inserting one character into a
    * document shifts every downstream fixed-stride segment (so
    * [[segmentDedup]]'s hashes all change) but leaves every content-defined
    * chunk after the edit's own chunk identical — chunk hashes stay
    * shareable across document versions, which is what makes
    * cross-snapshot segment dedup and delta storage work. Expected chunk
    * length is `mask` characters.
    *
    * Output: one row per chunk — `(doc_id, chunk_idx, start_pos,
    * chunk_len, chunk_md5)`, positions 1-based in code points. Documents
    * shorter than `w` yield one whole-document chunk; empty documents
    * yield none.
    *
    * Scale: a narrow map — the boundary scan is the O(n) native codegen
    * expression, the span explode is per-row, and no shuffle happens at
    * all until a downstream consumer groups by `chunk_md5` (which then
    * shuffles 32-char digests, not text). */
  def cdcChunks(docs: DataFrame, w: Int = 8, mask: Int = 64): DataFrame = {
    val n = length(col("text"))
    docs
      .select(col("doc_id"), col("text"),
        graft.functions.CdcBoundaries.cdc_boundaries(col("text"), w, mask)
          .as("bounds"), n.as("n"))
      .withColumn("starts", concat(array(lit(0)), col("bounds")))
      .withColumn("ends",
        when(size(col("bounds")) > 0 &&
            element_at(col("bounds"), size(col("bounds"))) === col("n"),
          col("bounds"))
          .otherwise(concat(col("bounds"), array(col("n")))))
      .withColumn("spans", filter(
        transform(sequence(lit(1), size(col("ends"))),
          k => struct(
            element_at(col("starts"), k).as("s"),
            (element_at(col("ends"), k) - element_at(col("starts"), k))
              .as("l"))),
        sp => sp.getField("l") > 0))
      .select(col("doc_id"), col("text"), posexplode(col("spans")))
      .select(col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        (col("col.s") + 1).cast("long").as("start_pos"),
        col("col.l").cast("long").as("chunk_len"),
        md5(col("text").substr(col("col.s") + 1, col("col.l")))
          .as("chunk_md5"))
  }
  /** Asymmetric shingle CONTAINMENT pairs (Broder 1997, "On the
    * resemblance and containment of documents": c(A,B) =
    * |S(A)∩S(B)| / |S(A)|) — the near-dup semantic Jaccard cannot see: a
    * short document quoted wholesale inside a long one scores near-zero
    * Jaccard (the union is dominated by the long side) but containment
    * ~1.0 on the short side. The quote/subset/boilerplate-page detector
    * next to [[ngramJaccardPairs]].
    *
    * Emits both directions (`cont_a` = fraction of A's shingles inside
    * B, `cont_b` symmetric) for every pair clearing `threshold` on
    * EITHER side — the caller reads which side is the contained one.
    * Each containment is ONE double division of exact counts.
    *
    * Scale: identical machinery to the Jaccard join — distinct-shingle
    * table, `maxDocFrequency` cap dropping boilerplate shingles before
    * the self-join (the O(df²) bound), pair fan-out only where overlap
    * exists. */
  def containmentPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.5,
      maxDocFrequency: Option[Int] = Some(1000)): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1]: $threshold")
    val sh = shingleTable(docs, k).repartition(col("shingle"))
    val shc = maxDocFrequency match {
      case Some(cap) =>
        val kept = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("shingle"))
        sh.join(kept, Seq("shingle"))
      case None => sh
    }
    val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // SHUFFLE_HASH — same strategy pick as [[ngramJaccardPairs]]: skip
    // the sort-merge sorts on the shared shingle exchange
    val pairs = shc.as("a").hint("shuffle_hash")
      .join(shc.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("cont_a", col("inter").cast("double") / col("na").cast("double"))
      .withColumn("cont_b", col("inter").cast("double") / col("nb").cast("double"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
        col("cont_a"), col("cont_b"))
  }
}
