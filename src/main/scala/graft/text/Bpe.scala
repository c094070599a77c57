package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer-training support (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * pre-training pipeline stage the corpus operators feed: BPE trains on
  * the WORD-FREQUENCY table, not the corpus, so after one corpus-sized
  * aggregation every further round is bounded by vocabulary size. That
  * asymmetry is the whole scale story: at 100 TB the `(word, count)`
  * table is millions of rows where the corpus is trillions of tokens, and
  * the iterative merge loop never touches the corpus again.
  *
  * Pair statistics are exact integer counts (word count × occurrences),
  * so ranking and tie-breaks are engine-independent: best pair = highest
  * count, then lexicographically smallest `(left, right)`.
  */
object Bpe {

  /** The word-frequency table: one corpus-sized aggregation, map-side
    * combined, keyed shuffle on the word. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.wsTokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))

  /** BPE iteration-1 pair statistics straight off the corpus: every
    * adjacent character pair of every word, weighted by word frequency —
    * the merge-candidate ranking the trainer's first round consumes, and
    * the gateable (single-round, closed-form) face of BPE training.
    * Overlapping pairs all count (`"aaa"` yields `aa` twice), matching
    * the standard formulation.
    *
    * Scale: word counts shuffle once on the word; the pair expansion runs
    * over the VOCABULARY table (not the corpus), and the top-K is a
    * TakeOrdered — no global sort. */
  def pairCounts(docs: DataFrame, topK: Int = 50): DataFrame =
    wordCounts(docs)
      .filter(length(col("w")) >= 2)
      .select(col("wc"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(topK)

  /** One recorded merge: `left + right -> merged` with its pair count at
    * selection time. The merge list IS the trained tokenizer. */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, n: Long)

  private def pairStats(seg: DataFrame): DataFrame =
    seg.filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(
          element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wc")).as("n"))

  /** Apply one merge to a symbol array with BPE's greedy left-to-right,
    * non-overlapping semantics (`aaa` under merge `(a,a)` → `[aa, a]`):
    * a fold that either glues `x` onto a matching last symbol or appends. */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val merged = a + b
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, size(acc)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** Corpus ENCODING with a fixed merge table — tokenizer APPLY, the
    * other half of the BPE lifecycle: [[train]] produces a merge list;
    * this applies a given one (e.g. a published tokenizer's merges) to a
    * corpus. Merge-list order IS rank order — merge `i` is fully applied
    * (greedy left-to-right, non-overlapping, [[applyMerge]]) before
    * merge `i+1`, matching reference BPE encoders.
    *
    * Scale (Sennrich's own trick, same asymmetry as [[train]]): the K
    * merge folds run over the DISTINCT-WORD table — bounded by
    * vocabulary, millions of rows at 100 TB — never the corpus; the
    * trillions of token positions pay one keyed join against the
    * segmented vocab plus a per-doc ordered reassembly (both map-side
    * combinable shuffles). A word-level cache is exactly how production
    * tokenizers amortize encoding, expressed relationally.
    *
    * Output: `(doc_id, n_words, n_subwords, encoded)` with `encoded`
    * the space-joined subword sequence in document order. */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = TextAnalysis.wsTokens(col("text"))
    val vocab = docs.select(explode(toks).as("w")).distinct()
    // the whole merge-table application runs as ONE native codegen
    // expression per distinct word (r18): the K chained [[applyMerge]]
    // aggregate HOFs it replaces ran interpreted and copied the symbol
    // array per step; value-identical greedy left-to-right fold
    // ([[graft.functions.BpeEncodeWord]], pinned by BpeSpec)
    val seg = vocab.withColumn("syms",
      graft.functions.BpeEncodeWord.bpe_encode_word(col("w"), merges))
    docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "w")))
      .join(seg, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          p => p.getField("syms"))).as("subs"))
      .select(col("doc_id"), col("n_words"),
        size(col("subs")).cast("long").as("n_subwords"),
        concat_ws(" ", col("subs")).as("encoded"))
  }

  /** The iterative trainer: rounds of count-pairs → pick-best →
    * re-segment, all over the cached vocabulary table. Returns the
    * ordered merge list and the final segmentation `(w, wc, syms)`.
    * Stops early when no pair remains.
    *
    * `mergeBatch = 1` (the default) is EXACT Sennrich: one argmax, one
    * merge, one re-segmentation per round. `mergeBatch = M > 1` is the
    * standard large-vocab batching trick: each round takes the frozen
    * `(n desc, a, b)` ranking and greedily accepts a PREFIX of it — a
    * candidate is accepted only while its components and concatenation
    * are symbol-disjoint from every already-accepted pair's (the first
    * rejected candidate ends the batch) — then applies all accepted
    * merges in ONE re-segmentation. Disjointness makes the application
    * exact: none of the accepted merges can create, destroy, or reorder
    * each other's occurrences (merging two adjacent symbols never makes
    * two previously non-adjacent symbols adjacent), so applying the
    * batch equals applying it sequentially in rank order. What batching
    * MAY change vs `mergeBatch = 1` is the selection tail: a merge
    * creates new pairs involving its merged symbol, and exact BPE would
    * re-rank those before the batch's later entries — so for M > 1 the
    * merge LIST is a documented approximation (the order within a round
    * is the frozen ranking, not the re-ranked one). Driver round-trips
    * drop by the mean accepted-batch size; the per-round collect stays
    * bounded (`4·M` candidate rows, the bounded-model-state pattern).
    *
    * Each round re-segments the vocab table and `localCheckpoint`s it
    * (the [[graft.dedup.Dedup]] iterative-plan discipline: lineage stays
    * O(1), the previous round's cache is released). */
  def train(docs: DataFrame, numMerges: Int,
      mergeBatch: Int = 1): (Seq[Merge], DataFrame) = {
    require(mergeBatch >= 1, s"mergeBatch must be >= 1: $mergeBatch")
    var seg = wordCounts(docs)
      .withColumn("syms", filter(split(col("w"), ""), s => s =!= ""))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val want = math.min(mergeBatch, numMerges - rank + 1)
      val top = pairStats(seg)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(math.max(1, want * 4)).collect()
      if (top.isEmpty) done = true
      else {
        // greedy prefix acceptance under symbol-string disjointness:
        // stop at the FIRST conflicting candidate — skipping it and
        // accepting a later one would reorder the frozen ranking
        val used = scala.collection.mutable.Set[String]()
        val accepted = scala.collection.mutable.ListBuffer[(String, String, Long)]()
        val it = top.iterator
        var open = true
        while (open && it.hasNext && accepted.size < want) {
          val r = it.next()
          val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
          val parts = Set(a, b, a + b)
          if (parts.exists(used.contains)) open = false
          else { accepted += ((a, b, n)); used ++= parts }
        }
        val next = accepted.foldLeft(seg) { case (s, (a, b, n)) =>
          merges += Merge(rank, a, b, a + b, n)
          rank += 1
          s.withColumn("syms", applyMerge(col("syms"), a, b))
        }.localCheckpoint()
        seg.unpersist()
        seg = next
      }
    }
    (merges.result(), seg)
  }
}
