package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.wsTokens

/** Multi-query retrieval + rank fusion: the lookup side of a
  * training-data pipeline (find the corpus documents most similar to a
  * probe set — for decontamination triage, eval-neighborhood audits,
  * retrieval-augmented filtering). The reference broker has no retrieval
  * surface; this extends the pipeline family (SURVEY §2.9 extensions)
  * alongside [[graft.text.TextAnalysis.bm25TopK]] (single query) and
  * [[graft.similarity.Similarity]] (embedding ANN).
  */
object Retrieval {

  /** BM25 rankings for a TABLE of queries in ONE corpus pass — the
    * many-query generalization of [[graft.text.TextAnalysis.bm25TopK]],
    * which takes one literal term list and would cost one corpus scan per
    * query. Queries are documents themselves (`query_id`, `text`); each
    * query's terms are its distinct tokens.
    *
    * Identical fixed-point scoring to the single-query form (quarter-log2
    * idf, 1e-6 tf-norm, k1 = 1.2, b = 0.75 — same int64 headroom note:
    * corpus-scale L needs the double mode there), so per-query rankings
    * are bit-identical across engines; ranks break ties on `doc_id`.
    *
    * Scale shape: the probe set is small by definition — its distinct
    * (query_id, term) table BROADCASTS, and the corpus token scan is
    * filtered map-side by the broadcast term set before the only
    * exchange, so the shuffle carries ≤ |query vocab| rows per doc no
    * matter how many queries ride along. df comes from that same
    * filtered table; stats (N, L) is a 1-row broadcast. The per-query
    * top-k window short-circuits via WindowGroupLimit. */
  def bm25ForQueries(corpus: DataFrame, queries: DataFrame,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(wsTokens(col("text")))).as("tok"))
    val t = corpus.select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val stats = t.agg(count(lit(1)).cast("long").as("n"),
      sum(size(col("toks"))).cast("long").as("l"))
    val tf = t
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .join(broadcast(qterms.select(col("tok")).distinct()), Seq("tok"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    def bits(c: org.apache.spark.sql.Column) =
      (length(bin(c)) - 1).cast("long")
    val contrib = tf
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), Seq("tok"))
      // same in-plan pow4 headroom guard as TextAnalysis.bm25TopK: the
      // exact idf wraps int64 past 55,107 documents — fail loudly
      .withColumn("idf4",
        when(col("n") + 1 <= 55108,
          bits(expr("((n+1)*(n+1)*(n+1)*(n+1)) div (df*df*df*df)")))
          .otherwise(raise_error(lit(
            "bm25ForQueries exact idf overflows past 55107 documents"))))
      .withColumn("c",
        col("idf4") * expr("(1000000*22*l*tf) div (10*l*tf + 3*l + 9*dl*n)"))
    contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score"), count(lit(1)).as("terms"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("terms"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * merge per-query rankings from heterogeneous retrievers — lexical
    * BM25, embedding ANN, anything that emits `(query_id, item_id,
    * rank)` — by `Σ_lists 1/(c + rank)`, the standard hybrid-retrieval
    * combiner (rank-only, so incomparable score scales never need
    * calibration). Computed in exact integer micro-units
    * `1_000_000_000 div (c + rank)` — sums of longs are
    * order-independent, so the fused ranking is bit-identical on any
    * engine (a float Σ 1/(c+r) would hash-diverge on summation order).
    * An item missing from a list contributes nothing; ties break on
    * `item_id`.
    *
    * Scale shape: inputs are already top-k lists — k rows per query per
    * retriever, never corpus-sized. One union + one (query, item) keyed
    * aggregate; the per-query top-k window short-circuits via
    * WindowGroupLimit. */
  def rrfFuse(lists: Seq[DataFrame], c: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranking")
    require(c >= 0 && topK >= 1, s"bad params c=$c topK=$topK")
    val scored = lists.map(_.select(col("query_id"), col("item_id"),
        expr(s"1000000000L div (${c}L + rank)").as("rr")))
      .reduce(_ unionAll _)
    scored
      .groupBy(col("query_id"), col("item_id"))
      .agg(sum(col("rr")).as("rrf_micro"), count(lit(1)).as("n_lists"))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_micro").desc, col("item_id"))).cast("long"))
      .filter(col("fused_rank") <= topK)
      .select(col("query_id"), col("fused_rank"), col("item_id"),
        col("rrf_micro"), col("n_lists"))
  }

  /** Rank-agreement table between two rankings: overlap@k — |top-k(A) ∩
    * top-k(B)| — at each requested depth, plus the fraction. The
    * rank-correlation diagnostic run when swapping a retrieval scorer
    * (does the cheap ranker agree with the expensive one where it
    * matters — at the top?).
    *
    * Inputs are `(item_id, rank)` relations whose rank is a dense 1-based
    * total order (the [[rrfFuse]]/top-k producers' contract). Only rows
    * with rank ≤ max(depths) participate, so the join touches
    * depth-bounded inputs — at 100 TB the rankings are the small output
    * of a prior top-k stage, never the corpus. Output is one exact row
    * per depth (depths with zero overlap included via the left join). */
  def rankOverlap(a: DataFrame, b: DataFrame,
      depths: Seq[Int] = Seq(10, 25, 50)): DataFrame = {
    require(depths.nonEmpty && depths.forall(_ >= 1), s"bad depths $depths")
    val kMax = depths.max
    val joined = a.filter(col("rank") <= kMax)
      .select(col("item_id"), col("rank").as("ra"))
      .join(b.filter(col("rank") <= kMax)
        .select(col("item_id"), col("rank").as("rb")), Seq("item_id"))
    val spark = a.sparkSession
    import spark.implicits._
    val ks = depths.map(_.toLong).toDF("k")
    broadcast(ks)
      .join(joined, col("ra") <= col("k") && col("rb") <= col("k"), "left")
      .groupBy(col("k"))
      .agg(count(col("item_id")).as("n_overlap"))
      .select(col("k"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("k").cast("double"))
          .as("overlap_frac"))
  }
}
