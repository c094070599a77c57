package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.text.TextAnalysis

class RetrievalSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private val corpus = docsOf(
    (10L, "spark query engine runs fast"),
    (11L, "spark spark spark everywhere"),
    (12L, "slow batch table scan"),
    (13L, "query planner picks the fast path"),
    (14L, "unrelated words entirely here"))

  test("bm25ForQueries matches bm25TopK when the query is a term list") {
    // a query doc whose distinct tokens are exactly the literal term set
    val q = docsOf((0L, "spark query")).select(
      col("doc_id").as("query_id"), col("text"))
    val multi = Retrieval.bm25ForQueries(corpus, q, topK = 10)
      .select(col("doc_id"), col("score"), col("terms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val single = TextAnalysis.bm25TopK(corpus, Seq("spark", "query"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(multi == single)
  }

  test("bm25ForQueries: per-query ranks dense from 1, repeated query tokens count once") {
    val q = docsOf(
      (0L, "spark spark spark"), // tf in the QUERY must not triple-count
      (1L, "fast query")).select(col("doc_id").as("query_id"), col("text"))
    val out = Retrieval.bm25ForQueries(corpus, q, topK = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("terms")))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // query 0 = single term: every hit has terms == 1
    assert(out.filter(_._1 == 0L).forall(_._4 == 1L))
    // the spark-heavy doc outranks single-mention docs for query 0
    assert(out.filter(_._1 == 0L).minBy(_._2)._3 == 11L)
  }

  private def listOf(rows: (Long, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("query_id", "item_id", "rank")
  }

  test("rrfFuse: hand-computed integer fusion, both-lists item wins") {
    // list A: item 1 rank 1, item 2 rank 2; list B: item 2 rank 1, item 3 rank 2
    // rr(1)=1e9/61=16393442; rr(2)=1e9/62+1e9/61=16129032+16393442=32522474
    // rr(3)=1e9/62=16129032 -> order: 2, 1, 3
    val out = Retrieval.rrfFuse(Seq(
        listOf((7L, 1L, 1L), (7L, 2L, 2L)),
        listOf((7L, 2L, 1L), (7L, 3L, 2L))), c = 60, topK = 10)
      .collect().map(r => (r.getAs[Long]("fused_rank"), r.getAs[Long]("item_id"),
        r.getAs[Long]("rrf_micro"), r.getAs[Long]("n_lists"))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 2L, 32522474L, 2L), (2L, 1L, 16393442L, 1L),
      (3L, 3L, 16129032L, 1L)))
  }

  test("rrfFuse: queries fuse independently; topK truncates per query") {
    val a = listOf((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L))
    val b = listOf((1L, 11L, 1L), (2L, 21L, 1L))
    val out = Retrieval.rrfFuse(Seq(a, b), topK = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("item_id"))).toSet
    // query 1: item 11 is in both lists and wins; query 2: equal single
    // ranks tie and item_id 20 < 21 takes the slot
    assert(out == Set((1L, 11L), (2L, 20L)))
    // ties across single-list items at the same rank break on item_id
    val tie = Retrieval.rrfFuse(Seq(listOf((3L, 5L, 1L)), listOf((3L, 4L, 1L))),
        topK = 1)
      .collect().map(_.getAs[Long]("item_id")).toSeq
    assert(tie == Seq(4L))
  }

  test("rankOverlap: exact overlap@k per depth, zero-overlap depths kept") {
    val s = spark
    import s.implicits._
    def ranking(items: Long*) =
      items.zipWithIndex.map { case (it, i) => (it, (i + 1).toLong) }
        .toDF("item_id", "rank")
    val a = ranking(1L, 2L, 3L, 4L, 5L)
    val b = ranking(5L, 4L, 3L, 2L, 1L) // fully reversed
    val got = Retrieval.rankOverlap(a, b, depths = Seq(2, 3, 5))
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_overlap"),
        r.getAs[Double]("overlap_frac")))
    // @2: {1,2} vs {5,4} → 0; @3: {1,2,3} vs {5,4,3} → 1; @5: identical sets
    assert(got.toList == List((2L, 0L, 0.0), (3L, 1L, 1.0 / 3.0), (5L, 5L, 1.0)))
  }
}
