package graft

/** Plan contracts over every gated query at sf0.001: the properties that
  * make the engine scale are asserted on the PHYSICAL plan, so a silent
  * optimizer / code-shape regression (a cartesian product sneaking in, a
  * star join losing its broadcast) fails a test instead of a bench round.
  */
class PlanContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("no gated query plans a cartesian product") {
    // the ANN scoring crossJoin is against a broadcast query set — Spark
    // plans it as BroadcastNestedLoopJoin, never CartesianProduct
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("star joins broadcast their dimension side") {
    Seq("q3_shipping", "q5_local").foreach { name =>
      val plan = planOf(name)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"$name lost its broadcast: $plan")
    }
  }

  test("ANN scoring broadcasts the query side") {
    Seq("q_ann_topk", "q_ann_ivf", "q_ann_kmeans", "q_contamination").foreach { name =>
      val plan = planOf(name)
      assert(plan.contains("BroadcastExchange"), s"$name lost its broadcast")
    }
  }

  test("jaccard variants keep the single shared shingle exchange shape") {
    Seq("q_ngram_jaccard", "q_ngram_jaccard_exact").foreach { name =>
      val plan = planOf(name)
      // the explicit repartition(shingle) appears as a hashpartitioning
      // exchange; ReuseExchange/AQE stage reuse dedupes it at runtime
      assert(plan.contains("hashpartitioning(shingle"), s"$name lost the shingle exchange")
    }
  }
}
