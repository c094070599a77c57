package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {

  private def eventsOf(rows: (Long, Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("user_id", "ts", "event_id", "event_type")
  }

  private def edgesOf(rows: (String, String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("src", "dst", "w")
  }

  private def nodesOf(ns: String*) = {
    val s = spark
    import s.implicits._
    ns.toSeq.toDF("node")
  }

  test("transitionEdges: per-user consecutive pairs, (ts, event_id) order") {
    // user 1: a@1 b@2 a@3 -> a->b, b->a; user 2: a@5 b@5 (tie broken by
    // event_id 10 < 11) -> a->b; single-event user 3 contributes nothing
    val ev = eventsOf(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (2L, 5L, 11L, "b"), (2L, 5L, 10L, "a"),
      (3L, 9L, 20L, "c"))
    val got = Graph.transitionEdges(ev).orderBy("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("pageRank: hand-computed two iterations in 1000-unit fixed point") {
    // a->b w2, b->a w1, b->c w1; out: a=2, b=2; base = 150
    // iter1: a=150+425=575  b=150+850=1000  c=150+425=575
    // iter2: a=150+425=575  b=150+((575*2 div 2)*85 div 100=488)=638  c=575
    val ranks = Graph.pageRank(nodesOf("a", "b", "c"),
        edgesOf(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)),
        iterations = 2, scale = 1000L)
      .orderBy("node").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ranks == Seq(("a", 575L), ("b", 638L), ("c", 575L)))
  }

  test("hits: hand-computed two iterations, max-normalized to scale 1000") {
    // a->b w2, b->a w1, b->c w1; h0 = 1000 each
    // iter1: auth raw (a,b,c)=(1000,2000,1000) -> norm (500,1000,500)
    //        hub  raw (2000,1000,0)            -> norm (1000,500,0)
    // iter2: auth raw (500,2000,500)           -> norm (250,1000,250)
    //        hub  raw (2000,500,0)             -> norm (1000,250,0)
    val got = Graph.hits(nodesOf("a", "b", "c"),
        edgesOf(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)),
        iterations = 2, scale = 1000L)
      .orderBy("node").collect()
      .map(r => (r.getString(0), r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toSeq
    assert(got == Seq(("a", 1000L, 250L), ("b", 250L, 1000L), ("c", 0L, 250L)))
  }

  test("personalizedPageRank: mass flows only from seeds; disconnected nodes stay 0") {
    // a->b w1, seed {a}, scale 1000: r0 = (1000, 0, 0)
    // iter1: b gets floor(1000*85/100) = 850 -> (150, 850, 0)
    // iter2: b gets floor(150*85/100) = 127 -> (150, 127, 0)
    val got = Graph.personalizedPageRank(nodesOf("a", "b", "c"),
        edgesOf(("a", "b", 1L)), seeds = Set("a"),
        iterations = 2, scale = 1000L)
      .orderBy("node").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 150L), ("b", 127L), ("c", 0L)))
    // uniform-seed PPR over ALL nodes equals plain pageRank by definition
    val nodes = nodesOf("x", "y")
    val edges = edgesOf(("x", "y", 2L), ("y", "x", 1L))
    val ppr = Graph.personalizedPageRank(nodes, edges, Set("x", "y"),
      iterations = 3, scale = 1000L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val pr = Graph.pageRank(nodes, edges, iterations = 3, scale = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ppr == pr)
  }

  test("hits: determinism and isolated-node zeros") {
    val nodes = nodesOf("x", "y", "z") // z isolated
    val edges = edgesOf(("x", "y", 3L))
    val a = Graph.hits(nodes, edges).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val b = Graph.hits(nodes, edges).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a == b)
    // x is the only hub, y the only authority; z touches no edge
    assert(a("x") == (1000000L, 0L) && a("y") == (0L, 1000000L))
    assert(a("z") == (0L, 0L))
  }

  test("pageRank: zero iterations returns the uniform init; determinism") {
    val nodes = nodesOf("x", "y")
    val edges = edgesOf(("x", "y", 3L))
    val r0 = Graph.pageRank(nodes, edges, iterations = 0, scale = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r0 == Map("x" -> 7L, "y" -> 7L))
    val a = Graph.pageRank(nodes, edges, iterations = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = Graph.pageRank(nodes, edges, iterations = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
    // y is a sink (no out-edges): x receives base only after iter 1
    assert(a("x") == 150000000L)
  }

  private def undirected(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("a", "b")
  }

  test("triangleCounts: each triangle once, attributed to all three corners") {
    // K4 minus edge (3,4): triangles (1,2,3) and (1,2,4)
    val e = undirected((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val out = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    // pendant node in no triangle is absent; a plain path has none
    assert(Graph.triangleCounts(undirected((1L, 2L), (2L, 3L))).count() == 0L)
  }

  test("cooccurrenceEdges: distinct a<b pairs per block, multi-block dedup") {
    val s = spark
    import s.implicits._
    val nodes = Seq((1L, "h1"), (2L, "h1"), (3L, "h1"), (1L, "h2"), (2L, "h2"),
      (2L, "h1") /* duplicate activity row */)
      .toDF("u", "blk")
    val out = Graph.cooccurrenceEdges(nodes, "u", "blk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) co-occurs in both blocks but appears once
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  private def pairs(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("a", "b")
  }

  test("labelPropagation: two cliques bridged by one edge separate") {
    // K3 {1,2,3} -- bridge 3-4 -- K3 {4,5,6}: LPA pulls each side to its
    // min label; the bridge endpoints stay with their own clique (two
    // same-clique neighbors outvote the one cross edge)
    val out = Graph.labelPropagation(
      pairs((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)),
      rounds = 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val comm = out.toMap
    assert(comm.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(comm(1L), comm(2L), comm(3L)).size == 1)
    assert(Set(comm(4L), comm(5L), comm(6L)).size == 1)
    assert(comm(1L) != comm(4L))
  }

  test("labelPropagation: round 1 by hand — ties take the smallest label") {
    // path 1-2-3: after one synchronous round, 1 adopts 2, node 2 sees
    // {1, 3} (count 1 each -> min = 1), 3 adopts 2
    val out = Graph.labelPropagation(pairs((1L, 2L), (2L, 3L)), rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("kCore: pendant chain peels away in cascade, clique survives") {
    // K4 {1,2,3,4} + path 4-5-6: for k=2 the path peels in two rounds
    // (6 falls first, then 5), the clique keeps within-core degree 3
    val out = Graph.kCore(
      pairs((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (4L, 5L), (5L, 6L)),
      k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: k above the densest core returns empty") {
    val tri = pairs((1L, 2L), (2L, 3L), (1L, 3L))
    assert(Graph.kCore(tri, k = 3).count() == 0L)
    // the triangle itself is the 2-core, untouched
    assert(Graph.kCore(tri, k = 2).count() == 3L)
  }

  test("labelPropagation: zero rounds = identity labels; determinism") {
    val e = pairs((7L, 9L), (9L, 11L))
    val zero = Graph.labelPropagation(e, rounds = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(zero == Map(7L -> 7L, 9L -> 9L, 11L -> 11L))
    val a = Graph.labelPropagation(e, rounds = 3).collect().map(_.toSeq).toSet
    val b = Graph.labelPropagation(e, rounds = 3).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("bfsLevels: hop distances from the seed, depth-bounded, isolated seed = level 0") {
    val s = spark
    import s.implicits._
    // path 0-1-2-3 plus a disconnected 8-9 component
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L)).toDF("a", "b")
    val got = Graph.bfsLevels(e, seed = 0L, maxDepth = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("level")).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L)) // 3 is beyond maxDepth; 8/9 unreachable
    // full depth reaches the path end; the other component never appears
    val full = Graph.bfsLevels(e, seed = 0L, maxDepth = 10)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("level")).toMap
    assert(full == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // isolated seed still reports itself at level 0
    val iso = Graph.bfsLevels(e, seed = 42L, maxDepth = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("level")).toMap
    assert(iso == Map(42L -> 0L))
  }

  test("modularity: two triangles bridged by one edge, hand-computed Q") {
    val s = spark
    import s.implicits._
    // m=7; each triangle community: m_in=3, d_sum=7
    // q_num = 4*7*3 - 49 = 35; Q_c = 35/196
    val edges = pairs((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val comms = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "community")
    val got = Graph.modularity(edges, comms).orderBy("community").collect()
      .map(r => (r.getAs[Long]("community"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("m_in"), r.getAs[Long]("d_sum"),
        r.getAs[Long]("q_num"), r.getAs[Double]("q_contrib")))
    assert(got.toSeq == Seq(
      (10L, 3L, 3L, 7L, 35L, 35.0 / 196.0),
      (20L, 3L, 3L, 7L, 35L, 35.0 / 196.0)))
  }

  test("linkPrediction: RA over common neighbors, existing edges excluded") {
    // triangle {1,2,3} + pendant 3-4: candidate non-edges are (1,4) and
    // (2,4), each with common neighbor 3 (deg 3) -> 1000000 div 3;
    // the triangle's own edges must NOT appear
    val got = Graph.linkPrediction(
      pairs((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)), topK = 10)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("common"), r.getAs[Long]("ra_micro")))
    assert(got.toSeq == Seq((1L, 4L, 1L, 333333L), (2L, 4L, 1L, 333333L)))
  }

  test("linkPrediction: maxDegree excludes hub common neighbors, keeps the rest") {
    // hub 0 (deg 3: 1,2,3) and low-degree 5 (deg 2: 1,2) are both common
    // neighbors of (1,2); (1,3)/(2,3) exist only through the hub
    val es = pairs((0L, 1L), (0L, 2L), (0L, 3L), (5L, 1L), (5L, 2L))
    def run(cap: Int) = Graph.linkPrediction(es, topK = 10, maxDegree = cap)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("common"), r.getAs[Long]("ra_micro"))).toSeq
    // uncapped: (0,5) via z=1,z=2 (deg 2 each); (1,2) via z=0 (div 3) and
    // z=5 (div 2); (1,3)/(2,3) via z=0 only
    assert(run(10000) == Seq((0L, 5L, 2L, 1000000L), (1L, 2L, 2L, 833333L),
      (1L, 3L, 1L, 333333L), (2L, 3L, 1L, 333333L)))
    // cap 2: hub 0 can no longer serve as z — (1,3)/(2,3) vanish, (1,2)
    // survives through its remaining low-degree common neighbor
    assert(run(2) == Seq((0L, 5L, 2L, 1000000L), (1L, 2L, 1L, 500000L)))
  }
}
