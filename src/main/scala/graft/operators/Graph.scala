package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over tables the engine already serves: transition-edge
  * derivation from event streams and an integer-exact PageRank — the
  * importance-weighting step of web-crawl curation pipelines (rank domains
  * by the link graph, weight documents by source rank) re-expressed over
  * the synthetic `events` table's behavioral graph.
  *
  * Everything is fixed-point integer arithmetic in micro-units: ranks are
  * longs, per-edge contributions are `(rank * w) div out * d_num div
  * d_den` — integer sums are order-independent, so Spark and any oracle
  * engine produce bit-identical ranks, the same trick as the quantized
  * ANN and floor-log2 LM scores. */
object Graph {

  /** Per-user consecutive-event transition edges, aggregated to
    * (src, dst, w): the Markov transition multigraph of the event stream.
    * One keyed window (partition user_id, order (ts, event_id) — a total
    * order, the table has no duplicate keys) and one (src, dst) shuffle
    * whose output is bounded by |event types|², not by the event count. */
  def transitionEdges(events: DataFrame): DataFrame =
    events.select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts").asc, col("event_id").asc)).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))

  /** Fixed-iteration PageRank with damping 0.85, entirely in long
    * micro-units of `scale`: init rank = scale; each round
    * `rank'(v) = 0.15·scale + Σ_{(u,v)} ((rank(u)·w) div out(u)·85) div
    * 100`. Dangling mass is not redistributed (the standard simplified
    * form); ranks therefore need not sum to N·scale.
    *
    * Scale shape: the event scan happens ONCE — edges aggregate to a
    * |node|²-bounded table that is checkpointed, and every iteration is a
    * join of that small table against the even smaller broadcast rank
    * vector, then a dst-keyed sum. Rounds localCheckpoint the rank vector
    * (node-sized) so lineage stays flat, exactly the [[graft.dedup.Dedup
    * .dupClusters]] iteration discipline. Overflow bound: rank·w must fit
    * a long — rank ≤ N·scale, so the default 1e9 scale holds to
    * N·w ≈ 9e9 transition mass, re-derive `scale` beyond that. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iterations: Int = 5,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    require(scale > 0, s"scale must be positive: $scale")
    val base = 15L * scale / 100L
    val ew = edges
      .join(edges.groupBy(col("src")).agg(sum(col("w")).as("outw")), "src")
      .localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = ew.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"),
          expr("((rank * w) div outw) * 85 div 100").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val next = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("rank"))
        .localCheckpoint(true)
      ranks.unpersist(blocking = false)
      ranks = next
    }
    ranks
  }

  /** Personalized PageRank (the random-walk-with-restart variant of
    * [[pageRank]]): the teleport mass returns ONLY to the `seeds`, so
    * ranks measure proximity to the seed set along the weighted edges —
    * the graph-based relevance expansion of crawl curation ("score every
    * domain by its link proximity to a trusted seed list") and of
    * retrieval re-ranking. Same integer micro-unit arithmetic, same
    * per-round discipline as [[pageRank]]; non-seed nodes start (and
    * teleport) at 0, so any engine replays the rounds bit-identically.
    * Seeds are a driver-held set (trusted lists are metadata-sized);
    * overflow bounds are [[pageRank]]'s. */
  def personalizedPageRank(nodes: DataFrame, edges: DataFrame,
      seeds: Set[String], iterations: Int = 5,
      scale: Long = 1000000000L): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed node")
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    require(scale > 0, s"scale must be positive: $scale")
    val isSeed = col("node").isInCollection(seeds)
    val base = when(isSeed, lit(15L * scale / 100L)).otherwise(lit(0L))
    val ew = edges
      .join(edges.groupBy(col("src")).agg(sum(col("w")).as("outw")), "src")
      .localCheckpoint(true)
    var ranks = nodes
      .select(col("node"), when(isSeed, lit(scale)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = ew.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"),
          expr("((rank * w) div outw) * 85 div 100").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val next = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (base + coalesce(col("in_mass"), lit(0L))).as("rank"))
        .localCheckpoint(true)
      ranks.unpersist(blocking = false)
      ranks = next
    }
    ranks
  }

  /** Fixed-iteration HITS (Kleinberg 1999, "Authoritative sources in a
    * hyperlinked environment") over a weighted directed edge set — the
    * hub/authority complement to [[pageRank]]: in crawl curation,
    * authority flags the pages good hubs point at, hub flags the
    * link-collection pages, and the two scores separate directory spam
    * from genuinely cited sources in a way a single rank cannot.
    *
    * Each iteration is the standard pair of sweeps, `auth(v) = Σ_{u→v}
    * w·hub(u)` then `hub(u) = Σ_{u→v} w·auth(v)`, in long arithmetic.
    * Real HITS L2-normalizes between sweeps — irreproducible across
    * engines (sqrt of a sum) — so this normalizes by the MAX instead:
    * `x' = x·scale div max(x)`, an exact integer step that bounds every
    * score to `scale` and preserves the ordering (HITS scores are only
    * meaningful up to scale anyway; the principal eigenvector is
    * normalization-invariant). Sums of longs are order-independent, so
    * any engine replays the rounds bit-identically.
    *
    * Scale shape: [[pageRank]]'s exact discipline — edges checkpoint
    * once, every sweep joins the edge table against the broadcast
    * node-sized score vector then aggregates map-side-combined, and the
    * max is a one-row broadcast crossJoin, never a driver collect.
    * Overflow bound: scores ≤ scale after each normalization, so a sweep
    * needs Σw·scale < 2^63 — with the default 1e6 scale that holds to
    * ~9e12 total edge weight; re-derive `scale` beyond that. The
    * normalization itself multiplies raw mass by scale BEFORE dividing,
    * so it runs in DECIMAL(38) (exact, then the ≤scale quotient is cast
    * back to long) — a long intermediate there would cap total edge
    * weight at ~9e6 instead. */
  def hits(nodes: DataFrame, edges: DataFrame, iterations: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(scale > 0, s"scale must be positive: $scale")
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint(true)
    def normalize(scores: DataFrame): DataFrame = {
      val mx = scores.agg(greatest(max(col("v")), lit(1L)).as("mx"))
      scores.crossJoin(broadcast(mx))
        .select(col("node"),
          expr(s"CAST(CAST(v AS DECIMAL(38,0)) * $scale div mx AS BIGINT)").as("v"))
    }
    def sweep(scores: DataFrame, from: String, to: String): DataFrame = {
      val mass = e.join(broadcast(scores), col(from) === col("node"))
        .select(col(to), (col("w") * col("v")).as("c"))
        .groupBy(col(to)).agg(sum(col("c")).as("in_mass"))
      normalize(nodes
        .join(mass, col("node") === col(to), "left")
        .select(col("node"), coalesce(col("in_mass"), lit(0L)).as("v")))
        .localCheckpoint(true)
    }
    var hub = nodes.select(col("node"), lit(scale).as("v")).localCheckpoint(true)
    var auth = hub
    for (_ <- 1 to iterations) {
      val nextAuth = sweep(hub, from = "src", to = "dst")
      val nextHub = sweep(nextAuth, from = "dst", to = "src")
      if (!(auth eq hub)) auth.unpersist(blocking = false)
      hub.unpersist(blocking = false)
      auth = nextAuth
      hub = nextHub
    }
    nodes.join(hub.withColumnRenamed("v", "hub"), "node")
      .join(auth.withColumnRenamed("v", "auth"), "node")
      .select(col("node"), col("hub"), col("auth"))
  }

  /** k-core peeling (Seidman 1983, "Network structure and minimum
    * degree"): iteratively delete nodes with fewer than `k` neighbors in
    * the SURVIVING subgraph until no more fall (bounded by `maxRounds`) —
    * the densest-substructure filter of crawl curation: nodes outside the
    * k-core are weakly-connected periphery (one-off co-occurrences,
    * drive-by links); the core is where community structure and
    * bot-ring density live. Input is the undirected (a, b; a < b) edge
    * set; output is the surviving nodes with their within-core degree.
    *
    * Determinism: peeling is a monotone fixpoint — the k-core is UNIQUE
    * (no tie-breaks at all), and each synchronous round (drop every
    * under-degree node simultaneously) is replayed identically by the
    * oracle's recursive CTE. `maxRounds` caps the iteration like
    * [[pageRank]]'s fixed rounds; peeling converges in ≤ |V| rounds and
    * in practice a handful.
    *
    * Scale shape: each round is one degree count over the surviving edge
    * table (map-side combined) and two semi-joins to drop edges touching
    * deleted nodes — all keyed shuffles on node ids, state is the
    * edge-sized survivor table, localCheckpoint'd per round so lineage
    * stays flat. An early-exit check (`falling == 0`) stops the loop at
    * the fixpoint, so `maxRounds` is a backstop, not a cost. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxRounds >= 0, s"maxRounds must be >= 0: $maxRounds")
    var cur = edges.select(col("a"), col("b")).localCheckpoint(true)
    var rounds = 0
    var done = false
    while (rounds < maxRounds && !done) {
      val deg = cur.select(col("a").as("v"))
        .unionAll(cur.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("v"))
      val next = cur
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      // falling-node check on the checkpointed tables: both counts are
      // metadata-cheap (the work happened in the checkpoint)
      done = next.count() == cur.count()
      cur.unpersist(blocking = false)
      cur = next
      rounds += 1
    }
    // nodes of the stabilized subgraph with their within-core degree (at
    // the fixpoint every degree is >= k by construction — no extra filter,
    // so a maxRounds-truncated run still reports the honest survivor set)
    cur.select(col("a").as("v"))
      .unionAll(cur.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("core_degree"))
  }

  /** BFS levels from a seed node over an undirected edge set (rows
    * (a, b)): each reachable node's hop distance, `maxDepth`-bounded —
    * the trusted-seed proximity CRAWL frontier (how many link hops from a
    * curated source?) and the cheap reachability probe before a full
    * [[personalizedPageRank]].
    *
    * Level-synchronous frontier expansion: round d joins the current
    * frontier against the adjacency list and anti-joins everything
    * already levelled — first visit wins, which IS the BFS distance, no
    * min-reduction needed. The seed reports level 0 even when isolated
    * (the oracle's recursive base row does too). Same iteration
    * discipline as [[kCore]]: localCheckpoint per round truncates
    * lineage, the empty-frontier check early-exits, and each round is
    * one keyed join bounded by the frontier size — never whole-graph
    * state on the driver. */
  def bfsLevels(edges: DataFrame, seed: Long, maxDepth: Int = 6): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0: $maxDepth")
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    var levels = Seq((seed, 0L)).toDF("node", "level").localCheckpoint(true)
    var frontier = levels.select(col("node"))
    var d = 1L
    var done = false
    while (d <= maxDepth && !done) {
      val next = frontier.join(adj, frontier("node") === adj("u"))
        .select(col("v").as("node")).distinct()
        .join(levels, Seq("node"), "left_anti")
        .withColumn("level", lit(d))
        .localCheckpoint(true)
      done = next.isEmpty
      if (!done) {
        val merged = levels.unionAll(next).localCheckpoint(true)
        levels.unpersist(blocking = false)
        levels = merged
        frontier = next.select(col("node"))
      }
      d += 1
    }
    adj.unpersist(blocking = false)
    levels
  }

  /** Co-occurrence edges: distinct user pairs (a < b) active in the same
    * `block` (an hour, a session, a document …). The block is the
    * fan-out bound: pairs per block grow quadratically in block
    * occupancy, so blocks must be chosen fine enough that the hottest
    * block stays small — the identical knob as dedup blocking, and the
    * reason this never degenerates into the all-pairs user join. */
  def cooccurrenceEdges(nodes: DataFrame, node: String, block: String): DataFrame = {
    val d = nodes.select(col(node), col(block)).distinct()
    d.as("x").join(d.as("y"),
        col(s"x.$block") === col(s"y.$block") &&
          col(s"x.$node") < col(s"y.$node"))
      .select(col(s"x.$node").as("a"), col(s"y.$node").as("b"))
      .distinct()
  }

  /** Resource-allocation link prediction (Zhou, Lü & Zhang 2009, "Predicting
    * missing links via local information" — RA consistently beats
    * common-neighbors and Adamic-Adar in their benchmark): score every
    * NON-adjacent pair sharing ≥1 neighbor by `Σ_z 1/deg(z)` over common
    * neighbors z, keep the top-K — the "users who should know each other" /
    * "sources that should link" candidate generator for graph densification
    * and recommendation.
    *
    * Integer-exact: each term is `1000000 div deg(z)` (per-term floor
    * BEFORE the sum, so addition order cannot matter — the [[graft
    * .operators.Relational.rfmOf]] micro-unit rule), common-neighbor counts
    * ride alongside, and the top-K cut orders by the total
    * `(ra_micro desc, a, b)`.
    *
    * Scale shape: wedge enumeration through the common neighbor z is the
    * [[triangleCounts]] join shape — fan-out O(Σ deg(z)²), so hub nodes
    * dominate: one celebrity node with 10⁶ neighbors would alone emit
    * ~10¹² wedges. `maxDegree` caps the z side IN the operator (the same
    * skew discipline [[triangleCounts]]' degree orientation applies):
    * nodes with more than `maxDegree` neighbors are excluded as common
    * neighbors before the wedge join, bounding per-z fan-out to
    * maxDegree². The recall trade is explicit and mild — RA already
    * weights a hub's evidence by 1/deg(z), so a dropped 10⁶-degree hub
    * contributed ≤ 1 micro-unit per pair; capped pairs can still appear
    * through their other (low-degree) common neighbors. Everything
    * downstream is keyed: one degree count, one wedge join (which now
    * carries deg(z) along, so no second deg join), one (a,b)-keyed
    * aggregate, an anti-join against the edge set, and a TakeOrdered —
    * no global sort, nothing collects. */
  def linkPrediction(edges: DataFrame, topK: Int = 50,
      maxDegree: Int = 10000): DataFrame = {
    require(topK >= 1, s"need topK >= 1: $topK")
    require(maxDegree >= 1, s"need maxDegree >= 1: $maxDegree")
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val adj = und.select(col("u").as("z"), col("v").as("x"))
    // z-side hub cap BEFORE the self-join, applied to the LEFT side only
    // (z-equality makes it bind both sides), so the plain right-side
    // adjacency subtree stays join-free — the capped side also carries
    // deg(z), so the RA weight needs no post-wedge join
    val capped = adj
      .join(deg.filter(col("deg") <= maxDegree).withColumnRenamed("u", "z"),
        Seq("z"))
    val wedges = capped.as("l").join(adj.as("r"),
        col("l.z") === col("r.z") && col("l.x") < col("r.x"))
      .select(col("l.x").as("a"), col("r.x").as("b"), col("l.deg").as("deg"))
    wedges
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"),
        sum(expr("1000000 div deg")).as("ra_micro"))
      .join(edges.select(col("a"), col("b")), Seq("a", "b"), "left_anti")
      .orderBy(col("ra_micro").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007,
    * "Near linear time algorithm to detect community structures") over an
    * undirected edge set (rows (a, b) with a < b, no duplicates) — the
    * community-detection complement to [[pageRank]] (importance) and
    * [[triangleCounts]] (local clustering) in crawl-curation: group
    * mutually-linked sources so per-community caps and diversity quotas
    * have something to key on. Every node starts labeled with its own id;
    * each round every node adopts the most frequent label among its
    * neighbors (ties break on the SMALLEST label; isolated rounds keep
    * the own label), all nodes updating simultaneously from the previous
    * round's labels. Fixed `rounds` with deterministic integer counts and
    * total-order tie-breaks — any engine replays the identical rounds, so
    * the oracle is a recursive CTE, not a seeded approximation.
    *
    * Scale shape: each round is one (node, label) map-side-combined count
    * on the edge table, a per-node top-1 window that short-circuits via
    * WindowGroupLimit, and one node-keyed join back — all keyed shuffles,
    * nothing global, state is one label per node. Rounds localCheckpoint
    * the node-sized label vector so lineage stays flat ([[pageRank]]'s
    * discipline). Celebrity nodes cost a streaming top-1 per partition,
    * never a materialized per-node sort. */
  def labelPropagation(edges: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val und = edges.select(col("a").as("v"), col("b").as("u"))
      .unionAll(edges.select(col("b").as("v"), col("a").as("u")))
      .localCheckpoint(true)
    var labels = und.select(col("v").as("node")).distinct()
      .withColumn("community", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val counts = und
        .join(labels.select(col("node").as("u"), col("community")), "u")
        .groupBy(col("v"), col("community")).agg(count(lit(1)).as("cnt"))
      val best = counts
        .withColumn("rk", row_number().over(Window.partitionBy(col("v"))
          .orderBy(col("cnt").desc, col("community").asc)))
        .filter(col("rk") === 1)
        .select(col("v").as("node"), col("community").as("next"))
      val next = labels.select(col("node"))
        .join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("next"), col("node")).as("community"))
        .localCheckpoint(true)
      labels.unpersist(blocking = false)
      labels = next
    }
    labels
  }

  /** Per-node triangle participation over an undirected edge set (rows
    * (a, b) with a < b, no duplicates) — the clustering-structure signal
    * behind community pruning and bot-ring detection in crawl curation.
    *
    * Degree-ordered enumeration (the classic compact-forward shape):
    * orient every edge from its lower-(degree, id) endpoint, build wedges
    * by joining oriented edges on their source, and close each wedge with
    * one more oriented-edge lookup. Every triangle is found exactly once,
    * and the wedge fan-out per node is its ORIENTED out-degree — O(√m)
    * regardless of raw degree skew, which is what keeps a celebrity node
    * from exploding the join at 100 TB. Three shuffles total (degrees,
    * wedge join, closing join); each found triangle attributes to its
    * three corners via one explode + count. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orientation key: (degree, id) — total order, ties impossible
    val keyed = edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"),
        struct(col("da").as("d"), col("a").as("v")).as("ka"),
        struct(col("db").as("d"), col("b").as("v")).as("kb"))
    val oriented = keyed.select(
      when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("src"),
      when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("dst"),
      when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("kdst"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.kdst") < col("e2.kdst"))
      .select(col("e1.src").as("corner"),
        col("e1.dst").as("u"), col("e2.dst").as("w"))
    val closing = oriented.select(col("src").as("u"), col("dst").as("w"))
    wedges.join(closing, Seq("u", "w"))
      .select(explode(array(col("corner"), col("u"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Newman modularity of a community assignment (Newman & Girvan 2004,
    * "Finding and evaluating community structure in networks"): per
    * community c, `Q_c = m_c/m − (d_c / 2m)²` where `m_c` is its internal
    * edge count, `d_c` its degree sum, `m` the total edge count — the
    * standard "are these communities real" score for [[labelPropagation]]
    * output (Q near 0 = no better than random; LPA label quality is
    * exactly what per-community caps and quotas stand on).
    *
    * Integer-exact: each community row carries the exact sufficient
    * statistics plus the integer numerator `q_num = 4·m·m_c − d_c²`
    * (so `Q_c = q_num / (2m)²` is ONE division of exact values and the
    * total Q is their sum). `4·m·m_c ≤ 4m²` wraps int64 past
    * m ≈ 1.5e9 edges — loud-guarded in-plan (the bm25 rule).
    *
    * Scale: two node-keyed joins to label the edge endpoints, a
    * community-keyed count, and a node-degree aggregate — everything
    * keyed, the 1-row edge total broadcasts. */
  def modularity(edges: DataFrame, communities: DataFrame): DataFrame = {
    val fa = communities.select(col("node").as("a"), col("community").as("ca"))
    val fb = communities.select(col("node").as("b"), col("community").as("cb"))
    val labeled = edges.select(col("a"), col("b")).join(fa, "a").join(fb, "b")
    val mIn = labeled.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("m_in"))
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val perC = communities.join(deg, "node")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_sum"))
    val m = edges.agg(count(lit(1)).as("m"))
    perC.join(mIn, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .withColumn("m_in", coalesce(col("m_in"), lit(0L)))
      .withColumn("q_num",
        when(col("m") <= 1518500249L,
          lit(4L) * col("m") * col("m_in") - col("d_sum") * col("d_sum"))
          .otherwise(raise_error(lit(
            "modularity numerator overflows int64 past ~1.5e9 edges"))))
      .select(col("community"), col("n_nodes"), col("m_in"), col("d_sum"),
        col("m"), col("q_num"),
        (col("q_num").cast("double") /
          ((lit(2L) * col("m")).cast("double")
            * (lit(2L) * col("m")).cast("double"))).as("q_contrib"))
  }
}
