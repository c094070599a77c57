package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.QuantizedDot.quantized_dot

/** Similarity search over an embedding column (`Array[Float]`): brute-force
  * cosine top-k as the exact baseline, an IVF-style sign-bucketed variant as
  * the scale path, and near-duplicate pair detection.
  *
  * Determinism: embeddings are quantized to 1e-6 fixed point
  * (`floor(x * 1e6)` in int64), so dot products and norms are exact integers
  * on any engine; cosine is then one division of exact values — bit-identical
  * across Spark and the DuckDB oracle, which makes ranks reproducible.
  *
  * Scale design (100 TB / 1000 executors):
  *  - the query side is always broadcast (`broadcast(queries)`) — the corpus
  *    never shuffles for scoring; scoring is a map stage fused into the scan;
  *  - top-k uses two-phase selection: a salted per-partition `row_number`
  *    keeps ≤k rows per (query, salt) slice in parallel, then the global
  *    `row_number` ranks the tiny survivor set — no single-reducer sort of
  *    the full corpus per query;
  *  - the IVF variant prunes candidates by a sign-pattern coarse quantizer
  *    (bucket = low bits of the first dims' signs), turning the cross
  *    product into a bucket-equality join.
  */
object Similarity {

  /** Fixed-point resolution: 1e-6 per unit. |x| ≤ ~500 stays overflow-safe
    * in the 64-dim dot product (5e8² × 64 ≪ 2^63). */
  val QuantScale = 1000000.0

  /** floor-quantize a float vector to int64 fixed point (floor, not round:
    * floor semantics are identical on every engine; round-half ties are
    * engine-dependent). */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(QuantScale)).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native codegen
    * [[graft.functions.QuantizedDot]] expression (the `aggregate(zip_with)`
    * composition computes the same value but interprets three lambdas and
    * allocates an intermediate array per row). */
  def dotQ(a: Column, b: Column): Column = quantized_dot(a, b)

  /** Cosine from exact integer dot + norms (deterministic double). */
  def cosineQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Corpus with quantized embedding and its exact squared norm. */
  def prepared(embeddings: DataFrame): DataFrame = {
    val qe = quantize(col("embedding"))
    embeddings.select(col("vec_id"), col("label"), qe.as("qe"))
      .withColumn("nq", dotQ(col("qe"), col("qe")))
  }

  /** IVF-style coarse quantizer: bucket = bitmask of the first `signBits`
    * dimensions' signs. 2^signBits buckets, assignment is a narrow map. */
  def signBucket(qe: Column, signBits: Int = 8): Column =
    (0 until signBits).map { j =>
      when(element_at(qe, j + 1) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Distributed top-k per group: salted local row_number (parallel, keeps
    * ≤k per slice) then global row_number over the survivors. */
  private def topKPerGroup(scored: DataFrame, k: Int, slices: Int = 32): DataFrame = {
    val order = Seq(col("cos").desc, col("neighbor_id").asc)
    val local = scored
      .withColumn("salt", pmod(spark_partition_id(), lit(slices)))
      .withColumn("lr", row_number().over(
        Window.partitionBy(col("query_id"), col("salt")).orderBy(order: _*)))
      .filter(col("lr") <= k)
    local
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(order: _*)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Shared scoring tail of every exact-vector search path: corpus ×
    * broadcast(queries) cosine over (vec_id, qe, nq)-shaped inputs, then
    * the salted two-phase top-k. One body, so the tie/salt discipline
    * can never drift between the full-width and sketch paths. */
  private def cosineTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val qs = q.select(col("vec_id").as("query_id"),
      col("qe").as("q_qe"), col("nq").as("q_nq"))
    val scored = c.crossJoin(broadcast(qs))
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("q_qe")), col("q_nq"), col("nq")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    topKPerGroup(scored, k)
  }

  /** Exact brute-force cosine top-k: corpus × broadcast(queries) map-side
    * scoring, two-phase selection. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    cosineTopK(prepared(corpus), prepared(queries), k)

  /** Hard-negative mining for contrastive training (the in-batch-negatives
    * upgrade every dense-retriever recipe ships — e.g. Karpukhin et al.
    * 2020 DPR §4.2, Xiong et al. 2021 ANCE): for each anchor, the `k`
    * nearest corpus vectors with a DIFFERENT label — the
    * maximally-confusable negatives that make embedding training converge,
    * versus random negatives the model separates immediately. Same-label
    * rows (including the anchor itself) are excluded by the label filter.
    *
    * Exactness: the [[bruteForceTopK]] quantized-cosine path — integer dot
    * products, one division — with `(cos desc, neighbor_id)` rank ties, so
    * the mined set is engine-identical.
    *
    * Scale: anchors are the batch being trained on — broadcast-sized by
    * construction — so scoring stays a map stage over the corpus scan
    * (corpus never shuffles) and selection is the shared salted two-phase
    * top-k. For mining against the full corpus repeatedly, compose with
    * [[ivfTopK]]'s sign-bucket pruning: the label filter is orthogonal to
    * the candidate-generation strategy. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int): DataFrame = {
    val c = prepared(corpus)
    val q = prepared(anchors).select(col("vec_id").as("query_id"),
      col("label").as("q_label"), col("qe").as("q_qe"), col("nq").as("q_nq"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("label") =!= col("q_label"))
      .withColumn("cos",
        cosineQ(dotQ(col("qe"), col("q_qe")), col("q_nq"), col("nq")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    topKPerGroup(scored, k)
  }

  /** Embedding-space label diagnostics: the truncated-mean centroid of
    * each label's vectors and the pairwise cosine between label centroids —
    * the "are my classes separable / is this embedding collapsing"
    * monitor an embedding-training pipeline tracks per checkpoint (high
    * inter-label centroid cosine = classes not separated).
    *
    * Determinism: per-dimension sums of the quantized vectors are exact
    * integers; the centroid is the TRUNCATED (toward-zero) integer mean
    * `sum div n` — Spark's `div` and DuckDB's `//` both truncate toward
    * zero, which for a negative per-dimension sum is NOT the floor; the
    * engines agree with each other, so don't "fix" one side to floor
    * semantics — (truncate before any dot product, so addition order
    * cannot matter and the
    * centroid dot stays ≤ 64·(1e6·|x|max)² — no overflow for any corpus
    * size, unlike dotting raw sums); centroid cosine is the shared
    * [[cosineQ]] one-division form. Pairs emit once as label_a < label_b.
    *
    * Scale: the per-dim sum is a (label, dim)-keyed map-side-combined
    * aggregate (64·|labels| rows); centroids rebuild via a deterministic
    * `array_sort(collect_list(struct(dim, …)))` over those rows; the
    * pairwise pass is |labels|² over a broadcast-sized table. The corpus
    * is scanned once and never shuffles un-reduced. */
  def labelCentroids(vectors: DataFrame): DataFrame = {
    val p = prepared(vectors)
    val sums = p
      .select(col("label"), posexplode(col("qe")).as(Seq("dim", "q")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
    val cent = sums
      .withColumn("m", expr("s div n"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        x => x.getField("m")).as("c"),
        max(col("n")).as("n"))
    val a = cent.select(col("label").as("label_a"), col("c").as("ca"),
      col("n").as("n_a"))
    val b = cent.select(col("label").as("label_b"), col("c").as("cb"),
      col("n").as("n_b"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        cosineQ(dotQ(col("ca"), col("cb")),
          dotQ(col("ca"), col("ca")), dotQ(col("cb"), col("cb"))).as("cos"))
  }

  /** IVF-bucketed approximate top-k: candidates restricted to the query's
    * sign bucket — trades recall for a 2^signBits-fold candidate cut. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, signBits: Int = 8): DataFrame = {
    val c = prepared(corpus).withColumn("bucket", signBucket(col("qe"), signBits))
    val q = prepared(queries)
      .select(col("vec_id").as("query_id"), col("qe").as("q_qe"), col("nq").as("q_nq"))
      .withColumn("bucket", signBucket(col("q_qe"), signBits))
    val scored = c.join(broadcast(q), "bucket")
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("q_qe")), col("q_nq"), col("nq")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    topKPerGroup(scored, k)
  }

  /** Recall@k evaluation of an approximate neighbor list against the exact
    * one — the standard ANN quality monitor every serving pipeline tracks
    * (recall of the deployed index vs a brute-force audit sample). Takes
    * any two `(query_id, rank, neighbor_id, …)` result sets (so it scores
    * [[ivfTopK]], [[ivfKmeansTopK]], or the SQ8 path alike), counts the
    * per-query overlap of neighbor ids, and reports `hits / k` — exact
    * integer hits, the double derived from them. Queries the approximate
    * index missed entirely surface with recall 0, not as absent rows.
    *
    * Scale: both inputs are already top-k-bounded (≤ queries×k rows), so
    * every join here is between evaluation-sized tables — at audit time
    * the brute-force side is computed over a query SAMPLE, never the full
    * corpus, and this cost is independent of corpus size. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        lit(k.toLong).as("k"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings", ACL;
    * the CCMatrix / LASER mining rule): a candidate pair (x, y) is scored
    * not by raw cosine — which miscalibrates across hubness regions — but
    * by the RATIO margin
    * `cos(x,y) / ((Σ_{z∈NNk(x)} cos(x,z) + Σ_{z∈NNk(y)} cos(y,z)) / 2k)`,
    * i.e. how much better this pair is than each side's neighborhood
    * average. Candidates are x's forward top-k; the mined pair per source
    * is the margin-argmax above `minMargin`, with `mutual = 1` when x is
    * also inside y's backward top-k (the forward-backward agreement
    * CCMatrix intersects on).
    *
    * Engine-exactness: each cosine is the deterministic quantized double
    * ([[cosineQ]]); neighborhood sums are taken in integer MICRO-units
    * (`floor(cos · 1e9)` per neighbor, summed as int64 — the
    * [[graft.operators.Retrieval.rrfFuse]] discipline, because a float Σ
    * would hash-diverge on summation order), and the margin is one
    * division of exact operands.
    *
    * Scale shape: both top-k frames are queries×k-bounded, so everything
    * after candidate generation joins evaluation-sized tables; the
    * neighborhood-sum tables are one-row-per-vector and broadcast. At
    * corpus scale the two brute-force calls are the swap-in seam — pass
    * ANN top-k frames ([[ivfPqTopK]]) to [[marginFromTopK]] directly, the
    * [[graft.dedup.Dedup.consensusFromPairs]] composition pattern. */
  def marginPairs(src: DataFrame, tgt: DataFrame, k: Int = 4,
      minMargin: Double = 1.0): DataFrame =
    marginFromTopK(
      bruteForceTopK(tgt, src, k),
      bruteForceTopK(src, tgt, k),
      k, minMargin)

  /** [[marginPairs]] over ALREADY-COMPUTED forward/backward top-k frames
    * (`(query_id, rank, neighbor_id, cos)`-shaped, k rows per query). */
  def marginFromTopK(fwd: DataFrame, bwd: DataFrame, k: Int,
      minMargin: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    def micro(c: Column): Column = floor(c * lit(1e9)).cast("long")
    val sumX = fwd.groupBy(col("query_id").as("src_id"))
      .agg(sum(micro(col("cos"))).as("sum_x_micro"))
    val sumY = bwd.groupBy(col("query_id").as("tgt_id"))
      .agg(sum(micro(col("cos"))).as("sum_y_micro"))
    val mutual = bwd.select(col("query_id").as("tgt_id"),
      col("neighbor_id").as("src_id")).withColumn("m", lit(1L))
    fwd.select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("cos"))
      .join(sumX, "src_id")
      .join(sumY, "tgt_id")
      .join(mutual, Seq("src_id", "tgt_id"), "left")
      // Degenerate neighborhoods (all-zero embeddings) make the ratio
      // denominator non-positive; those candidates are explicitly dropped
      // rather than left to a null/sign-flipped margin the threshold
      // filter would silently eat (mirrored in the oracle SQL).
      .filter(col("sum_x_micro") + col("sum_y_micro") > 0)
      .withColumn("margin",
        micro(col("cos")).cast("double") * lit(2.0 * k) /
          (col("sum_x_micro") + col("sum_y_micro")).cast("double"))
      .filter(col("margin") >= minMargin)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("margin").desc, col("tgt_id"))))
      .filter(col("rk") === 1)
      .select(col("src_id"), col("tgt_id"), col("cos"), col("margin"),
        coalesce(col("m"), lit(0L)).as("mutual"))
  }

  /** Deterministic ±1 Johnson-Lindenstrauss sign matrix: `outDims` rows of
    * `dim` signs, each from the low bit of md5("rp:<d>:<j>") — no RNG, so
    * every engine (and the oracle) derives the identical matrix. */
  def rpSigns(outDims: Int, dim: Int): Seq[Seq[Long]] = {
    (0 until outDims).map { d =>
      (0 until dim).map { j =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rp:$d:$j".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1L else -1L
      }
    }
  }

  /** Project a quantized vector through the sign matrix: one exact integer
    * dot per output dim (the signs ride as array literals, so the whole
    * projection is codegen'd — no UDF, no per-row matrix allocation). */
  def rpProject(qe: Column, signs: Seq[Seq[Long]]): Column =
    array(signs.map(row => quantized_dot(qe, typedLit(row))): _*)

  /** Top-k search in a random-projection (JL) sketch of the embedding
    * space: vectors are compressed 64→`outDims` dims by a deterministic
    * ±1 sign projection, and the exact [[bruteForceTopK]] machinery runs
    * on the sketches — the memory-bound scale path where even SQ8 codes
    * are too wide (a 16-dim int sketch is 4× smaller than the 64-dim
    * original REGARDLESS of per-dim width, and JL preserves angles in
    * expectation, so ranking quality degrades gracefully; see the recall
    * spec). Projection magnitudes stay exact: |p[d]| ≤ 64·1e6, norms ≤
    * 16·(6.4e7)² ≈ 6.5e16 < 2^63 — integer-exact end to end, cosine one
    * deterministic division, same discipline as every other ANN gate.
    *
    * Scale: the projection fuses into the corpus scan (narrow map, no
    * shuffle); everything downstream is [[bruteForceTopK]]'s broadcast +
    * salted two-phase top-k on 4× less data. */
  def rpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      outDims: Int = 16, dim: Int = 64): DataFrame = {
    require(k >= 1 && outDims >= 1, s"need k, outDims >= 1: $k, $outDims")
    val signs = rpSigns(outDims, dim)
    // sketches take the (vec_id, qe, nq) shape so the shared scoring
    // tail applies unchanged to the compressed vectors
    def sketch(df: DataFrame): DataFrame = {
      val pe = rpProject(quantize(col("embedding")), signs)
      df.select(col("vec_id"), pe.as("qe"))
        .withColumn("nq", dotQ(col("qe"), col("qe")))
    }
    cosineTopK(sketch(corpus), sketch(queries), k)
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily select `k` results from each query's top-`candidates`
    * neighbor pool, scoring every unpicked candidate `λ·rel − (1−λ)·
    * max_sim_to_picked` — the diversified retrieval every RAG/dataset-
    * curation pipeline bolts onto plain top-k so the selection isn't k
    * near-copies of the same document.
    *
    * Determinism: rel and pairwise sims are the engine-exact quantized
    * cosines ([[bruteForceTopK]]'s discipline); the greedy objective is
    * the same two-term IEEE expression on both engines, and every argmax
    * tie-breaks by neighbor id — so the pick sequence is replayable
    * bit-for-bit by an oracle that unrolls the k steps.
    *
    * Scale shape: candidate generation is the distributed two-phase
    * top-k; pairwise sims are a per-query self-join of the candidate set
    * (queries × C² rows, never corpus-sized); the greedy itself runs
    * DISTRIBUTED via `flatMapGroups` — one group per query holding
    * C + C² bounded rows (C=candidates, a serving-time constant), so a
    * large query batch parallelizes across executors and no driver
    * collect exists anywhere. The inherently sequential part — k greedy
    * steps — is O(k·C) integer/double ops per query, in-memory. */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      candidates: Int, lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && candidates >= k, s"need 1 <= k <= candidates: $k, $candidates")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val mu = 1.0 - lambda
    val cand = bruteForceTopK(corpus, queries, candidates)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("rel"))
    // candidate vectors: one corpus scan filtered by the broadcast
    // candidate-id set, then a per-query self-join of that tiny slice
    val vecs = prepared(corpus)
      .join(broadcast(cand.select(col("query_id"), col("neighbor_id"))),
        col("vec_id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qe"), col("nq"))
    val sims = vecs.as("x").join(vecs.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.neighbor_id") =!= col("y.neighbor_id"))
      .select(col("x.query_id"),
        col("x.neighbor_id").as("a"), col("y.neighbor_id").as("b"),
        cosineQ(dotQ(col("x.qe"), col("y.qe")), col("x.nq"), col("y.nq")).as("s"))
    val spark = corpus.sparkSession
    import spark.implicits._
    // rel rows ride along with b = -1 (ids are non-negative) so one
    // grouped dataset carries the whole per-query greedy state
    val merged = cand.select(col("query_id"), col("neighbor_id").as("a"),
        lit(-1L).as("b"), col("rel").as("v"))
      .unionAll(sims.select(col("query_id"), col("a"), col("b"), col("s").as("v")))
      .as[(Long, Long, Long, Double)]
    merged.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val rel = scala.collection.mutable.LongMap.empty[Double]
      val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
      it.foreach { case (_, a, b, v) =>
        if (b == -1L) rel(a) = v else sim((a, b)) = v
      }
      // zero-norm vectors have NaN cosine against everything — they are
      // unrankable, and leaving one in would poison the argmax (NaN
      // fails every > comparison, leaving bestId unset)
      val remaining = scala.collection.mutable.TreeSet.empty[Long] ++
        rel.collect { case (id, r) if !r.isNaN => id }
      val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (picked.length < k && remaining.nonEmpty) {
        // argmax of the MMR objective, ties to the smallest id (the
        // TreeSet iterates ascending, so strict > keeps the first max)
        var bestId = -1L
        var bestScore = Double.NegativeInfinity
        remaining.foreach { c =>
          val ms = if (picked.isEmpty) 0.0
            else picked.iterator.map(p => sim((c, p))).max
          val score = if (picked.isEmpty) rel(c)
            else lambda * rel(c) - mu * ms
          if (score > bestScore) { bestScore = score; bestId = c }
        }
        picked += bestId
        remaining -= bestId
      }
      picked.iterator.zipWithIndex.map { case (id, i) => (qid, (i + 1).toLong, id) }
    }.toDF("query_id", "step", "neighbor_id")
  }

  /** Learned-centroid IVF: deterministic hash-seeded Lloyd's k-means over
    * the quantized corpus, then nprobe-nearest-centroid candidate pruning.
    * This is the "ANN you'd ship" upgrade over [[ivfTopK]]'s fixed sign
    * quantizer: centroids adapt to the data distribution, so bucket
    * occupancy is balanced and recall at equal candidate budget is higher.
    *
    * Determinism (oracle-exact): seeds are the `kClusters` vectors with the
    * smallest `(md5(vec_id), vec_id)` — no RNG; centroid means are
    * `exactIntegerSum/count` in IEEE doubles (sums stay < 2^53, division is
    * correctly rounded, so any engine computes the identical double);
    * distances fold left-to-right over the dims, and every argmin
    * tie-breaks by centroid id. The DuckDB oracle replays the same
    * arithmetic and must hash-match bit-for-bit.
    *
    * Scale: centroids are driver-held k×dim metadata (the MLlib KMeans
    * shape); each Lloyd iteration is ONE map+aggregate pass over the corpus
    * (assignment is the native [[graft.functions.CentroidRank]] kernel over
    * the driver-held centroid table — no join, no shuffle beyond the k-row
    * aggregate), so `iters` iterations cost
    * `iters + 1` corpus scans; persist the prepared corpus at real scale.
    * Serving joins candidates per (query, probed-centroid) — fan-out
    * bounded by nprobe × bucket occupancy, never n². Empty clusters keep
    * their previous centroid. */
  def ivfKmeansTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      kClusters: Int = 8, iters: Int = 2, nprobe: Int = 2, dim: Int = 64): DataFrame = {
    import graft.functions.CentroidRank.centroid_rank
    val c = prepared(corpus)
    val centroids = trainCentroids(c, kClusters, iters, dim)
    def nearest(qe: Column): Column = element_at(centroid_rank(qe, centroids), 1)
    val assigned = c.withColumn("cid", nearest(col("qe")))
    val q = prepared(queries).select(
      col("vec_id").as("query_id"), col("qe").as("q_qe"), col("nq").as("q_nq"))
    val probes = q.select(col("query_id"), col("q_qe"), col("q_nq"),
      explode(slice(centroid_rank(col("q_qe"), centroids), 1, nprobe)).as("cid"))
    val scored = assigned.join(broadcast(probes), "cid")
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("q_qe")), col("q_nq"), col("nq")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    topKPerGroup(scored, k)
  }

  /** Deterministic hash-seeded Lloyd's k-means over a [[prepared]] corpus
    * (see [[ivfKmeansTopK]] for the determinism and scale argument).
    * Centroids are driver-held k×dim metadata; each iteration is one
    * map+aggregate corpus pass via the native
    * [[graft.functions.CentroidRank]] kernel. */
  def trainCentroids(c: DataFrame, kClusters: Int, iters: Int, dim: Int): Seq[Seq[Double]] = {
    import graft.functions.CentroidRank.centroid_rank
    var centroids: Seq[Seq[Double]] = c
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(kClusters)
      .select(col("qe")).collect()
      .map(_.getSeq[Long](0).map(_.toDouble)).toSeq
    // nearest centroid id via the native centroid_rank kernel — ONE
    // Catalyst node per pass instead of an O(k × dim) literal tree that
    // each iteration would re-analyze and re-compile
    def nearest(qe: Column): Column = element_at(centroid_rank(qe, centroids), 1)
    for (_ <- 1 to iters) {
      val stats = c.groupBy(nearest(col("qe")).as("cid"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(i => sum(element_at(col("qe"), i + 1)).as(s"s$i")): _*)
        .collect()
        .map(r => r.getLong(0) -> r).toMap
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        stats.get(j.toLong) match {
          case Some(r) =>
            val n = r.getLong(1).toDouble
            (0 until dim).map(i => r.getLong(i + 2).toDouble / n)
          case None => old // empty cluster keeps its centroid
        }
      }
    }
    centroids
  }

  /** All `subspaces` PQ codebooks trained in ONE pass per Lloyd
    * iteration — value-identical to running [[trainCentroids]] per slice
    * (the per-slice seeds are the SAME smallest-(md5, vec_id) rows, the
    * per-(book, cluster) sums are the same exact integers, the mean is
    * the same one IEEE division), but the corpus is scanned once per
    * iteration instead of once per subspace per iteration: the slice
    * assignments ride a single explode into one (book, cluster)-keyed
    * map-side-combined aggregate. 1 seed job + `iters` passes total,
    * versus subspaces·(iters + 1) — the difference between 3 and 12
    * corpus scans at the default 4×2, and between one and four scans
    * per iteration at 100 TB. */
  private[graft] def trainPqBooks(c: DataFrame, subspaces: Int,
      kClusters: Int, iters: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val subDim = dim / subspaces
    import graft.functions.CentroidRank.centroid_rank
    val seedRows = c.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(kClusters).select(col("qe")).collect()
      .map(_.getSeq[Long](0))
    var books: IndexedSeq[Seq[Seq[Double]]] = (0 until subspaces).map { m =>
      seedRows.map(q =>
        q.slice(m * subDim, (m + 1) * subDim).map(_.toDouble)).toSeq
    }
    for (_ <- 1 to iters) {
      val slices = (0 until subspaces).map { m =>
        val sl = slice(col("qe"), m * subDim + 1, subDim)
        struct(lit(m).as("m"),
          element_at(centroid_rank(sl, books(m)), 1).as("cid"),
          sl.as("s"))
      }
      val stats = c.select(explode(array(slices: _*)).as("e"))
        .groupBy(col("e.m").as("m"), col("e.cid").as("cid"))
        .agg(count(lit(1)).as("n"),
          (0 until subDim).map(i =>
            sum(element_at(col("e.s"), i + 1)).as(s"s$i")): _*)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r).toMap
      books = (0 until subspaces).map { m =>
        books(m).zipWithIndex.map { case (old, j) =>
          stats.get((m, j.toLong)) match {
            case Some(r) =>
              val n = r.getLong(2).toDouble
              (0 until subDim).map(i => r.getLong(i + 3).toDouble / n)
            case None => old // empty cluster keeps its centroid
          }
        }
      }
    }
    books.map(_.map(_.toSeq))
  }

  /** Product-quantization ANN with asymmetric distance computation (Jégou
    * et al. 2011, "Product Quantization for Nearest Neighbor Search",
    * IEEE TPAMI) — the memory-bound serving path next to [[sqTopK]]'s
    * scalar codes and [[ivfKmeansTopK]]'s coarse pruning: the vector
    * space is split into `subspaces` orthogonal slices, each slice gets
    * its own `kClusters`-centroid codebook (the same deterministic
    * hash-seeded Lloyd's as [[trainCentroids]], run per slice), and every
    * corpus vector is compressed to `subspaces` small codes. Serving is
    * ADC: the query stays exact, each candidate scores as
    * `Σ_m dot(querySlice_m, codebook_m[code_m])` — a code lookup, never
    * a corpus-vector read. At dim=64 / 4×8 codebooks that is 64 floats →
    * 4 bytes per vector: the compression that lets 100 TB of embeddings
    * serve from memory. Compose with [[ivfKmeansTopK]]'s coarse
    * assignment for IVFPQ when a linear code scan is too much.
    *
    * Determinism (oracle-exact): codebooks inherit [[trainCentroids]]'
    * integer-sum/IEEE-mean arithmetic per slice (same seeds — the
    * smallest `(md5(vec_id), vec_id)` rows — in every slice); ADC sums
    * fold slice-by-slice, dim-by-dim left-to-right, so the DuckDB oracle
    * replays the identical double chain bit-for-bit.
    *
    * Scale: codebooks are `subspaces × kClusters × subDim` driver-held
    * metadata; encoding is one narrow map over the corpus (the
    * [[graft.functions.CentroidRank]] kernel per slice); scoring joins
    * the CODE table (4 small ints + norm per vector) against the
    * broadcast query set — the corpus embedding column is never read
    * again after encoding. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      subspaces: Int = 4, kClusters: Int = 8, iters: Int = 2,
      dim: Int = 64): DataFrame = {
    require(dim % subspaces == 0, s"dim $dim must split into $subspaces slices")
    val subDim = dim / subspaces
    import graft.functions.CentroidRank.centroid_rank
    val c = prepared(corpus)
    val books = trainPqBooks(c, subspaces, kClusters, iters, dim)
    // encode once, then DROP the vectors — ADC serves from codes + norm
    val codes = books.zipWithIndex.foldLeft(
      c.select(col("vec_id"), col("qe"), col("nq"))) { case (df, (book, m)) =>
      df.withColumn(s"code$m", element_at(
        centroid_rank(slice(col("qe"), m * subDim + 1, subDim), book), 1))
    }.drop("qe")
    val q = prepared(queries).select(col("vec_id").as("query_id"),
      col("qe").as("q_qe"), col("nq").as("q_nq"))
    val approxDot = (0 until subspaces).map { m =>
      val cent = element_at(typedlit(books(m)), col(s"code$m").cast("int") + 1)
      (1 to subDim).map(i =>
        element_at(col("q_qe"), m * subDim + i).cast("double")
          * element_at(cent, i)).reduce(_ + _)
    }.reduce(_ + _)
    val scored = codes.crossJoin(broadcast(q))
      .withColumn("cos", approxDot
        / (sqrt(col("q_nq").cast("double")) * sqrt(col("nq").cast("double"))))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    topKPerGroup(scored, k)
  }

  /** IVFPQ: coarse-centroid routing composed with product-quantization
    * ADC scoring (Jégou et al. 2011 §IV "IVFADC", minus the residual
    * encoding — codes quantize the raw vectors, the [[pqTopK]]
    * convention, so the two stages stay independently auditable against
    * their standalone gates; [[ivfAdcTopK]] is the residual-encoded
    * full construction). This is the 100 TB serving shape the
    * separate [[ivfKmeansTopK]] and [[pqTopK]] gates only imply: the
    * coarse quantizer prunes the candidate set to `nprobe` inverted
    * lists, and the scan over those lists reads CODES (a few bytes per
    * vector), never the embedding column — memory-bound AND
    * candidate-bound at once.
    *
    * Determinism (oracle-exact): the coarse centroids and all
    * `subspaces` codebooks inherit [[trainCentroids]]' hash-seeded
    * integer-sum/IEEE-mean arithmetic; probing and encoding tie-break by
    * centroid id; ADC folds slice-by-slice, dim-by-dim left-to-right —
    * the DuckDB oracle replays every stage CTE by CTE.
    *
    * Scale: centroids/codebooks are driver-held metadata (k×dim +
    * subspaces×kClusters×subDim doubles); encoding is one narrow map
    * over the corpus scan (coarse id + `subspaces` codes per vector);
    * serving joins the CODE table against broadcast (query × probe)
    * rows on the coarse id — fan-out bounded by nprobe × list
    * occupancy, and the full-width vectors are never read after
    * encoding. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      kClusters: Int = 8, iters: Int = 2, nprobe: Int = 2,
      subspaces: Int = 4, dim: Int = 64): DataFrame = {
    require(dim % subspaces == 0, s"dim $dim must split into $subspaces slices")
    require(nprobe >= 1 && nprobe <= kClusters,
      s"need 1 <= nprobe <= kClusters: $nprobe, $kClusters")
    val subDim = dim / subspaces
    import graft.functions.CentroidRank.centroid_rank
    val c = prepared(corpus)
    val coarse = trainCentroids(c, kClusters, iters, dim)
    val books = trainPqBooks(c, subspaces, kClusters, iters, dim)
    // one encoding pass: coarse list id + the PQ codes, then DROP the
    // vectors — the serving-side corpus state is (cid, codes, norm)
    val codes = books.zipWithIndex.foldLeft(
      c.select(col("vec_id"), col("qe"), col("nq"))
        .withColumn("cid", element_at(centroid_rank(col("qe"), coarse), 1))) {
      case (df, (book, m)) =>
        df.withColumn(s"code$m", element_at(
          centroid_rank(slice(col("qe"), m * subDim + 1, subDim), book), 1))
    }.drop("qe")
    val q = prepared(queries).select(col("vec_id").as("query_id"),
      col("qe").as("q_qe"), col("nq").as("q_nq"))
    val probes = q.select(col("query_id"), col("q_qe"), col("q_nq"),
      explode(slice(centroid_rank(col("q_qe"), coarse), 1, nprobe)).as("cid"))
    val approxDot = (0 until subspaces).map { m =>
      val cent = element_at(typedlit(books(m)), col(s"code$m").cast("int") + 1)
      (1 to subDim).map(i =>
        element_at(col("q_qe"), m * subDim + i).cast("double")
          * element_at(cent, i)).reduce(_ + _)
    }.reduce(_ + _)
    val scored = codes.join(broadcast(probes), "cid")
      .withColumn("cos", approxDot
        / (sqrt(col("q_nq").cast("double")) * sqrt(col("nq").cast("double"))))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    topKPerGroup(scored, k)
  }

  /** IVFADC with RESIDUAL encoding — the full Jégou et al. 2011 §IV
    * construction [[ivfPqTopK]] deliberately left out: PQ codes quantize
    * `x − centroid(x)` instead of raw x. Residuals concentrate near the
    * origin (the coarse quantizer has already explained the
    * between-list variance), so the same codebook budget spends its
    * centroids on a far tighter distribution — the quality step that
    * makes IVFPQ competitive at scale. ADC reconstructs
    * `dot(q, x) ≈ dot(q, c_coarse) + dot(q, codebook[residual code])`,
    * so the coarse term is a per-(query, probed-list) scalar and the
    * residual term is the usual code lookup.
    *
    * Determinism (oracle-exact): coarse centroids are floor-quantized
    * back to int64 before the residual subtraction, so residuals are
    * EXACT integer differences and the residual codebooks inherit
    * [[trainCentroids]]' integer-sum/IEEE-mean arithmetic unchanged
    * (double sums over residuals would be order-dependent across
    * engines; integer sums are not). List assignment still probes the
    * full-precision coarse means. The ADC chain folds coarse term
    * first, then slice-by-slice dim-by-dim left-to-right — the DuckDB
    * oracle replays the identical double chain.
    *
    * Scale: identical serving shape to [[ivfPqTopK]] — centroids, the
    * quantized-centroid table, and codebooks are driver-held metadata;
    * one encoding pass (coarse id + `subspaces` residual codes per
    * vector, vectors dropped after); candidates join the CODE table
    * against broadcast (query × probe) rows on the coarse id. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      kClusters: Int = 8, iters: Int = 2, nprobe: Int = 2,
      subspaces: Int = 4, dim: Int = 64): DataFrame = {
    require(dim % subspaces == 0, s"dim $dim must split into $subspaces slices")
    require(nprobe >= 1 && nprobe <= kClusters,
      s"need 1 <= nprobe <= kClusters: $nprobe, $kClusters")
    val subDim = dim / subspaces
    import graft.functions.CentroidRank.centroid_rank
    val c = prepared(corpus)
    val coarse = trainCentroids(c, kClusters, iters, dim)
    // floor-quantized coarse centroids: residuals stay exact integers
    val coarseQ: Seq[Seq[Long]] = coarse.map(_.map(v => math.floor(v).toLong))
    def cq(cid: Column): Column =
      element_at(typedlit(coarseQ), cid.cast("int") + 1)
    val assigned = c
      .withColumn("cid", element_at(centroid_rank(col("qe"), coarse), 1))
      .withColumn("rq", zip_with(col("qe"), cq(col("cid")), (x, cc) => x - cc))
    // residual codebooks: the one-pass-per-iteration trainer over the
    // residual vectors (same seeds — smallest (md5, vec_id) rows)
    val books = trainPqBooks(
      assigned.select(col("vec_id"), col("rq").as("qe")),
      subspaces, kClusters, iters, dim)
    val codes = books.zipWithIndex.foldLeft(
      assigned.select(col("vec_id"), col("nq"), col("cid"), col("rq"))) {
      case (df, (book, m)) =>
        df.withColumn(s"code$m", element_at(
          centroid_rank(slice(col("rq"), m * subDim + 1, subDim), book), 1))
    }.drop("rq")
    val q = prepared(queries).select(col("vec_id").as("query_id"),
      col("qe").as("q_qe"), col("nq").as("q_nq"))
    val probes = q.select(col("query_id"), col("q_qe"), col("q_nq"),
      explode(slice(centroid_rank(col("q_qe"), coarse), 1, nprobe)).as("cid"))
    // ADC: coarse term first (dot(q, floor-quantized probed centroid)),
    // then the residual subspace lookups — fixed left-to-right fold
    val coarseTerm = (1 to dim).map(i =>
      element_at(col("q_qe"), i).cast("double")
        * element_at(cq(col("cid")), i).cast("double")).reduce(_ + _)
    val subspaceTerms = (0 until subspaces).map { m =>
      val cent = element_at(typedlit(books(m)), col(s"code$m").cast("int") + 1)
      (1 to subDim).map(i =>
        element_at(col("q_qe"), m * subDim + i).cast("double")
          * element_at(cent, i)).reduce(_ + _)
    }
    val approxDot = subspaceTerms.foldLeft(coarseTerm)(_ + _)
    val scored = codes.join(broadcast(probes), "cid")
      .withColumn("cos", approxDot
        / (sqrt(col("q_nq").cast("double")) * sqrt(col("nq").cast("double"))))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    topKPerGroup(scored, k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then inside
    * each cluster drop every vector that has a lower-id neighbor with
    * cosine ≥ `threshold`. Clustering turns the quadratic all-pairs cosine
    * into per-cluster blocks — the same bounded-fan-out discipline as every
    * other dedup here (candidate pairs ≤ Σ C(cluster size, 2), never n²).
    *
    * Keep rule: a vector is kept iff NO kept-or-dropped lower-id vector in
    * its cluster clears the threshold. (The paper keeps one arbitrary
    * member per near-dup neighborhood; anchoring on min-id makes the choice
    * deterministic and embarrassingly parallel — no sequential greedy chain
    * — at the cost of occasionally dropping a chain member a sequential
    * pass would keep. That trade is standard in distributed SemDeDup.)
    *
    * Scale: at 100 TB, `kClusters` grows with the corpus (the paper uses
    * ~10⁵ clusters for web scale) so per-cluster occupancy — and the pair
    * fan-out bound — stays constant; both self-join sides read ONE
    * explicit cid exchange. Returns (vec_id, cid, keep). */
  def semDedup(embeddings: DataFrame, threshold: Double, kClusters: Int = 8,
      iters: Int = 2, dim: Int = 64): DataFrame = {
    import graft.functions.CentroidRank.centroid_rank
    val c = prepared(embeddings)
    val centroids = trainCentroids(c, kClusters, iters, dim)
    val assigned = c
      .withColumn("cid", element_at(centroid_rank(col("qe"), centroids), 1))
      .select(col("vec_id"), col("cid"), col("qe"), col("nq"))
      .repartition(col("cid"))
    val shadowed = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosineQ(dotQ(col("a.qe"), col("b.qe")), col("a.nq"), col("b.nq"))
        >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cid"))
      .join(shadowed.withColumn("dropped", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        when(col("dropped").isNull, 1L).otherwise(0L).as("keep"))
  }

  /** Embedding-cosine near-duplicate pairs blocked by multi-probe sign-LSH
    * — the content-derived blocking for corpora with NO cheap existing
    * partition (the label-blocked [[nearDupPairs]] covers the case where
    * one exists). Each vector probes its sign bucket plus every one-bit
    * flip, so a pair surfaces whenever the two sign patterns differ in at
    * most 2 of the `signBits` dimensions (the pigeonhole argument of
    * [[graft.dedup.Dedup.simhashPairs]]); high-cosine near-dups rarely flip
    * many leading signs, and the recall trade is explicit in `signBits`.
    * Candidate fan-out is bounded per (probe) bucket — (signBits+1) ×
    * C(occupancy, 2) worst case, never n² — and both self-join sides read
    * one shared exchange. */
  def nearDupPairsLsh(embeddings: DataFrame, threshold: Double,
      signBits: Int = 8): DataFrame = {
    val p = prepared(embeddings)
      .withColumn("bucket", signBucket(col("qe"), signBits))
    val probes = p.select(col("vec_id"), col("qe"), col("nq"),
      explode(array(col("bucket") +:
        (0 until signBits).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*))
        .as("probe"))
      .repartition(col("probe"))
    probes.as("a")
      .join(probes.as("b"),
        col("a.probe") === col("b.probe") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineQ(dotQ(col("a.qe"), col("b.qe")), col("a.nq"), col("b.nq")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct() // a pair can surface under several probes
  }

  /** Scalar-quantized top-k — the memory-bounded ANN serving path (the
    * SQ8 scheme of the FAISS family: each dimension compressed to a
    * signed 7-bit code against the vector's own max-abs scale, an 8×
    * memory cut vs float64 fixed-point that lets a 100 TB embedding
    * corpus stay resident where the full-precision vectors cannot).
    * Scoring approximates cosine from the INTEGER code dot product
    * rescaled by the two scales; ranking quality degrades gracefully with
    * the 7-bit resolution, and the recall trade is explicit in the code
    * width.
    *
    * Determinism (oracle-exact): codes are `floor(qe_i · 127 / maxabs)`
    * with the product exact in int64 and ONE correctly-rounded double
    * division — identical on any engine; the code dot and `code_dot ·
    * maxabs_c` stay exact in int64 (≤ 64·127² · 5e8 ≪ 2^63); the
    * remaining rescale is a fixed left-to-right chain of single IEEE
    * operations, so scores are bit-identical and ranks reproducible.
    *
    * Scale: same shape as [[bruteForceTopK]] — queries broadcast, corpus
    * never shuffles, salted two-phase top-k — but the corpus-resident
    * state is the code vectors, not the full-precision embeddings. */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def coded(df: DataFrame): DataFrame = {
      val p = prepared(df)
        .withColumn("ma",
          greatest(array_max(transform(col("qe"), x => abs(x))), lit(1L)))
      p.withColumn("cq", transform(col("qe"),
        x => floor((x * lit(127L)).cast("double") / col("ma").cast("double"))
          .cast("long")))
        .select(col("vec_id"), col("nq"), col("ma"), col("cq"))
    }
    val c = coded(corpus)
    val q = coded(queries).select(col("vec_id").as("query_id"),
      col("nq").as("q_nq"), col("ma").as("q_ma"), col("cq").as("q_cq"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos",
        (dotQ(col("cq"), col("q_cq")) * col("ma")).cast("double")
          * col("q_ma").cast("double") / lit(16129.0)
          / (sqrt(col("q_nq").cast("double")) * sqrt(col("nq").cast("double"))))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    topKPerGroup(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs, blocked on `label` (at 100 TB
    * the blocking key is whatever cheap partition exists — cluster id,
    * shard, LSH bucket — so the self-join shuffles per block, never n²). */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val p = prepared(embeddings)
    val a = p.select(col("label"), col("vec_id").as("vec_a"),
      col("qe").as("qe_a"), col("nq").as("nq_a"))
    val b = p.select(col("label"), col("vec_id").as("vec_b"),
      col("qe").as("qe_b"), col("nq").as("nq_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosineQ(dotQ(col("qe_a"), col("qe_b")), col("nq_a"), col("nq_b")))
      .filter(col("cos") >= threshold)
      .select(col("label"), col("vec_a"), col("vec_b"), col("cos"))
  }
  /** Exact covariance matrix of the quantized embedding corpus — the
    * sufficient-statistic table a PCA / whitening / decorrelation step
    * eigen-decomposes DRIVER-side (d×d is bounded — the classic
    * tall-skinny covariance shape: the EIGEN work is O(d³) on one node,
    * the DATA work is distributed here). Emits the upper triangle
    * (i ≤ j): per dimension pair, `n` and the sample covariance
    * `(n·Σxy − Σx·Σy) / (n(n−1))` in quantized units².
    *
    * Exactness: the [[quantize]] 1e-6 fixed-point convention, so every
    * sufficient statistic is an exact DECIMAL(38,0) integer (guarded);
    * the covariance is ONE double division per pair. NULL when n < 2.
    *
    * Scale: the sufficient statistics accumulate in the
    * [[graft.functions.CovStatsAgg]] imperative aggregate — a
    * d(d+1)/2-long checked-int64 buffer per partition, merged once per
    * partition at the single exchange. The O(n·d²) multiply-adds are
    * inherent to exact covariance; what the aggregate removes is the
    * d²× ROW amplification a posexplode-pair form pays (4.2M generated
    * rows for 2,000 64-dim vectors; at corpus scale, the difference
    * between a buffer merge and a shuffle of n·d²/2 rows). Overflow
    * raises loudly (addExact — never understates); at extreme n, sample
    * the frame first — the estimate converges long before the corpus
    * ends. */
  /** Deterministic power-iteration PCA basis from the exact covariance
    * sufficient statistics — the consumer [[embedCovariance]] opened: the
    * classic tall-skinny split where the DATA work (one [[graft.functions
    * .CovStatsAgg]] pass over the corpus) is distributed and the EIGEN
    * work (d×d, d = 64) runs driver-side in O(d²·iters).
    *
    * Deterministic on any engine, by construction: the sufficient
    * statistics are exact integers; each covariance entry is one
    * correctly-rounded int→double conversion and one IEEE division (the
    * [[embedCovariance]] arithmetic, hash-gated by q_embed_cov); power
    * iteration starts from the fixed vector `1/√dim`, folds every
    * matrix-vector product and norm left-to-right over ascending
    * indices, and normalizes with one division per coordinate — so a
    * DuckDB replay of the same iteration count reproduces the basis
    * bit-for-bit (converged or not: parity never depends on
    * convergence). Components after the first come from explicit
    * deflation `C −= λ·v·vᵀ` in the same fixed order.
    *
    * Returns (per-dim means in quantized units, [(λ, v)] per component,
    * leading component first). λ is the final iterate's matvec norm —
    * the dominant eigenvalue once converged. */
  def pcaBasis(emb: DataFrame, components: Int = 2, iters: Int = 12,
      dim: Int = 64): (Seq[Double], Seq[(Double, Seq[Double])]) = {
    val (means, comps, _) = pcaBasisWithTrace(emb, components, iters, dim)
    (means, comps)
  }

  /** [[pcaBasis]] plus the covariance trace (Σ of the exact diagonal,
    * folded over ascending dims) — the total-variance denominator the
    * explained-variance report divides by. */
  private[graft] def pcaBasisWithTrace(emb: DataFrame, components: Int,
      iters: Int, dim: Int): (Seq[Double], Seq[(Double, Seq[Double])], Double) = {
    require(components >= 1 && iters >= 1,
      s"need components, iters >= 1: $components, $iters")
    val row = emb.filter(col("embedding").isNotNull)
      .select(quantize(col("embedding")).as("q"))
      .agg(graft.functions.CovStatsAgg.cov_stats(col("q")).as("s"))
      .head()
    val entries = row.getSeq[org.apache.spark.sql.Row](0)
    require(entries.nonEmpty, "pcaBasis: empty corpus")
    val work = Array.ofDim[Double](dim, dim)
    val mean = new Array[Double](dim)
    entries.foreach { e =>
      val i = e.getLong(0).toInt
      val j = e.getLong(1).toInt
      val n = e.getLong(2)
      require(n > 1, s"pcaBasis needs n >= 2 vectors, got $n")
      // exact integer numerator/denominator, ONE correctly-rounded
      // conversion each, one IEEE division — the embedCovariance chain
      val num = BigInt(n) * BigInt(e.getLong(5)) -
        BigInt(e.getLong(3)) * BigInt(e.getLong(4))
      val cov = num.toDouble / (BigInt(n) * BigInt(n - 1)).toDouble
      work(i)(j) = cov
      work(j)(i) = cov
      if (i == j) mean(i) = e.getLong(3).toDouble / n.toDouble
    }
    // trace BEFORE deflation: total variance, ascending-dim fold
    val trace = (0 until dim).map(i => work(i)(i)).sum
    val comps = (0 until components).map { _ =>
      val v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var lam = 0.0
      for (_ <- 1 to iters) {
        val w = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += work(i)(j) * v(j); j += 1 }
          w(i) = acc
          i += 1
        }
        var ss = 0.0
        i = 0
        while (i < dim) { ss += w(i) * w(i); i += 1 }
        lam = math.sqrt(ss)
        require(lam > 0.0, "pcaBasis: zero matvec (degenerate covariance)")
        i = 0
        while (i < dim) { v(i) = w(i) / lam; i += 1 }
      }
      // deflate in place: C -= lam * v * v^T, fixed evaluation order
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { work(i)(j) = work(i)(j) - lam * v(i) * v(j); j += 1 }
        i += 1
      }
      (lam, v.toSeq)
    }
    (mean.toSeq, comps, trace)
  }

  /** Explained-variance report over the [[pcaBasis]] spectrum — the
    * table a pipeline owner reads BEFORE choosing `components`: per
    * component its eigenvalue λ (the converged power-iteration matvec
    * norm), the explained fraction λ / trace (trace is the exact
    * covariance diagonal sum — total variance), and the running
    * cumulative fraction. Deterministic like the basis itself: λ and
    * trace derive from the same integer sufficient statistics, the
    * fractions are single IEEE divisions, and the cumulative sum folds
    * component-by-component.
    *
    * Scale: ONE cov_stats corpus pass (the [[pcaBasis]] aggregate);
    * everything else is a components-row driver frame. */
  def pcaVariance(emb: DataFrame, components: Int = 2, iters: Int = 12,
      dim: Int = 64): DataFrame = {
    val (_, comps, trace) = pcaBasisWithTrace(emb, components, iters, dim)
    var cum = 0.0
    val rows = comps.zipWithIndex.map { case ((lam, _), i) =>
      cum = cum + lam
      ((i + 1).toLong, lam, lam / trace, cum / trace)
    }
    val s = emb.sparkSession
    import s.implicits._
    rows.toDF("component", "lambda", "explained_frac", "cum_frac")
  }

  /** Project the corpus onto the [[pcaBasis]] components — the gated
    * whitening/visualization step: per vector, `pc_c = Σ_k (q_k − μ_k)
    * · v_c[k]` folded left-to-right (engine-exact doubles given the
    * deterministic basis). Output (vec_id, pc1..pcC).
    *
    * Scale: the basis is driver-held metadata (components × dim
    * doubles); the projection is a narrow map fused into the corpus
    * scan — the whole operator costs two corpus passes total (one
    * cov_stats aggregate, one projection), zero shuffles beyond the
    * single aggregate exchange. */
  def pcaProject(emb: DataFrame, components: Int = 2, iters: Int = 12,
      dim: Int = 64): DataFrame = {
    val (means, comps) = pcaBasis(emb, components, iters, dim)
    val pcs = comps.zipWithIndex.map { case ((_, v), c) =>
      (1 to dim).map(k =>
        (element_at(col("qe"), k).cast("double") - lit(means(k - 1)))
          * lit(v(k - 1)))
        .reduce(_ + _).as(s"pc${c + 1}")
    }
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), quantize(col("embedding")).as("qe"))
      .select(col("vec_id") +: pcs: _*)
  }

  def embedCovariance(emb: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val stats = emb.filter(col("embedding").isNotNull)
      .select(quantize(col("embedding")).as("q"))
      .agg(graft.functions.CovStatsAgg.cov_stats(col("q")).as("s"))
      .select(explode(col("s")).as("p"))
    stats.select(col("p.i").as("i"), col("p.j").as("j"),
      col("p.n").as("n"),
      when(col("p.n") > 1,
        (dec(col("p.n")) * dec(col("p.sxy"))
          - dec(col("p.sx")) * dec(col("p.sy"))).cast("double")
          / (dec(col("p.n")) * dec(col("p.n") - 1L)).cast("double"))
        .as("cov"))
  }
}
