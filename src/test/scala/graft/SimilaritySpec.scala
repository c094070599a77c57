package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {

  private def vecsOf(rows: (Long, Seq[Float], Int)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("vec_id", "embedding", "label")
  }

  private def pad(v: Seq[Float]): Seq[Float] = v ++ Seq.fill(8 - v.size)(0f)

  test("bruteForceTopK ranks by exact cosine, self-dup first") {
    val corpus = vecsOf(
      (10L, pad(Seq(1f, 0f)), 0),    // identical direction to query
      (11L, pad(Seq(0.9f, 0.1f)), 0), // close
      (12L, pad(Seq(0f, 1f)), 0),    // orthogonal
      (13L, pad(Seq(-1f, 0f)), 0))   // opposite
    val queries = vecsOf((1L, pad(Seq(2f, 0f)), 0))
    val got = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    assert(got.map(_._2).toSeq == Seq(10L, 11L, 12L))
    assert(math.abs(got(0)._3 - 1.0) < 1e-9)
    assert(math.abs(got(2)._3) < 1e-9)
  }

  test("labelCentroids: floor-mean centroids, pairwise cosine separation") {
    val vecs = vecsOf(
      (1L, pad(Seq(1f, 0f)), 0), (2L, pad(Seq(1f, 0f)), 0), // centroid (1,0)
      (3L, pad(Seq(0f, 1f)), 1),                            // centroid (0,1)
      (4L, pad(Seq(1f, 0f)), 2))                            // centroid (1,0)
    val got = Similarity.labelCentroids(vecs)
      .orderBy("label_a", "label_b").collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("cos")))
    assert(got.toSeq == Seq(
      (0, 1, 2L, 1L, 0.0), (0, 2, 2L, 1L, 1.0), (1, 2, 1L, 1L, 0.0)))
  }

  test("hardNegatives: nearest DIFFERENT-label vectors only") {
    val corpus = vecsOf(
      (10L, pad(Seq(1f, 0f)), 0),     // same label as anchor: excluded
      (11L, pad(Seq(0.9f, 0.1f)), 1), // cross-label, nearest
      (12L, pad(Seq(0f, 1f)), 1),     // cross-label, orthogonal
      (13L, pad(Seq(1f, 0f)), 0))     // same label: excluded despite cos 1
    val anchors = vecsOf((1L, pad(Seq(2f, 0f)), 0))
    val got = Similarity.hardNegatives(corpus, anchors, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    // only the two label-1 vectors qualify, nearest first
    assert(got.toSeq == Seq((1L, 11L), (2L, 12L)))
  }

  test("pqTopK: exact regime — corpus size == kClusters makes every vector " +
      "its own codeword, so ADC equals brute force bit-for-bit") {
    val corpus = vecsOf(
      (10L, pad(Seq(1f, 0f)), 0),
      (11L, pad(Seq(0.9f, 0.1f)), 0),
      (12L, pad(Seq(0f, 1f)), 0),
      (13L, pad(Seq(-1f, 0.5f)), 0))
    val queries = vecsOf((1L, pad(Seq(2f, 0f)), 0), (2L, pad(Seq(0f, 3f)), 0))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSeq.sorted
    val pq = rows(Similarity.pqTopK(corpus, queries, k = 3,
      subspaces = 2, kClusters = 4, iters = 2, dim = 8))
    val bf = rows(Similarity.bruteForceTopK(corpus, queries, k = 3))
    // with 4 corpus vectors and 4 centroids per subspace, Lloyd's settles
    // on each sub-vector exactly; the int x double ADC products are exact
    // below 2^53, so not just ranks but the cosines are bit-identical
    assert(pq == bf)
  }

  test("pqTopK: deterministic, k rows per query, codes-only serving") {
    val corpus = vecsOf((10L to 29L).map(i =>
      (i, pad(Seq((i % 7).toFloat / 7f, (i % 5).toFloat / 5f, 1f)), 0)): _*)
    val queries = vecsOf((1L, pad(Seq(0.5f, 0.3f, 1f)), 0))
    def run() = Similarity.pqTopK(corpus, queries, k = 5,
      subspaces = 2, kClusters = 4, iters = 2, dim = 8)
    val a = run().collect().map(_.toSeq).toSeq
    assert(a == run().collect().map(_.toSeq).toSeq)
    assert(a.size == 5)
  }

  test("rpTopK: JL sketch preserves an exact-match top-1; signs are deterministic ±1") {
    val s1 = Similarity.rpSigns(4, 8)
    assert(s1 == Similarity.rpSigns(4, 8))
    assert(s1.flatten.forall(v => v == 1L || v == -1L))
    val corpus = vecsOf(
      (10L, pad(Seq(1f, 0f)), 0),
      (11L, pad(Seq(0f, 1f)), 0),
      (12L, pad(Seq(-1f, 0f)), 0))
    val queries = vecsOf((1L, pad(Seq(2f, 0f)), 0))
    // an identical-direction vector projects to an identical-direction
    // sketch (projection is linear), so it must still rank first with
    // sketch cosine exactly 1
    val got = Similarity.rpTopK(corpus, queries, k = 3, outDims = 4, dim = 8)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    assert(got.head._1 == 10L && math.abs(got.head._2 - 1.0) < 1e-12)
    // and the opposite vector lands at sketch cosine exactly -1
    assert(got.last._1 == 12L && math.abs(got.last._2 + 1.0) < 1e-12)
  }

  test("mmrTopK diversifies: an exact duplicate of the first pick loses to a novel result") {
    val corpus = vecsOf(
      (10L, pad(Seq(1f, 0f, 0f)), 0),
      (11L, pad(Seq(2f, 0f, 0f)), 0),   // exact duplicate direction of 10
      (12L, pad(Seq(0f, 1f, 0.1f)), 0)) // orthogonal to 10, mildly relevant
    val queries = vecsOf((1L, pad(Seq(1f, 0.2f, 0f)), 0))
    val got = Similarity.mmrTopK(corpus, queries, k = 2, candidates = 3,
        lambda = 0.5)
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("neighbor_id"))).toSeq
    // step 1: 10 and 11 tie on relevance -> smaller id; step 2: the dup's
    // redundancy penalty (sim 1.0) sinks it below the orthogonal 12
    assert(got == Seq((1L, 10L), (2L, 12L)))
    // plain top-2 would have returned the duplicate instead
    val plain = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(plain == Seq(10L, 11L))
  }

  test("mmrTopK: k = candidates returns the whole pool; deterministic") {
    val corpus = vecsOf(
      (20L, pad(Seq(1f, 0.3f)), 0), (21L, pad(Seq(0.2f, 1f)), 0),
      (22L, pad(Seq(0.7f, 0.7f)), 0))
    val queries = vecsOf((2L, pad(Seq(1f, 0f)), 0))
    def run() = Similarity.mmrTopK(corpus, queries, k = 3, candidates = 3)
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("neighbor_id"))).toSeq
    val a = run()
    assert(a == run())
    assert(a.map(_._2).toSet == Set(20L, 21L, 22L))
    assert(a.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("topK returns at most k with deterministic tiebreak on neighbor_id") {
    val corpus = vecsOf((1L to 10L).map(i => (i + 100, pad(Seq(1f, 0f)), 0)): _*)
    val queries = vecsOf((1L, pad(Seq(1f, 0f)), 0))
    val got = Similarity.bruteForceTopK(corpus, queries, k = 4).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(101L, 102L, 103L, 104L))
  }

  test("ivfTopK only searches the query's sign bucket") {
    val corpus = vecsOf(
      (10L, pad(Seq(1f, 1f, 1f, 1f)), 0),     // bucket 1111
      (11L, pad(Seq(1f, 1f, 1f, -1f)), 0))    // bucket 0111
    val queries = vecsOf((1L, pad(Seq(2f, 2f, 2f, 2f)), 0))
    val got = Similarity.ivfTopK(corpus, queries, k = 5, signBits = 4).collect()
    // vec 11 is cosine-closer than orthogonal but in a different bucket
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L))
  }

  test("ivfKmeansTopK: full-probe equals brute force; 1-probe recalls the query's cluster") {
    // two well-separated direction clusters
    val clusterA = (0 until 6).map(i => (100L + i, pad(Seq(1f, 0.01f * i)), 0))
    val clusterB = (0 until 6).map(i => (200L + i, pad(Seq(-1f, 1f - 0.01f * i)), 0))
    val corpus = vecsOf(clusterA ++ clusterB: _*)
    val queries = vecsOf((1L, pad(Seq(1f, 0.02f)), 0), (2L, pad(Seq(-1f, 0.97f)), 0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"))).toSeq
    val brute = rows(Similarity.bruteForceTopK(corpus, queries, k = 4))
    // probing every centroid searches the whole corpus => exact equality
    val full = rows(Similarity.ivfKmeansTopK(corpus, queries, k = 4,
      kClusters = 2, iters = 2, nprobe = 2, dim = 8))
    assert(full == brute)
    // one probe still recalls everything for queries inside a cluster
    // (k <= cluster size, clusters well separated)
    val one = rows(Similarity.ivfKmeansTopK(corpus, queries, k = 4,
      kClusters = 2, iters = 2, nprobe = 1, dim = 8))
    assert(one == brute)
  }

  test("nearDupPairsLsh: surfaces near-identical vectors without any label blocking") {
    val corpus = vecsOf(
      (1L, pad(Seq(1f, 0.01f)), 0),
      (2L, pad(Seq(1f, 0.011f)), 1),  // near-dup of 1, DIFFERENT label
      (3L, pad(Seq(-1f, 0.5f)), 0))   // unrelated direction
    val got = Similarity.nearDupPairsLsh(corpus, threshold = 0.9, signBits = 4)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("nearDupPairs finds same-label near-identical vectors only") {
    val vecs = vecsOf(
      (1L, pad(Seq(1f, 0f, 0f)), 0),
      (2L, pad(Seq(0.999f, 0.001f, 0f)), 0),  // near-dup of 1, same label
      (3L, pad(Seq(1f, 0f, 0f)), 1),          // identical but different label
      (4L, pad(Seq(0f, 1f, 0f)), 0))          // same label, orthogonal
    val got = Similarity.nearDupPairs(vecs, threshold = 0.95).collect()
    assert(got.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSeq == Seq((1L, 2L)))
    assert(got.head.getAs[Double]("cos") > 0.99)
  }

  test("quantized_dot: exact integer dot product (codegen expression)") {
    import graft.functions.QuantizedDot.quantized_dot
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1L, 2L, -3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(quantized_dot(col("a"), col("b"))).collect().head.getLong(0)
      == (4 + 10 - 18))
  }

  test("quantization is exact: integer dot of known vectors") {
    val df = vecsOf((1L, pad(Seq(0.5f, -0.25f)), 0))
      .select(Similarity.quantize(col("embedding")).as("qe"))
    val qe = df.collect().head.getSeq[Long](0)
    assert(qe.take(2) == Seq(500000L, -250000L))
  }

  test("semDedup: min-id anchor kept, same-cluster near-copies dropped, distinct vectors kept") {
    // two tight direction bundles far apart; 2 clusters isolate them
    val bundleA = (0 until 4).map(i => (10L + i, pad(Seq(1f, 0.001f * i)), 0))
    val bundleB = (0 until 3).map(i => (20L + i, pad(Seq(-1f, 1f + 0.001f * i)), 0))
    val lone = Seq((30L, pad(Seq(0.8f, 0.6f)), 0)) // same half-space as A, not a copy
    val got = Similarity.semDedup(vecsOf(bundleA ++ bundleB ++ lone: _*),
      threshold = 0.999, kClusters = 2, iters = 2, dim = 8)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("keep")).toMap
    // each bundle keeps exactly its min id; the lone vector survives
    assert(got(10L) == 1L && got(11L) == 0L && got(12L) == 0L && got(13L) == 0L)
    assert(got(20L) == 1L && got(21L) == 0L && got(22L) == 0L)
    assert(got(30L) == 1L)
  }

  test("sqTopK preserves brute-force ranking on separated vectors") {
    val corpus = vecsOf(
      (10L, pad(Seq(1f, 0f)), 0),     // identical direction to query
      (11L, pad(Seq(0.9f, 0.1f)), 0), // close
      (12L, pad(Seq(0f, 1f)), 0),     // orthogonal
      (13L, pad(Seq(-1f, 0f)), 0))    // opposite
    val queries = vecsOf((1L, pad(Seq(2f, 0f)), 0))
    val got = Similarity.sqTopK(corpus, queries, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    assert(got.map(_._1).toSeq == Seq(10L, 11L, 12L))
    // identical direction survives quantization exactly (codes [127,0,...])
    assert(math.abs(got(0)._2 - 1.0) < 1e-9)
    assert(math.abs(got(2)._2) < 1e-9)
  }

  test("recallAtK: partial overlap, zero-hit query kept, exact integer hits") {
    val s = spark
    import s.implicits._
    def res(rows: (Long, Long, Long)*) =
      rows.toSeq.toDF("query_id", "rank", "neighbor_id")
    // query 1: approx found 2 of 3 exact neighbors; query 2: none
    val exact = res((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L), (2L, 3L, 22L))
    val approx = res((1L, 1L, 10L), (1L, 2L, 12L), (1L, 3L, 99L),
      (2L, 1L, 98L), (2L, 2L, 97L), (2L, 3L, 96L))
    val got = Similarity.recallAtK(approx, exact, k = 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 2.0 / 3.0), (2L, 0L, 3L, 0.0)))
  }

  test("sqTopK approximate cosine stays within 7-bit quantization error of exact") {
    // deterministic pseudo-random directions (no RNG — index-derived)
    val corpus = vecsOf((0 until 20).map { i =>
      (100L + i, pad(Seq(
        math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat,
        (0.1f * (i % 5)), 0.25f)), 0)
    }: _*)
    val queries = vecsOf((1L, pad(Seq(0.6f, -0.8f, 0.2f, 0.1f)), 0))
    def byNeighbor(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos")).toMap
    val exact = byNeighbor(Similarity.bruteForceTopK(corpus, queries, k = 20))
    val approx = byNeighbor(Similarity.sqTopK(corpus, queries, k = 20))
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (id, a) =>
      assert(math.abs(a - exact(id)) < 0.03,
        s"neighbor $id: approx $a vs exact ${exact(id)}")
    }
  }
  test("embedCovariance: hand-computed 2-dim upper triangle, n<2 NULL") {
    val s = spark
    import s.implicits._
    // q = (1e6, 2e6), (3e6, 4e6): every pair's sample covariance is 2e12
    val emb = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embedCovariance(emb).orderBy("i", "j").collect()
    assert(got.map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSeq
      == Seq((0L, 0L), (0L, 1L), (1L, 1L)))
    assert(got.forall(_.getAs[Long]("n") == 2L))
    assert(got.forall(_.getAs[Double]("cov") == 2.0e12))
    // single vector: covariance undefined -> NULL
    val one = Similarity.embedCovariance(
      Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")).collect()
    assert(one.forall(r => r.isNullAt(r.fieldIndex("cov"))))
  }
  test("embedCovariance feeds driver-side PCA: power iteration recovers the known axis") {
    val s = spark
    import s.implicits._
    // rank-1 corpus along (0.6, 0.8): covariance = var(t) * outer(axis)
    val emb = Seq(-2.0f, -1.0f, 1.0f, 2.0f).zipWithIndex.map { case (t, k) =>
      (k.toLong, Array(0.6f * t, 0.8f * t)) }
      .toDF("vec_id", "embedding")
    val rows = Similarity.embedCovariance(emb).collect()
      .map(r => (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt,
        r.getAs[Double]("cov")))
    // assemble the symmetric matrix driver-side (the operator's contract:
    // d x d is bounded, the eigen work is a one-node O(d^3) epilogue)
    val d = 2
    val m = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, c) => m(i)(j) = c; m(j)(i) = c }
    var v = Array(1.0, 0.0)
    for (_ <- 1 to 50) {
      val w = Array.tabulate(d)(i => (0 until d).map(k => m(i)(k) * v(k)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    val vAbs = v.map(math.abs)
    assert(math.abs(vAbs(0) - 0.6) < 1e-6 && math.abs(vAbs(1) - 0.8) < 1e-6,
      s"principal axis should be (0.6, 0.8), got ${v.toSeq}")
    // rank-1: the second eigenvalue is ~0 -> residual after deflation tiny
    val lambda = (0 until d).map(i => (0 until d).map(k => m(i)(k) * v(k)).sum / v(i)).head
    val residual = (0 until d).flatMap(i => (0 until d).map(j =>
      m(i)(j) - lambda * v(i) * v(j))).map(math.abs).max
    assert(residual < 1e-3 * math.abs(lambda),
      s"rank-1 corpus must deflate to ~zero residual (lambda=$lambda residual=$residual)")
  }

  test("trainPqBooks equals per-slice trainCentroids book for book") {
    // the batched trainer claims VALUE-identical codebooks to running
    // the full Lloyd's per slice — pin it double-for-double (same seeds,
    // same integer sums, same IEEE means), since the q_ann_pq/q_ann_ivfpq
    // oracles replay the per-slice form
    val vecs = vecsOf((0 until 30).map { i =>
      (i.toLong, pad(Seq((i % 5).toFloat, (i % 3).toFloat, (i % 7).toFloat,
        (i % 2).toFloat)), 0)
    }: _*)
    val c = Similarity.prepared(vecs)
    val dim = 8
    val sub = 2
    val subDim = dim / sub
    val batched = Similarity.trainPqBooks(c, sub, kClusters = 4, iters = 2, dim = dim)
    val perSlice = (0 until sub).map { m =>
      Similarity.trainCentroids(
        c.select(col("vec_id"),
          slice(col("qe"), m * subDim + 1, subDim).as("qe")),
        kClusters = 4, iters = 2, dim = subDim)
    }
    assert(batched == perSlice,
      s"batched codebooks diverge from per-slice Lloyd's:\n$batched\nvs\n$perSlice")
  }

  test("ivfPqTopK with nprobe = kClusters degenerates to pqTopK exactly") {
    // probing every list removes the candidate cut; scoring is the same
    // ADC over the same codebooks, so the rankings must be identical —
    // the composition adds routing, never different arithmetic
    val vecs = vecsOf((0 until 24).map { i =>
      (i.toLong, pad(Seq((i % 4).toFloat - 1.5f, (i % 5).toFloat - 2f,
        (i % 3).toFloat - 1f)), 0)
    }: _*)
    val corpus = vecs.filter(col("vec_id") >= 4)
    val queries = vecs.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSeq
    val full = rows(Similarity.ivfPqTopK(corpus, queries, k = 3,
      kClusters = 4, nprobe = 4, subspaces = 2, dim = 8))
    val pq = rows(Similarity.pqTopK(corpus, queries, k = 3,
      subspaces = 2, kClusters = 4, dim = 8))
    assert(full == pq, s"ivfpq(nprobe=k) != pq:\n$full\nvs\n$pq")
  }

  test("ivfPqTopK finds the right cluster on a clustered corpus") {
    // the sf-fixture embeddings are random, so their gated recall is
    // honestly low; this pins that the machinery finds structure when
    // structure exists. PQ codes deliberately collapse intra-cluster
    // distinctions (members of one tight cluster share a code, ADC ties
    // break by id), so the planted property is CLUSTER membership —
    // every neighbor the composed index returns for a cluster-center
    // query must belong to that query's cluster.
    val dirs = Seq(
      Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f),
      Seq(0f, 0f, 10f, 0f), Seq(0f, 0f, 0f, 10f))
    val members = (0 until 32).map { i =>
      val d = dirs(i % 4)
      // small deterministic jitter keeps members distinct but clustered
      (i.toLong + 100L,
        pad(d.zipWithIndex.map { case (x, k) =>
          x + (if (k == (i / 4) % 4) 0.5f + 0.1f * (i % 3) else 0f) }), 0)
    }
    val queryRows = (0 until 4).map(q => (q.toLong, pad(dirs(q)), 0))
    val got = Similarity.ivfPqTopK(vecsOf(members: _*), vecsOf(queryRows: _*),
      k = 3, kClusters = 4, iters = 2, nprobe = 2, subspaces = 2, dim = 8)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(got.length == 12, s"expected 4 queries x 3 neighbors: ${got.length}")
    got.foreach { case (q, n) =>
      assert((n - 100L) % 4 == q,
        s"query $q (cluster $q) got neighbor $n of cluster ${(n - 100) % 4}")
    }
  }

  test("ivfAdcTopK: residual codes keep cluster membership and recall at " +
      "least the raw-code IVFPQ's on the clustered fixture") {
    // the q_ann_ivfpq_recall fixture argument, applied to the residual
    // path: planted clusters, cluster-center queries, same
    // nprobe/subspace budget for both indexes. Residual encoding spends
    // the codebook on the within-list distribution, so its recall must
    // be >= the raw-code path's — the property that justifies the step.
    val dirs = Seq(
      Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f),
      Seq(0f, 0f, 10f, 0f), Seq(0f, 0f, 0f, 10f))
    val members = (0 until 32).map { i =>
      val d = dirs(i % 4)
      (i.toLong + 100L,
        pad(d.zipWithIndex.map { case (x, k) =>
          x + (if (k == (i / 4) % 4) 0.5f + 0.1f * (i % 3) else 0f) }), 0)
    }
    val queryRows = (0 until 4).map(q => (q.toLong, pad(dirs(q)), 0))
    val corpus = vecsOf(members: _*)
    val queries = vecsOf(queryRows: _*)
    val adc = Similarity.ivfAdcTopK(corpus, queries,
      k = 3, kClusters = 4, iters = 2, nprobe = 2, subspaces = 2, dim = 8)
    // cluster membership: every neighbor belongs to its query's cluster
    adc.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .foreach { case (q, n) =>
        assert((n - 100L) % 4 == q,
          s"query $q (cluster $q) got neighbor $n of cluster ${(n - 100) % 4}")
      }
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
    def avgRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(approx, exact, k = 3)
        .agg(avg(col("recall"))).head().getDouble(0)
    val adcRecall = avgRecall(adc)
    val pqRecall = avgRecall(Similarity.ivfPqTopK(corpus, queries,
      k = 3, kClusters = 4, iters = 2, nprobe = 2, subspaces = 2, dim = 8))
    assert(adcRecall >= pqRecall,
      s"residual encoding must not lose recall: adc=$adcRecall pq=$pqRecall")
    assert(adcRecall > 0.0, s"degenerate fixture: adc recall $adcRecall")
  }

  test("pcaBasis/pcaProject: orthonormal basis, projection preserves dot " +
      "products in the retained subspace") {
    // mass lives in dims 0 (variance ~160x) and 1 (variance 1), the rest
    // exactly zero: a wide eigengap, so 12 power iterations converge to
    // machine precision and the retained 2-D subspace IS the data's span
    val vecs = vecsOf((0 until 20).map { i =>
      (i.toLong, pad(Seq(((i % 5) - 2) * 8f, (i % 2) * 2f - 1f)), 0)
    }: _*)
    val dim = 8
    val (means, comps) = Similarity.pcaBasis(vecs, components = 2, dim = dim)
    val Seq((lam1, v1), (lam2, v2)) = comps
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // orthonormality of the basis
    assert(math.abs(dot(v1, v1) - 1.0) < 1e-12, s"|v1| != 1: ${dot(v1, v1)}")
    assert(math.abs(dot(v2, v2) - 1.0) < 1e-12, s"|v2| != 1: ${dot(v2, v2)}")
    assert(math.abs(dot(v1, v2)) < 1e-9, s"v1.v2 != 0: ${dot(v1, v2)}")
    // the leading axis is dim 0 (the high-variance direction), and the
    // eigenvalues come out in decreasing order
    assert(math.abs(v1(0)) > 0.9999, s"v1 should align with dim 0: $v1")
    assert(math.abs(v2(1)) > 0.9999, s"v2 should align with dim 1: $v2")
    assert(lam1 > lam2 && lam2 > 0.0, s"eigenvalue order: $lam1, $lam2")

    // projection preserves pairwise dot products of the CENTERED vectors
    // (all centered mass lies in the retained span by construction)
    val pcs = Similarity.pcaProject(vecs, components = 2, dim = dim)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        Seq(r.getAs[Double]("pc1"), r.getAs[Double]("pc2"))).toMap
    val centered = (0 until 20).map { i =>
      val raw = Seq(((i % 5) - 2) * 8.0, (i % 2) * 2.0 - 1.0) ++
        Seq.fill(dim - 2)(0.0)
      i.toLong -> raw.zipWithIndex.map { case (x, k) =>
        math.floor(x * 1e6) - means(k) }
    }.toMap
    for (x <- 0L until 20L; y <- x until 20L) {
      val exact = dot(centered(x), centered(y))
      val proj = dot(pcs(x), pcs(y))
      assert(math.abs(proj - exact) <= 1e-6 * (math.abs(exact) + 1.0),
        s"pair ($x,$y): projected dot $proj != centered dot $exact")
    }
  }

  test("marginPairs mines planted translations: mutual, margin above the field") {
    // src side: two distinct directions + one hubness decoy close to
    // everything; tgt side: exact translations of src 1 and 2 (same
    // direction = cos 1) plus unrelated noise vectors
    val src = vecsOf(
      (1L, pad(Seq(1f, 0f, 0f)), 0),
      (2L, pad(Seq(0f, 1f, 0f)), 0),
      (3L, pad(Seq(0.6f, 0.6f, 0.5f)), 0)) // decoy: moderately close to all
    val tgt = vecsOf(
      (101L, pad(Seq(2f, 0f, 0f)), 1),     // translation of 1
      (102L, pad(Seq(0f, 3f, 0f)), 1),     // translation of 2
      (103L, pad(Seq(0f, 0f, 1f)), 1),     // noise
      (104L, pad(Seq(0.1f, 0.1f, 0.9f)), 1)) // noise
    val got = Similarity.marginPairs(src, tgt, k = 3, minMargin = 1.0)
      .collect().map(r => r.getAs[Long]("src_id") ->
        (r.getAs[Long]("tgt_id"), r.getAs[Double]("margin"), r.getAs[Long]("mutual"))).toMap
    // the planted translations mine with mutual agreement
    assert(got(1L)._1 == 101L && got(1L)._3 == 1L)
    assert(got(2L)._1 == 102L && got(2L)._3 == 1L)
    // translation margins dominate whatever the decoy mined (if anything)
    val plantedMin = math.min(got(1L)._2, got(2L)._2)
    got.get(3L).foreach { case (_, m, _) => assert(m < plantedMin) }
    // margin definition sanity: cos 1.0 vs a neighborhood average < 1
    assert(got(1L)._2 > 1.0 && got(2L)._2 > 1.0)
  }

  test("marginFromTopK composes precomputed ANN top-k frames identically") {
    val src = vecsOf((1L, pad(Seq(1f, 0f, 0f)), 0), (2L, pad(Seq(0f, 1f, 0f)), 0))
    val tgt = vecsOf(
      (101L, pad(Seq(1f, 0.1f, 0f)), 1), (102L, pad(Seq(0.1f, 1f, 0f)), 1),
      (103L, pad(Seq(0.5f, 0.5f, 0.5f)), 1))
    val fwd = Similarity.bruteForceTopK(tgt, src, 2)
    val bwd = Similarity.bruteForceTopK(src, tgt, 2)
    val a = Similarity.marginPairs(src, tgt, k = 2, minMargin = 0.0)
      .orderBy("src_id").collect().toSeq
    val b = Similarity.marginFromTopK(fwd, bwd, k = 2, minMargin = 0.0)
      .orderBy("src_id").collect().toSeq
    assert(a == b)
  }
}
