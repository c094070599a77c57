package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
  }

  test("hashSample: deterministic, repeatable, roughly at rate") {
    val a = Sampling.hashSample(docs, col("doc_id"), 1, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, col("doc_id"), 1, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)                          // same subset every run
    assert(a.size > 50 && a.size < 200)     // ~10% of 1000
    val c = Sampling.hashSample(docs, col("doc_id"), 1, 10, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c != a)                          // salt changes the subset
  }

  test("hashSample: rate composes — keep 2/10 is a superset of keep 1/10") {
    val narrow = Sampling.hashSample(docs, col("doc_id"), 1, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wide = Sampling.hashSample(docs, col("doc_id"), 2, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(narrow.subsetOf(wide))
  }

  test("stratifiedSample: per-stratum rates, unlisted strata kept") {
    val out = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> (0, 1))) // drop all english
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("en"))
    assert(out("de") == 500L)
  }

  test("splitAssign: exhaustive, disjoint, deterministic, ~weighted") {
    val out = Sampling.splitAssign(docs, col("doc_id"),
      Seq("train" -> 8, "val" -> 1, "test" -> 1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000L)              // every row labeled once
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 200)
    // repeatable: same assignment on re-run
    val a = out.select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Sampling.splitAssign(docs, col("doc_id"),
      Seq("train" -> 8, "val" -> 1, "test" -> 1))
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
  }

  test("fixedSample: exactly k per stratum, deterministic, salt-sensitive") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val got = Sampling.fixedSample(df, col("doc_id"), col("lang"), k = 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.count(_._2 == "a") == 7 && got.count(_._2 == "b") == 7)
    assert(got.forall(_._3 <= 7))
    // rerun picks the identical rows; a different salt picks different ones
    val again = Sampling.fixedSample(df, col("doc_id"), col("lang"), k = 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
    val other = Sampling.fixedSample(df, col("doc_id"), col("lang"), k = 7,
      salt = "f1").collect().map(_.getLong(0)).toSet
    assert(other != got.map(_._1).toSet)
    // a stratum smaller than k returns all of it
    val tiny = Sampling.fixedSample(
      Seq((1L, "x"), (2L, "x")).toDF("doc_id", "lang"),
      col("doc_id"), col("lang"), k = 7)
    assert(tiny.count() == 2)
  }

  test("mixtureSample: exact target proportions, scarcest stratum binding") {
    val s = spark
    import s.implicits._
    // 600 en / 100 de / 300 es; want en:de = 4:1 → de binds (1/100 > 4/600),
    // keeps: en = 100*4/1 = 400, de = 100, es unweighted → dropped
    val corpus = ((0L until 600L).map((_, "en"))
      ++ (600L until 700L).map((_, "de"))
      ++ (700L until 1000L).map((_, "es")))
      .toDF("doc_id", "lang")
    val out = Sampling.mixtureSample(corpus, col("doc_id"), col("lang"),
      Map("en" -> 4L, "de" -> 1L))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 400L, "de" -> 100L))
    // deterministic: identical membership on a re-run
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.mixtureSample(corpus, col("doc_id"), col("lang"),
      Map("en" -> 4L, "de" -> 1L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // weight flip keeps de binding (w/n: de 4/100 > en 1/600) but scales
    // the pool: λ = 100/4 = 25 → en keeps 25, de keeps all 100
    val flipped = Sampling.mixtureSample(corpus, col("doc_id"), col("lang"),
      Map("en" -> 1L, "de" -> 4L))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flipped == Map("en" -> 25L, "de" -> 100L))
    // weights covering no present stratum → empty result, stable schema
    assert(Sampling.mixtureSample(corpus, col("doc_id"), col("lang"),
      Map("zz" -> 1L)).count() == 0L)
  }

  test("unimaxSample: waterfill — scarce strata kept whole, rich strata share the rest") {
    val s = spark
    import s.implicits._
    // 600 en / 100 de / 300 es, budget 500. Ascending (n, name):
    // de(100): share 500/3=166 → all 100, rem 400
    // es(300): share 400/2=200 → 200,     rem 200
    // en(600): share 200/1=200 → 200,     rem 0
    val corpus = ((0L until 600L).map((_, "en"))
      ++ (600L until 700L).map((_, "de"))
      ++ (700L until 1000L).map((_, "es")))
      .toDF("doc_id", "lang")
    val byLang = Sampling.unimaxSample(corpus, col("doc_id"), col("lang"), 500L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("de" -> 100L, "es" -> 200L, "en" -> 200L))
    // budget above the corpus: everything kept, nothing oversampled
    val all = Sampling.unimaxSample(corpus, col("doc_id"), col("lang"), 5000L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("de" -> 100L, "es" -> 300L, "en" -> 600L))
    // floor remainders cascade: budget 7 over two 10-doc strata → 3 + 4
    val two = ((0L until 10L).map((_, "aa")) ++ (10L until 20L).map((_, "bb")))
      .toDF("doc_id", "lang")
    val seven = Sampling.unimaxSample(two, col("doc_id"), col("lang"), 7L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seven == Map("aa" -> 3L, "bb" -> 4L))
    assert(seven.values.sum == 7L)
    // deterministic membership on re-run
    val a = Sampling.unimaxSample(corpus, col("doc_id"), col("lang"), 500L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.unimaxSample(corpus, col("doc_id"), col("lang"), 500L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 500)
  }

  test("temperatureSample: targets ∝ √count, clamped at stratum size, integer-exact") {
    val s = spark
    import s.implicits._
    // 900 en / 100 de, budget 400: w = isqrt(n·10^6) → en 30000, de 10000
    // en: 400·30000/40000 = 300; de: 400·10000/40000 = 100 (= its size)
    val corpus = ((0L until 900L).map((_, "en"))
      ++ (900L until 1000L).map((_, "de")))
      .toDF("doc_id", "lang")
    val byLang = Sampling.temperatureSample(corpus, col("doc_id"), col("lang"), 400L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 300L, "de" -> 100L))
    // α=0.5 flattens vs proportional: de gets 25% of the kept set from
    // 10% of the data; clamp: a huge budget cannot oversample
    val clamped = Sampling.temperatureSample(corpus, col("doc_id"), col("lang"), 100000L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clamped == Map("en" -> 900L, "de" -> 100L))
    // isqrt is the exact floor square root, including near-boundary values
    assert(Sampling.isqrt(0L) == 0L && Sampling.isqrt(1L) == 1L)
    assert(Sampling.isqrt(3L) == 1L && Sampling.isqrt(4L) == 2L)
    assert(Sampling.isqrt(999999L) == 999L && Sampling.isqrt(1000000L) == 1000L)
    val big = 3037000499L // isqrt(Long.MaxValue)
    assert(Sampling.isqrt(Long.MaxValue) == big)
    assert(Sampling.isqrt(big * big) == big && Sampling.isqrt(big * big - 1L) == big - 1L)
  }

  test("quotaCap: k per big source, small sources whole, quality wins") {
    val s = spark
    import s.implicits._
    // source "big": 50 docs, quality = doc_id; "small": 3 docs
    val df = ((0L until 50L).map(i => (i, "big", i))
      ++ Seq((100L, "small", 1L), (101L, "small", 9L), (102L, "small", 5L)))
      .toDF("doc_id", "source", "q")
    val got = Sampling.quotaCap(df, col("doc_id"), col("source"), col("q"),
      k = 10).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(got.count(_._2 == "big") == 10)
    assert(got.count(_._2 == "small") == 3)          // under quota: all kept
    // highest-quality big docs survive: ids 40..49 (q = doc_id)
    assert(got.filter(_._2 == "big").map(_._1).sorted.toSeq ==
      (40L until 50L).toSeq)
    // rank 1 is the best-quality row per source
    assert(got.filter(_._3 == 1L).map(_._1).toSet == Set(49L, 101L))
    // deterministic tie-break: equal quality orders by key ascending
    val tied = Sampling.quotaCap(
      Seq((3L, "x", 7L), (1L, "x", 7L), (2L, "x", 7L)).toDF("doc_id", "source", "q"),
      col("doc_id"), col("source"), col("q"), k = 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(tied == Seq(1L, 2L))
  }

  test("tokenBudgetSample: prefix within budget, unbudgeted strata dropped") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L)
      .map(i => (i, if (i % 2 == 0) "en" else "zz", 10L + i % 5))
      .toDF("doc_id", "lang", "n_tok")
    val out = Sampling.tokenBudgetSample(df, col("doc_id"), col("lang"),
      col("n_tok"), Map("en" -> 300L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.forall(_._2 == "en"))                 // zz has no budget
    assert(out.map(_._3).max <= 300L)                // never exceeds budget
    assert(out.nonEmpty && out.length < 100)         // proper subset of en
    // the kept set is the PREFIX of the hash order: adding any excluded
    // doc's tokens to the max cum would cross the budget
    val perDoc = df.filter(col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val keptIds = out.map(_._1).toSet
    val minExcludedTok =
      perDoc.collect { case (id, n) if !keptIds.contains(id) => n }.min
    assert(out.map(_._3).max + minExcludedTok > 300L)
    // deterministic on re-run
    val again = Sampling.tokenBudgetSample(df, col("doc_id"), col("lang"),
      col("n_tok"), Map("en" -> 300L)).collect().map(_.getLong(0)).toSet
    assert(again == keptIds)
  }

  test("epochOrder: dense global permutation, bucket-count invariant") {
    val s = spark
    import s.implicits._
    val df = (0L until 500L).toDF("doc_id").repartition(7)
    val out = Sampling.epochOrder(df, col("doc_id"), epoch = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dense permutation of [0, n)
    assert(out.values.toSeq.sorted == (0L until 500L).toSeq)
    // bucket count is an implementation knob, not a semantics knob
    val b4 = Sampling.epochOrder(df, col("doc_id"), epoch = 1, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b4 == out)
    // epochs are independent shuffles
    val e2 = Sampling.epochOrder(df, col("doc_id"), epoch = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e2 != out)
    assert(e2.values.toSeq.sorted == (0L until 500L).toSeq)
  }

  test("contaminationPairs: flags benchmark overlap, spares clean docs") {
    val s = spark
    import s.implicits._
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
      (101L, "quick brown fox jumps over a sleeping cat in the barn"), // partial
      (102L, "completely unrelated text about spark query planning today"))
      .toDF("doc_id", "text")
    val got = graft.dedup.Dedup.contaminationPairs(corpus, bench, maxOverlap = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("overlap"))).toMap
    assert(got.contains(100L) && got(100L) == 1.0)
    assert(!got.contains(102L))
  }

  private def weighted = {
    val s = spark
    import s.implicits._
    (0L until 500L).map(i => (i, 1L + (i % 50L) * 100L)).toDF("doc_id", "w")
  }

  test("sequentialPoisson: top-k is the k-prefix of the full rank order") {
    val all = Sampling.sequentialPoisson(weighted, col("doc_id"), col("w"),
        k = 500)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("pps_rank"))).toSeq
    assert(all.length == 500)
    // rank order is (pps_rank, doc_id) ascending, returned in order
    assert(all == all.sortBy { case (id, r) => (r, id) })
    val top = Sampling.sequentialPoisson(weighted, col("doc_id"), col("w"),
        k = 25)
      .collect().map(r => r.getLong(0)).toSeq
    assert(top == all.take(25).map(_._1))
  }

  test("sequentialPoisson: deterministic, salt changes the draw, heavy rows dominate") {
    def ids(salt: String) = Sampling.sequentialPoisson(weighted,
        col("doc_id"), col("w"), k = 50, salt = salt)
      .collect().map(_.getLong(0)).toSeq
    assert(ids("sp0") == ids("sp0"))
    assert(ids("sp0") != ids("other"))
    // P ∝ w: rows with w=1 (doc_id % 50 == 0, uniform u up to 2^32 vs
    // heavy rows' u/4901) essentially never make the cut
    val lightPicked = ids("sp0").count(_ % 50L == 0L)
    assert(lightPicked == 0, s"light rows picked: $lightPicked")
  }

  test("bootstrapMeans: deterministic Poisson weights, exact micro sums") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2.5), (2L, 2.5), (3L, 2.5), (4L, 2.5))
      .toDF("event_id", "value")
    def run() = Sampling.bootstrapMeans(df,
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value"), resamples = 64)
      .orderBy("b").collect()
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("n_eff"),
        r.getAs[Long]("sum_wv")))
    val a = run()
    assert(a.length == 64 && a.map(_._1).toSeq == (1L to 64L))
    // all values equal: every resample's sum is exactly n_eff * 2_500_000
    a.foreach { case (_, n, s2) => assert(s2 == n * 2500000L) }
    // Poisson(1) weights cap at 6 per row, 4 rows per resample
    a.foreach { case (b, n, _) => assert(n >= 0 && n <= 24, s"b=$b n=$n") }
    // hash-seeded: mean effective size across 64 resamples near 4 (E[w]=1)
    val mean = a.map(_._2).sum.toDouble / 64
    assert(mean > 2.5 && mean < 5.5, s"mean n_eff $mean")
    // fully deterministic across runs
    assert(run().toSeq == a.toSeq)
  }
}
