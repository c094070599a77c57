package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.md5Int32

/** Deterministic sampling for training-data pipelines. `TABLESAMPLE` /
  * `df.sample` draw from a per-run RNG — resampling a 100 TB corpus can
  * never be reproduced, diffed, or joined against a previous run's output.
  * Hash-based sampling keys the decision on row identity: the same row is
  * in or out forever, any engine computes the same subset, and rates
  * compose across pipeline stages.
  */
object Sampling {

  /** Keep rows where md5(salt:key) mod `outOf` < `keep` — an exact
    * keep/outOf rate, deterministic per key. */
  def hashSample(df: DataFrame, key: Column, keep: Int, outOf: Int,
      salt: String = "s0"): DataFrame = {
    require(keep >= 0 && keep <= outOf && outOf > 0)
    df.filter(md5Int32(concat(lit(s"$salt:"), key.cast("string"))) % outOf < keep)
  }

  /** Stratified variant: per-stratum keep rates (missing strata keep
    * everything — rate 1/1). The standard recipe for rebalancing a corpus
    * by language/source without a shuffle: one narrow filter. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, (Int, Int)], salt: String = "s0"): DataFrame = {
    val h = md5Int32(concat(lit(s"$salt:"), key.cast("string")))
    val keepExpr = rates.foldLeft(lit(true)) { case (acc, (s, (keep, outOf))) =>
      when(stratum === s, h % outOf < keep).otherwise(acc)
    }
    df.filter(keepExpr)
  }

  /** Fixed-SIZE deterministic per-stratum sample: the `k` rows with the
    * smallest salted md5 rank in each stratum — "give me exactly 20 docs
    * per language, the same 20 on every engine and every run", where
    * [[stratifiedSample]] gives an exact RATE. One shuffle on the stratum
    * key; group fan-in is bounded by stratum cardinality, and the
    * window's rank short-circuits via WindowGroupLimit (top-k per group,
    * never a full per-stratum sort at the driver). */
  def fixedSample(df: DataFrame, key: Column, stratum: Column, k: Int,
      salt: String = "f0"): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.expressions.Window
    val h = graft.text.TextAnalysis.md5Int60(
      concat(lit(s"$salt:"), key.cast("string")))
    val w = Window.partitionBy(stratum).orderBy(h, key)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Shared selection tail of every per-stratum-target sampler
    * ([[mixtureSample]], [[unimaxSample]], [[temperatureSample]]):
    * salted-md5 rank within each stratum, the per-stratum CASE target
    * bound, PLUS the literal global cap (max target) — the literal is
    * what lets Spark's InferWindowGroupLimit fire (the rule needs a
    * LITERAL rank bound, so the CASE alone would forfeit the map-side
    * top-k pruning). One body, so the salt/tie/pruning discipline can
    * never drift between the samplers. */
  private def takePerStratumTargets(df: DataFrame, key: Column,
      stratum: Column, targets: Iterable[(String, Long)],
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.text.TextAnalysis.md5Int60(
      concat(lit(s"$salt:"), key.cast("string")))
    val w = Window.partitionBy(stratum).orderBy(h, key)
    val kExpr = targets.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(stratum === s, lit(k)).otherwise(acc)
    }
    val maxK = targets.map(_._2).max
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= lit(maxK) && col("sample_rank") <= kExpr)
  }


  /** Rebalance a corpus to target mixture WEIGHTS — "make the training set
    * 70% web, 20% code, 10% reference" — keeping as much data as the
    * scarcest stratum allows. The binding stratum s* maximizes w/n; every
    * stratum then keeps `floor(n_star * w_j / w_star)` rows (exact integer
    * arithmetic — no float ratios, so any engine lands on identical
    * counts), selected as the smallest salted-md5 ranks like
    * [[fixedSample]]. Strata present in the data but absent from
    * `weights` are dropped (weight 0).
    *
    * Scale shape: one map-side-combined count per stratum (rows collected
    * = #strata, driver-bounded), then one window shuffle on the stratum
    * key with a WindowGroupLimit top-k per group. Deterministic end to
    * end — re-running on the same corpus reproduces the same mixture. */
  def mixtureSample(df: DataFrame, key: Column, stratum: Column,
      weights: Map[String, Long], salt: String = "mix0"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.filter(lit(false))
      .withColumn("sample_rank", lit(0L))
    // binding stratum: the one whose data runs out first at these weights
    // — maximal w/n, compared by exact cross-multiplication (a tie picks
    // either: equal ratios yield identical floor targets)
    val (sStar, wStar) = present.reduceLeft[(String, Long)] {
      case (a @ (sa, wa), b @ (sb, wb)) =>
        val cmp = (BigInt(wa) * counts(sb)).compare(BigInt(wb) * counts(sa))
        if (cmp > 0 || (cmp == 0 && sa <= sb)) a else b
    }
    val targets = present.map { case (s, w) =>
      // floor(n_star * w / w_star) in overflow-safe exact integers
      s -> (BigInt(counts(sStar)) * w / wStar).toLong
    }
    takePerStratumTargets(df, key, stratum, targets, salt)
  }

  /** Per-source quota cap: keep at most `k` rows per source, preferring the
    * highest `quality` (ties break on `key` ascending, so the cut is
    * deterministic). The standard head-domain guard for web corpora — a
    * handful of hosts contribute millions of pages each and would dominate
    * any uniform sample; capping each source's contribution bounds the head
    * without touching the tail (sources smaller than `k` pass through
    * whole).
    *
    * Scale shape: one shuffle on the source key; the per-source window
    * short-circuits via WindowGroupLimit (top-k per group), so a
    * billion-page host costs a streaming top-k, never a full per-source
    * sort. Skewed sources are the expected case — the rank never
    * materializes more than k winners per group per partition. */
  def quotaCap(df: DataFrame, key: Column, source: Column, quality: Column,
      k: Int): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(source).orderBy(quality.desc, key)
    df.withColumn("quota_rank", row_number().over(w).cast("long"))
      .filter(col("quota_rank") <= k)
  }

  /** Per-stratum TOKEN-budget sample: real LLM mixtures are specified in
    * tokens ("300B web, 40B code"), not document counts — a doc-count
    * quota over-weights strata with long documents. Rows are taken in
    * salted-hash order (deterministic, engine-reproducible) while the
    * running token total stays within the stratum's budget; since the
    * cumulative sum is monotone, the kept set is exactly a prefix of the
    * hash order. Strata absent from `budgets` are dropped (budget 0),
    * mirroring [[mixtureSample]]'s weight semantics. Output carries
    * `cum_tokens` — the materialization step can range-partition on it to
    * cut the stream into equal-token shards for free.
    *
    * Scale shape: one window shuffle on the stratum key with a running
    * ROWS-frame sum — O(1) state per row, no second pass, no driver
    * participation. The frame is ROWS (not the orderBy-default RANGE):
    * (hash, key) is a unique ordering, and ROWS keeps the sum
    * streaming-evaluable. */
  def tokenBudgetSample(df: DataFrame, key: Column, stratum: Column,
      tokens: Column, budgets: Map[String, Long],
      salt: String = "tb0"): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      "budgets must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = graft.text.TextAnalysis.md5Int60(
      concat(lit(s"$salt:"), key.cast("string")))
    val w = Window.partitionBy(stratum).orderBy(h, key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgetExpr = budgets.foldLeft(lit(-1L)) { case (acc, (s0, b)) =>
      when(stratum === s0, lit(b)).otherwise(acc)
    }
    df.withColumn("cum_tokens", sum(tokens.cast("long")).over(w).cast("long"))
      .filter(col("cum_tokens") <= budgetExpr)
  }

  /** Deterministic global training order for one epoch: every row gets a
    * dense position `[0, n)` in the order of a per-epoch salted hash —
    * the shuffled data order a trainer reads, reproducible from the key
    * alone on any engine, different (and independent) per epoch.
    *
    * A naive `row_number() OVER (ORDER BY hash)` is a single-partition
    * global sort — the classic driver-shaped bottleneck. Instead the hash's
    * HIGH bits pick one of `buckets` range-buckets (bucket order IS hash
    * order), per-bucket counts (≤ `buckets` rows, driver-bounded) turn into
    * cumulative offsets broadcast as a map literal, and the global position
    * is `offset(bucket) + rank within bucket`. One shuffle on the bucket
    * key, perfectly parallel across buckets; `buckets` scales with the
    * cluster (set ≈ partition count at 100 TB — the count pre-pass is a
    * map-side-combined agg either way). */
  def epochOrder(df: DataFrame, key: Column, epoch: Int, buckets: Int = 64,
      salt: String = "ep0"): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 &&
      buckets <= (1 << 20), "buckets must be a power of two")
    val shift = 60 - java.lang.Long.numberOfTrailingZeros(buckets.toLong).toInt
    val h = graft.text.TextAnalysis.md5Int60(
      concat(lit(s"$salt:e$epoch:"), key.cast("string")))
    val withB = df.withColumn("__eh", h)
      .withColumn("__eb", shiftright(col("__eh"), shift))
    val counts = withB.groupBy(col("__eb")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty)
      return df.filter(lit(false)).withColumn("epoch_pos", lit(0L))
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__eb")).orderBy(col("__eh"), key)
    withB.withColumn("epoch_pos",
        element_at(typedlit(offsets), col("__eb")) +
          row_number().over(w).cast("long") - lit(1L))
      .drop("__eh", "__eb")
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023): split a total
    * document budget across strata (languages) as EVENLY as the data
    * allows — each stratum gets an equal share of whatever budget remains,
    * capped at what it actually has; the unused remainder of scarce strata
    * cascades to data-rich ones. The fairness answer to proportional or
    * temperature sampling for multilingual corpora: head languages stop
    * dominating, tail languages are never oversampled past their size.
    *
    * Allocation is the classic waterfill fold, processed in ascending
    * (count, name) order with INTEGER division only — `alloc_i = min(n_i,
    * remaining div strataLeft)` — so any engine reproduces the identical
    * allocation (the DuckDB oracle replays the same fold as a recursive
    * CTE). Selection within a stratum is the smallest salted-md5 ranks,
    * exactly [[fixedSample]]'s rule.
    *
    * Scale shape: the fold runs on the per-stratum COUNTS — metadata-sized
    * (#languages rows), same driver-bounded collect as [[mixtureSample]] —
    * never on data. The data pays one map-side-combined count plus one
    * window shuffle on the stratum key whose per-group rank
    * short-circuits via WindowGroupLimit (top-k per group). */
  def unimaxSample(df: DataFrame, key: Column, stratum: Column, budget: Long,
      salt: String = "ux0"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (s, n) => (n, s) }
    if (counts.isEmpty) return df.filter(lit(false))
      .withColumn("sample_rank", lit(0L))
    val targets = scala.collection.mutable.LinkedHashMap[String, Long]()
    var remaining = budget
    var left = counts.length
    for ((s, n) <- counts) {
      val alloc = math.min(n, remaining / left)
      targets(s) = alloc
      remaining -= alloc
      left -= 1
    }
    takePerStratumTargets(df, key, stratum, targets, salt)
  }

  /** Temperature (α) sampling: per-stratum targets proportional to
    * `count^alpha`, scaled to a total budget — the multilingual-pretraining
    * standard between proportional (α=1, head languages dominate) and
    * uniform (α=0, tail languages oversampled); α=0.5 is the mBERT/XLM-R
    * convention, [[unimaxSample]] the fairness-capped alternative.
    *
    * Cross-engine determinism with a fractional power: α is fixed at 0.5,
    * and sqrt is evaluated as an EXACT integer square root of the scaled
    * count — `w_s = isqrt(n_s · 10^6)` — so weights, their sum, and each
    * target `min(n_s, B·w_s / Σw)` are pure integer arithmetic: no libm,
    * no float summation order, nothing for two engines to disagree on.
    * (The 10^6 scale preserves ≥3 significant digits of the ratio even
    * for 1-document strata — far below the granularity a document budget
    * can express — while `n·10^6` stays inside int64 for per-stratum
    * counts up to 9.2 trillion documents.) Targets
    * clamp at the stratum's size (α < 1 over-allocates scarce strata);
    * the clamp loses budget rather than oversampling — callers wanting
    * exact-budget fairness use [[unimaxSample]].
    *
    * Scale shape: identical to [[unimaxSample]] — metadata-sized count
    * collect, one window shuffle, WindowGroupLimit pruning. */
  def temperatureSample(df: DataFrame, key: Column, stratum: Column,
      budget: Long, salt: String = "tp0"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (s, n) => (n, s) }
    if (counts.isEmpty) return df.filter(lit(false))
      .withColumn("sample_rank", lit(0L))
    val weights = counts.map { case (s, n) => (s, n, isqrt(n * 1000000L)) }
    val totalW = weights.map(_._3).sum
    val targets = weights.map { case (s, n, w) =>
      s -> math.min(n, (BigInt(budget) * w / totalW).toLong)
    }
    takePerStratumTargets(df, key, stratum, targets, salt)
  }

  /** Weighted sample without replacement, probability ∝ weight:
    * sequential Poisson sampling (Ohlsson 1998, "Sequential Poisson
    * sampling") — rank every row by `u/w` where `u` is its salted-md5
    * uniform and `w` its weight, keep the `k` smallest ranks. Heavy rows
    * draw small ranks proportionally often, giving a πps-approximate
    * fixed-size sample with [[hashSample]]'s determinism: no RNG, the
    * same `k` rows on every engine and every run — the reproducible way
    * to bias a corpus sample toward long/high-quality documents.
    *
    * Cross-engine exactness with a DIVISION in the sort key: `u` is the
    * 32-bit md5 hash and `w` a positive long; both convert to doubles
    * exactly (each < 2^53), and IEEE-754 division is a single correctly-
    * rounded operation — Spark and any IEEE engine compute the identical
    * double, so the order (tie-broken by key) is identical. No libm, no
    * float accumulation.
    *
    * Scale shape: one narrow map for the rank, then a global top-k —
    * Spark plans TakeOrdered (per-partition heap of k, driver merge of
    * #partitions·k), never a global sort. */
  def sequentialPoisson(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = "sp0"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = md5Int32(concat(lit(s"$salt:"), key.cast("string")))
    // weights are a COLUMN, so the positivity contract the sibling
    // samplers `require` driver-side is enforced in-plan: a zero weight
    // would rank Infinity/NaN and a negative one would rank FIRST,
    // silently selecting exactly the invalid rows — fail loudly instead
    val w = weight.cast("long")
    val checked = when(w > 0, w).otherwise(
      raise_error(concat(lit("sequentialPoisson: non-positive weight "),
        w.cast("string"))))
    df.withColumn("pps_rank", u.cast("double") / checked.cast("double"))
      .orderBy(col("pps_rank").asc, key.asc)
      .limit(k)
  }

  /** Exact integer square root: floor(√x). Seeded from the double sqrt
    * (correctly rounded, so at most one off at 2^53-scale integers) and
    * nudged to the true floor — the same two-branch adjustment the SQL
    * oracle applies, so both engines land on identical integers. */
  private[graft] def isqrt(x: Long): Long = {
    require(x >= 0)
    var t = math.sqrt(x.toDouble).toLong
    // BigInt comparisons: t² brushes int64 range for x near Long.MaxValue
    while (t > 0 && BigInt(t) * BigInt(t) > x) t -= 1
    while (BigInt(t + 1) * BigInt(t + 1) <= x) t += 1
    t
  }

  /** Deterministic train/val/test split assignment: hash the row key into
    * [0, total) where total = Σ weights, and label by cumulative range.
    * The same row lands in the same split on every engine and every run —
    * the property `df.sample`-based splits lack — so splits survive corpus
    * re-processing, and membership can be recomputed from the key alone
    * (no split table to store or join at 100 TB). One narrow map. */
  def splitAssign(df: DataFrame, key: Column, weights: Seq[(String, Int)],
      salt: String = "split0"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    val total = weights.map(_._2).sum
    val h = md5Int32(concat(lit(s"$salt:"), key.cast("string"))) % total
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val label = weights.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((name, _), upper), rest) => when(h < upper, lit(name)).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Poisson(1) inverse-CDF thresholds over the uint32 hash space:
    * `floor(CDF(k) · 2³²)` for k = 0..5 (mass beyond 6 is ~8×10⁻⁵ and
    * caps there). Shared verbatim with the oracle SQL so both engines
    * draw the identical bootstrap weights. */
  val PoissonThresholds: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L)

  /** Deterministic Poisson bootstrap of a mean (Efron 1979 via the
    * Poisson approximation standard for distributed data — Chamandy et
    * al. 2012, "Estimating uncertainty for massive data streams": each
    * row's multiplicity in resample b is Poisson(1), so no global row
    * numbering or n-way sampling pass is needed). Weights are the
    * Poisson(1) inverse CDF applied to `md5(b:key)` — pure hash, no RNG —
    * so every engine (and every re-run) draws the identical resamples:
    * the [[hashSample]] reproducibility rule extended to uncertainty
    * quantification. Emits one row per resample `(b, n_eff, sum_wv,
    * mean_micro)`; the spread of `mean_micro` across the B rows IS the
    * sampling distribution of the mean — percentile it for a CI.
    *
    * Exactness: values quantize to `floor(value·1e6)` micro-units before
    * weighting; `sum_wv` and `n_eff` are exact integer sums;
    * `mean_micro` is one division.
    *
    * Scale: one scan, a ×B `sequence` fan-out that partial-aggregates
    * map-side to B rows per partition before the only (B-row) shuffle —
    * the corpus never materializes ×B. B is the knob: 64 resamples of a
    * 100 TB table cost one scan plus 64 counters per partition. */
  def bootstrapMeans(df: DataFrame, key: Column, value: Column,
      resamples: Int = 64): DataFrame = {
    require(resamples >= 1, s"need resamples >= 1: $resamples")
    val h = md5Int32(concat(col("b").cast("string"), lit(":"),
      col("id").cast("string")))
    val w = PoissonThresholds.zipWithIndex
      .foldRight(lit(PoissonThresholds.size.toLong)) { case ((t, k), rest) =>
        when(col("h") < t, k.toLong).otherwise(rest)
      }
    df.select(key.cast("string").as("id"),
        floor(value * lit(1000000)).cast("long").as("v"))
      .select(col("id"), col("v"),
        explode(sequence(lit(1), lit(resamples))).as("b"))
      .withColumn("h", h)
      .withColumn("w", w)
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("v")).as("sum_wv"))
      // a resample can draw weight 0 for EVERY row (P = e^-n per
      // resample — real only for tiny inputs): its mean is undefined,
      // reported as NULL rather than an engine-dependent 0/0 encoding
      .select(col("b").cast("long").as("b"), col("n_eff"), col("sum_wv"),
        when(col("n_eff") > 0,
          col("sum_wv").cast("double") / col("n_eff").cast("double"))
          .as("mean_micro"))
  }
}
