package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics for outlier handling in metric/feature
  * pipelines: percentile winsorization (clamp into [p_lo, p_hi]) and the
  * median absolute deviation — the outlier treatments that survive heavy
  * tails where mean/stddev clipping does not.
  *
  * Determinism: Spark's exact `percentile` and DuckDB's `quantile_cont`
  * compute the identical linear interpolation (parity is hash-proven by
  * q_percentiles), clamping is pure comparison, and the MAD's deviation is
  * a single IEEE subtraction — no engine-divergent math anywhere.
  *
  * Scale: exact percentiles buffer each group's values on one reducer — the
  * right call for bounded per-group cardinality (metric families, event
  * types). For groups of unbounded width at 100 TB, swap `percentile` for
  * `approx_percentile` (t-digest sketch, mergeable map-side) and drop the
  * oracle to rows-only, the same trade q_approx_distinct documents. The
  * tiny bounds/median tables broadcast back, so the fact table never
  * shuffles for the clamp itself.
  */
object RobustStats {

  /** Gini concentration coefficient of a non-negative value column —
    * "how dominated is this corpus/revenue/traffic by its top keys", the
    * inequality summary next to [[graft.operators.Skew]]'s mitigation
    * tools (Gini 0 = uniform, → 1 = one key carries everything).
    *
    * Exact-rank identity over the VALUE HISTOGRAM (the
    * [[graft.text.TextAnalysis.vocabCoverage]] decomposition — ties are
    * interchangeable, so no row-level global sort exists):
    * `G = (2·Σᵢ rankᵢ·xᵢ − (n+1)·Σx) / (n·Σx)` where for a value class
    * (x, m) after `prev` smaller items the rank sum is
    * `x·(prev·m + m(m+1)/2)`. Sums accumulate in DECIMAL(38,0) (the
    * rateTrend exactness rule — no int64 wrap at any n), and G is ONE
    * division of the two exactly-derived doubles.
    *
    * Scale: one keyed aggregate to the per-key values, one map-side
    * combined histogram, and two window passes over the |distinct
    * values| histogram — the unpartitioned window is bounded by the
    * histogram, never by the keys. */
  def gini(values: DataFrame, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val hist = values.select(value.as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("m"))
    val byX = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("prev", sum(col("m")).over(byX) - col("m"))
      // 2·Σ rank·x carried as ONE integer-valued decimal term per class
      // (x·(2·prev·m + m·(m+1))) so no fractional scale ever appears
      .withColumn("rank_sum2",
        dec(col("x")) * (lit(2) * dec(col("prev")) * dec(col("m"))
          + dec(col("m")) * (dec(col("m")) + 1)))
      .withColumn("n", sum(col("m")).over(all))
      .withColumn("sx", sum(dec(col("x")) * dec(col("m"))).over(all))
      .withColumn("sr2", sum(col("rank_sum2")).over(all))
      // all-zero values: G is undefined (0/0) — NULL on both engines
      // rather than an ANSI divide-by-zero (the bootstrapMeans rule)
      .select(col("n"), col("sx").cast("double").as("sum_value"),
        when(col("sx") > 0,
          (col("sr2") - (dec(col("n")) + 1) * col("sx")).cast("double")
            / (dec(col("n")) * col("sx")).cast("double")).as("gini"))
      .limit(1)
  }

  /** Events with their value clamped into the group's [lo, hi] percentile
    * band, plus a clipped flag. One aggregate over the facts + a broadcast
    * join back — the fact table is scanned twice but shuffled never. */
  def winsorize(events: DataFrame, group: String = "event_type",
      value: String = "value", lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val bounds = events.groupBy(col(group))
      .agg(percentile(col(value), lit(lo)).as("lo"),
        percentile(col(value), lit(hi)).as("hi"))
    events.join(broadcast(bounds), Seq(group))
      .select(col("event_id"), col(group), col(value),
        least(greatest(col(value), col("lo")), col("hi")).as("winsorized"),
        (col(value) < col("lo") || col(value) > col("hi")).cast("long").as("clipped"))
  }

  /** Per-group median and median absolute deviation. */
  def medianAbsDev(events: DataFrame, group: String = "event_type",
      value: String = "value"): DataFrame = {
    val med = events.groupBy(col(group))
      .agg(percentile(col(value), lit(0.5)).as("median"))
    events.join(broadcast(med), Seq(group))
      .groupBy(col(group), col("median"))
      .agg(percentile(abs(col(value) - col("median")), lit(0.5)).as("mad"),
        count(lit(1)).as("n"))
  }

  /** Rank-based quantile normalization per group: each value mapped to its
    * empirical quantile `(rank-1)/(n-1)` in integer micro-units — the
    * cross-source score calibration that makes "quality 0.9 from source A"
    * comparable to source B's scale (rank transforms survive arbitrary
    * monotone distortions where z-scores don't).
    *
    * Exactness: `rank` is `row_number` over the `(value, event_id)` total
    * order — ties broken deterministically, no averaged fractional ranks —
    * and `norm_micro = (1e6·(rank-1)) div (n-1)` is pure integer
    * arithmetic; singleton groups normalize to 0.
    *
    * Scale: one keyed shuffle + per-group sort — the honest cost of EXACT
    * ranks. When a group outgrows one reducer at 100 TB, the
    * bucket-decomposed rank (the shardBalance/concat-chunk trick) or a
    * KLL-sketch approximate CDF ([[graft.functions.QuantileSketch]])
    * replaces the window; this exact form is the oracle-provable
    * reference. */
  def quantileNormalize(events: DataFrame, group: String = "event_type",
      value: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(group))
      .orderBy(col(value).asc, col("event_id").asc)
    events
      .select(col("event_id"), col(group), col(value))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(group))))
      .withColumn("norm_micro",
        when(col("n") > 1,
          expr("(1000000 * (rank - 1)) div (n - 1)")).otherwise(lit(0L)))
  }

  /** Theil–Sen robust slope per group (Sen 1968): the median of all
    * pairwise slopes `(v_j - v_i) / (t_j - t_i)` over each group's `lastN`
    * most recent events — up to 29% outliers cannot move it, where the
    * least-squares slope ([[graft.metrics.Metrics]] rateTrend) chases them.
    *
    * Exactness contract: values quantize to integer milli-units
    * (`floor(v·1000)` — floor of an IEEE product, identical in any engine),
    * timestamps to epoch micros, so every pair's slope is the exact
    * rational `num/den`. The median is picked POSITIONALLY: pairs totally
    * ordered by `(num/den as one IEEE division, num, den)` and the lower
    * median (row `(n+1) div 2`) selected — the output is that pair's exact
    * `(num, den)`, never an averaged float, so the gate hash-matches
    * cross-engine. Pairs with `t_i = t_j` are excluded (vertical slope),
    * standard for the estimator.
    *
    * Scale: the self-join shuffles each side once on the group key; the
    * `lastN` window bounds every group to ≤ lastN·(lastN-1)/2 pairs, so
    * skewed keys cannot quadratic-blow — the same bounded-window trade
    * snmPairs makes. O(lastN²) per key is the documented cost knob. */
  def theilSen(events: DataFrame, group: String = "user_id",
      ts: String = "ts", value: String = "value", lastN: Int = 64): DataFrame = {
    require(lastN >= 2, s"theilSen: lastN must be >= 2, got $lastN")
    val recentW = Window.partitionBy(col(group))
      .orderBy(col("t").desc, col("event_id").desc) // micros order == ts order
    val recent = events
      .select(col(group), col("event_id"),
        // NTZ sources cast through TIMESTAMP (session UTC) = oracle epoch_us
        unix_micros(col(ts).cast("timestamp")).as("t"),
        floor(col(value) * lit(1000)).cast("long").as("v"))
      .withColumn("rn", row_number().over(recentW))
      .filter(col("rn") <= lastN)
      .select(col(group), col("t"), col("v"))
      // the self-join below consumes `recent` TWICE; without a barrier each
      // side re-scans and re-window-sorts the FULL event table (the r18
      // before-plan shows the whole scan→Exchange→WindowGroupLimit subtree
      // duplicated). The window output is tiny by construction (≤ lastN
      // rows per group), so land it once and join the landed table
      .localCheckpoint(true)
    val pairs = recent.select(col(group), col("t").as("ta"), col("v").as("va"))
      .join(recent.select(col(group), col("t").as("tb"), col("v").as("vb")),
        Seq(group))
      .filter(col("ta") < col("tb"))
      .select(col(group), (col("vb") - col("va")).as("num"),
        (col("tb") - col("ta")).as("den"))
    val orderW = Window.partitionBy(col(group))
      .orderBy((col("num").cast("double") / col("den").cast("double")).asc,
        col("num").asc, col("den").asc)
    pairs
      .withColumn("r", row_number().over(orderW))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy(col(group))))
      .filter(col("r") === floor((col("n_pairs") + 1) / 2).cast("long"))
      .select(col(group), col("n_pairs"),
        col("num").as("slope_num"), col("den").as("slope_den"))
  }

  /** Exact GLOBAL rank over the `(v_micro, event_id)` total order with NO
    * single-partition sort — the scale path [[quantileNormalize]]'s
    * scaladoc promises for groups that outgrow one reducer. A plain
    * `row_number() OVER (ORDER BY …)` funnels 100 TB through one task;
    * this decomposes it: a range exchange spreads the order across
    * `buckets` partitions (every row in bucket i precedes every row in
    * bucket i+1), the per-bucket counts — `buckets` rows, metadata-sized —
    * collect to the driver, and each row's rank is its bucket's running
    * offset plus its `row_number` WITHIN the bucket (the epochOrder /
    * shardBalance decomposition, here over a VALUE order instead of a
    * hash order).
    *
    * Exactness: values quantize to integer micro-units (`floor(v·1e6)`,
    * one IEEE multiply + floor — identical on any engine), `event_id`
    * breaks ties, so the rank of every row is total-order determined no
    * matter where the sampled range boundaries land. The bucket
    * assignment is pinned with a `localCheckpoint` so the count collect
    * and the rank window see the SAME assignment (range boundaries are
    * sampled per execution).
    *
    * Scale: one range exchange + one bucket-keyed window — each bucket
    * sorts ~n/buckets rows; nothing data-sized ever visits the driver. */
  def globalRank(events: DataFrame, value: String = "value",
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"globalRank: buckets must be >= 1, got $buckets")
    val base = events.select(col("event_id"),
      floor(col(value) * lit(1000000)).cast("long").as("v_micro"))
    val ranged = base
      .repartitionByRange(buckets, col("v_micro"), col("event_id"))
      .withColumn("__b", spark_partition_id().cast("long"))
      .localCheckpoint()
    val counts = ranged.groupBy(col("__b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty)
      return base.filter(lit(false)).withColumn("rnk", lit(0L))
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("v_micro"), col("event_id"))
    ranged
      .withColumn("rnk", element_at(typedlit(offsets), col("__b")) +
        row_number().over(w).cast("long"))
      .select(col("event_id"), col("v_micro"), col("rnk"))
  }

  /** Mann–Whitney U two-sample drift test (Mann & Whitney 1947) per
    * event type: did the VALUE distribution shift between the reference
    * period (before UTC day `splitDay`) and the current one? The
    * rank-based complement to the binned [[graft.operators.Relational
    * .psiDrift]]/[[graft.operators.Relational.ksDrift]] monitors — U is
    * exactly P(X1 > X2)-shaped, needs no band width, and is the standard
    * nonparametric location test when values are heavy-tailed.
    *
    * Exact decomposition over the per-type VALUE HISTOGRAM (the
    * [[gini]]/vocabCoverage tie-class rule — tied values are
    * interchangeable, so no row-level rank sort exists): for a micro-value
    * class with period counts (c1, c2), t = c1 + c2 and `prev` smaller
    * items, every member's DOUBLED average rank is the integer
    * `2·prev + t + 1`, so `2·R1 = Σ c1·(2·prev + t + 1)` and
    * `2·U1 = 2·R1 − n1·(n1+1)` accumulate exactly in DECIMAL(38,0) (the
    * rateTrend rule — loud raise on overflow, no int64 wrap at any n).
    * The tie-corrected normal approximation
    * `z = (U1 − n1·n2/2) / sqrt(n1·n2/12 · ((N+1) − Σ(t³−t)/(N(N−1))))`
    * is ONE fixed IEEE chain over doubles cast from those exact integers
    * (the chiSquareTokens determinism rule); z is NULL when a period is
    * empty or every value is tied (σ = 0 — the 0/0 whose encoding
    * differs across engines).
    *
    * Scale: one (type, value)-keyed aggregation, then the cumulative
    * window runs over the HISTOGRAM (bounded by distinct micro-values
    * per type — the ksDrift bounded-window rule), never over events. A
    * type whose value support is genuinely unbounded at 100 TB outgrows
    * the per-type histogram window the same way quantileNormalize
    * documents: decompose the cumulative with [[globalRank]]'s
    * range-exchange buckets. */
  def mannWhitneyDrift(events: DataFrame, splitDay: Long = 19737L): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"mannWhitneyDrift: $what exceeds the exact DECIMAL(38) bound")))
    val hist = events
      .select(col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"),
        floor(col("value") * lit(1000000)).cast("long").as("v"))
      .withColumn("period",
        when(expr("tus div 86400000000") < splitDay, lit(1L)).otherwise(lit(2L)))
      .groupBy(col("event_type"), col("v"))
      .agg(sum(when(col("period") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("period") === 2, 1L).otherwise(0L)).as("c2"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = hist
      .withColumn("t", col("c1") + col("c2"))
      .withColumn("prev", sum(col("t")).over(cum) - col("t"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(dec(col("c1")) * dec(lit(2L) * col("prev") + col("t") + 1L))
          .as("r1_2x"),
        sum(dec(col("t")) * dec(col("t")) * dec(col("t")) - dec(col("t")))
          .as("tie_cubes"))
    val u1_2x = exact(col("r1_2x"), "2*R1") -
      dec(col("n1")) * dec(col("n1") + 1L)
    val bigN = col("n1") + col("n2")
    val varU = (dec(col("n1")) * dec(col("n2"))).cast("double") *
      ((bigN + 1L).cast("double") -
        exact(col("tie_cubes"), "sum(t^3 - t)").cast("double") /
          (dec(bigN) * dec(bigN - 1L)).cast("double")) / lit(12.0)
    stats.select(col("event_type"), col("n1"), col("n2"),
      u1_2x.cast("double").as("u1_2x"),
      (dec(lit(2L)) * dec(col("n1")) * dec(col("n2")) - u1_2x)
        .cast("double").as("u2_2x"),
      col("tie_cubes").cast("double").as("tie_cubes"),
      when(col("n1") > 0 && col("n2") > 0,
        when(varU > 0,
          (u1_2x - dec(col("n1")) * dec(col("n2"))).cast("double") /
            (lit(2.0) * sqrt(varU)))).as("z"))
  }

  /** Banded Spearman rank trend per event type: the rank correlation
    * between WHEN an event happened (its UTC day) and its VALUE — the
    * robust monotone-drift detector next to the least-squares
    * [[graft.metrics.Metrics.rateTrend]] (a single outlier day swings a
    * slope; it barely moves a rank correlation). Banded exactly as the
    * binned KS is: days are the natural time bands, values use their
    * micro-unit classes, and ranks are tie-averaged over each band — the
    * standard large-scale practice, since exact per-row Spearman needs a
    * global sort per group.
    *
    * Exactness: both rank tables carry DOUBLED average ranks (integer
    * `2·prev + t + 1`, see [[mannWhitneyDrift]]); ρ is then Pearson over
    * the two integer rank columns with DECIMAL(38,0) sufficient
    * statistics and the crossStreamCorrelation one-chain IEEE output —
    * NULL for a constant side. Doubling cancels in ρ (both numerator
    * and denominator scale by 4).
    *
    * Scale: two histogram-sized rank tables (days per type, distinct
    * micro-values per type) built with bounded cumulative windows, joined
    * back keyed on (type, band) — the fact table shuffles once per join
    * key and never sorts row-level. */
  def spearmanTrend(events: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"spearmanTrend: $what exceeds the exact DECIMAL(38) bound")))
    val base = events.select(col("event_type"),
      expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"),
      floor(col("value") * lit(1000000)).cast("long").as("v"))
    def rank2x(keyCol: String, out: String): DataFrame = {
      val cum = Window.partitionBy(col("event_type")).orderBy(col(keyCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col("event_type"), col(keyCol))
        .agg(count(lit(1)).as("t"))
        .withColumn("prev", sum(col("t")).over(cum) - col("t"))
        .select(col("event_type"), col(keyCol),
          (lit(2L) * col("prev") + col("t") + 1L).as(out))
    }
    val paired = base
      .join(rank2x("day", "rd"), Seq("event_type", "day"))
      .join(rank2x("v", "rv"), Seq("event_type", "v"))
      .select(col("event_type"), dec(col("rd")).as("x"), dec(col("rv")).as("y"))
    val stats = paired.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    val denx = exact(dec(col("n")) * col("sxx") - col("sx") * col("sx"),
      "n*sxx - sx*sx")
    val deny = exact(dec(col("n")) * col("syy") - col("sy") * col("sy"),
      "n*syy - sy*sy")
    val num = exact(dec(col("n")) * col("sxy") - col("sx") * col("sy"),
      "n*sxy - sx*sy")
    stats.select(col("event_type"), col("n"),
      when(denx > 0 && deny > 0,
        num.cast("double") /
          (sqrt(denx.cast("double")) * sqrt(deny.cast("double")))).as("rho"))
  }
  /** Banded Kendall tau-b per event type between WHEN (day band) and
    * VALUE (micro-unit band) — the concordance-based ordinal association
    * next to [[spearmanTrend]] (Kendall 1938, "A new measure of rank
    * correlation"; tau-b is the tie-adjusted form). Spearman reads rank
    * covariance; tau reads pair concordance — less sensitive to a few
    * large rank gaps, the standard cross-check when the two disagree.
    *
    * Banding IS the scale answer: exact per-row tau is O(n log n) per
    * group with a global sort, so days collapse to `dayBand`-day bands
    * and values to `valueBand` micro-unit bands, and tau-b is computed
    * EXACTLY on the banded contingency table — concordant/discordant
    * pair mass between cells with strictly-increasing day band read off
    * the joint histogram, ties from the two marginals. Cells per type
    * are bounded by (day bands × value bands), and the cell self-join by
    * its square — both independent of row count, and the equi-key join
    * reuses one exchange for its two sides. Widen the bands if a corpus
    * ever grows the cell product; the trade is banding resolution, not
    * correctness of the banded statistic.
    *
    * Exactness: cell counts, concordant/discordant products, and tie
    * terms accumulate in DECIMAL(38,0) with raise_error guards; tau-b is
    * ONE fixed IEEE chain `2·(C−D) / (√(n(n−1)−Tx) · √(n(n−1)−Ty))`
    * over doubles cast from those exact integers — NULL when either
    * marginal is fully tied (denominator 0). */
  def kendallTau(events: DataFrame, dayBand: Long = 7L,
      valueBand: Long = 5000000L): DataFrame = {
    require(dayBand >= 1 && valueBand >= 1,
      s"bands must be >= 1: dayBand=$dayBand valueBand=$valueBand")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"kendallTau: $what exceeds the exact DECIMAL(38) bound")))
    // the explicit NULL-day filter matches the isnotnull(d) the planner
    // infers on the pair-join branches, so every branch below shares ONE
    // canonical cells subtree and AQE's ReuseExchange runs the events
    // scan + (type, d, b) shuffle once, not once per branch (a row with
    // no timestamp can never join a concordance pair anyway)
    val cells = events
      .select(col("event_type"),
        expr(s"unix_micros(cast(ts as timestamp)) div 86400000000 div $dayBand")
          .as("d"),
        expr(s"cast(floor(value * 1000000) as bigint) div $valueBand").as("b"))
      .filter(col("d").isNotNull)
      .groupBy(col("event_type"), col("d"), col("b"))
      .agg(count(lit(1)).as("t"))
    val pairs = cells.select(col("event_type"), col("d").as("d1"),
        col("b").as("b1"), col("t").as("t1"))
      .join(cells.select(col("event_type"), col("d").as("d2"),
        col("b").as("b2"), col("t").as("t2")), Seq("event_type"))
      .filter(col("d1") < col("d2"))
    val cd = pairs.groupBy(col("event_type"))
      .agg(
        sum(when(col("b2") > col("b1"), dec(col("t1")) * dec(col("t2")))
          .otherwise(dec(lit(0L)))).as("conc"),
        sum(when(col("b2") < col("b1"), dec(col("t1")) * dec(col("t2")))
          .otherwise(dec(lit(0L)))).as("disc"))
    def marginalTies(key: String, out: String): DataFrame =
      cells.groupBy(col("event_type"), col(key)).agg(sum(col("t")).as("tt"))
        .groupBy(col("event_type"))
        .agg(sum(col("tt")).as(s"n_$out"),
          sum(dec(col("tt")) * dec(col("tt") - 1L)).as(out))
    val base = marginalTies("d", "tx2").withColumnRenamed("n_tx2", "n")
      .join(marginalTies("b", "ty2").drop("n_ty2"), Seq("event_type"))
      .join(cd, Seq("event_type"), "left")
      .withColumn("conc", coalesce(col("conc"), dec(lit(0L))))
      .withColumn("disc", coalesce(col("disc"), dec(lit(0L))))
    val n02 = dec(col("n")) * dec(col("n") - 1L)
    val dx = exact(n02 - col("tx2"), "n(n-1) - Tx")
    val dy = exact(n02 - col("ty2"), "n(n-1) - Ty")
    val num = exact(col("conc") - col("disc"), "C - D")
    base.select(col("event_type"), col("n"),
      col("conc").cast("double").as("conc"),
      col("disc").cast("double").as("disc"),
      when(dx > 0 && dy > 0,
        lit(2.0) * num.cast("double") /
          (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))).as("tau_b"))
  }
}
