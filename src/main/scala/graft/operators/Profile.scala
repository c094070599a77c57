package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiler — the `ANALYZE TABLE`-grade statistics panel every data
  * pipeline runs before (and after) a transformation: per column, the row
  * count, null count, distinct count, and typed min/max. Drives skew
  * decisions (ndv vs rows → join strategy), data-quality monitoring
  * (null/ndv drift between snapshots via [[graft.dedup.Dedup.snapshotDiff]]
  * on the profile), and optimizer-statistics export.
  *
  * One scan: all per-column aggregates evaluate in a single `agg` pass
  * and the wide single row is unpivoted to one row per column with
  * `stack` — a metadata-sized result regardless of input size. Min/max
  * are emitted in TYPED channels (`min_num`/`max_num` for numerics,
  * `min_str`/`max_str` for strings) rather than stringified — engines
  * disagree on number/timestamp formatting, and a profile that will be
  * diffed across engines must not depend on it.
  *
  * Distinct counts: `exact = true` uses `count_distinct` (Catalyst plans
  * one Expand over the scan — fine at gate scale, heavy at 100 TB);
  * `exact = false` (the at-scale default) swaps in
  * `approx_count_distinct` (HLL++, no Expand, map-side combinable) with
  * everything else unchanged.
  */
object Profile {

  def profile(df: DataFrame, numericCols: Seq[String], stringCols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "no columns to profile")
    def ndv(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c)
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        (numericCols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            ndv(col(c)).as(s"__ndv_$c"),
            min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c"))
        } ++ stringCols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            ndv(col(c)).as(s"__ndv_$c"),
            min(col(c)).as(s"__min_$c"),
            max(col(c)).as(s"__max_$c"))
        })
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // stack(n, label1, cols1..., label2, cols2...): one output row per column
    val numArms = numericCols.map { c =>
      s"'$c', `__nulls_$c`, `__ndv_$c`, `__min_$c`, `__max_$c`, " +
        "CAST(NULL AS STRING), CAST(NULL AS STRING)"
    }
    val strArms = stringCols.map { c =>
      s"'$c', `__nulls_$c`, `__ndv_$c`, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), " +
        s"`__min_$c`, `__max_$c`"
    }
    val arms = (numArms ++ strArms).mkString(", ")
    val n = numericCols.length + stringCols.length
    wide.selectExpr("__n AS n_rows",
      s"stack($n, $arms) AS (col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)")
      .select(col("col_name"), col("n_rows"),
        col("n_nulls").cast("long"), col("n_distinct").cast("long"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  /** Equi-width histogram of a numeric column over the fixed domain
    * `[lo, hi)` — the optimizer-statistics / drift-monitoring companion
    * to [[profile]]. Bounds are explicit parameters rather than a min/max
    * pre-pass: the caller pins the domain so histograms from different
    * snapshots are bucket-aligned and diffable (a data-derived domain
    * would re-bucket every run). Values outside the domain are counted in
    * the `n_below`/`n_above` overflow rows (bucket -1 and `bins`) instead
    * of silently clamped — out-of-range mass IS the drift signal.
    *
    * Bucket = `floor((v - lo) * bins / (hi - lo))`, the multiplication
    * BEFORE the division pinned so any engine computes the identical IEEE
    * chain. One map-side-combined aggregate; empty buckets are absent
    * (the consumer left-joins a spine if it wants zeros). */
  def histogram(df: DataFrame, value: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val v = col(value).cast("double")
    // the in-range quotient can round up to exactly `bins` for v just
    // below hi ((v-lo)*bins landing on the same double as (hi-lo)*bins —
    // the classic numpy-histogram edge); clamp so an in-domain value is
    // never reported in the >= hi overflow bucket. The oracle applies
    // the identical least().
    val bucket = when(v < lo, lit(-1L))
      .when(v >= hi, lit(bins.toLong))
      .otherwise(least(
        floor((v - lit(lo)) * lit(bins.toDouble) / lit(hi - lo)).cast("long"),
        lit(bins.toLong - 1L)))
    df.filter(v.isNotNull)
      .select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket").cast("double") * lit((hi - lo) / bins)).as("lo_edge"),
        (lit(lo) + (col("bucket") + 1L).cast("double") * lit((hi - lo) / bins)).as("hi_edge"),
        col("n"))
  }

  /** Per-group skewness and excess kurtosis via the textbook SHIFT trick:
    * values quantize to 1e-3 fixed point, a first pass takes each group's
    * MIN, a second accumulates the shifted powers `Σc^k, c = x − min ≥ 0`
    * in DECIMAL(38,0) — exact because shifting keeps `c` spread-sized
    * where raw `Σx⁴` would overflow any fixed width — and the shifted
    * mean `δ = Σc/n` recovers the central moments in one fixed IEEE
    * chain at the output edge:
    * `M2 = Σc²/n − δ²`, `M3 = Σc³/n − 3δ·Σc²/n + 2δ³`,
    * `M4 = Σc⁴/n − 4δ·Σc³/n + 6δ²·Σc²/n − 3δ⁴`;
    * `skew = M3/M2^1.5`, `kurt_excess = M4/M2² − 3` (NULL for constant
    * groups). The tail-shape panel [[profile]]'s min/max can't see —
    * heavy tails and asymmetry are what decide winsorize-vs-drop.
    * (Central moments are shift-invariant, so min-shift and mean-shift
    * give the same M_k — min needs no integer-division semantics to
    * match across engines.)
    *
    * Scale: two map-side-combined aggregations with a broadcast of the
    * |groups|-row min table between them — the fact table never
    * shuffles. Exactness bound: spread⁴·n must fit DECIMAL(38) — good
    * to ~10⁹ rows per group at a 10⁶-milli-unit spread; past that the
    * null-guard raises in-plan. */
  def moments(df: DataFrame, group: String = "event_type",
      value: String = "value"): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val q = df.select(col(group), floor(col(value) * lit(1000)).cast("long").as("x"))
    val mins = q.groupBy(col(group)).agg(min(col("x")).as("mn"))
    // per-ROW guard on the shift: c⁴ must fit DECIMAL(38,0), so c must
    // stay under floor((10³⁸−1)^¼) ≈ 3.162e9 milli-units of spread. In a
    // non-ANSI session an overflowing c⁴ is NULL per row and sum() skips
    // NULLs — the aggregated exact() guard below would never fire and the
    // moments would be silently understated — so the raise has to happen
    // before aggregation, on the row that overflows.
    val c4Bound = 3162277659L
    val cent = q.join(broadcast(mins), Seq(group))
      .withColumn("c",
        when(col("x") - col("mn") <= c4Bound, dec(col("x") - col("mn")))
          .otherwise(raise_error(lit(
            "moments: value spread exceeds the exact DECIMAL(38) c^4 bound (~3.2e9 milli-units)"))))
      .groupBy(col(group), col("mn"))
      .agg(count(lit(1)).as("n"),
        sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"),
        sum(col("c") * col("c") * col("c")).as("s3"),
        sum(col("c") * col("c") * col("c") * col("c")).as("s4"))
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"moments: $what exceeds the exact DECIMAL(38) bound")))
    val nD = col("n").cast("double")
    val d = exact(col("s1"), "sum(c)").cast("double") / nD
    val e2 = exact(col("s2"), "sum(c^2)").cast("double") / nD
    val e3 = exact(col("s3"), "sum(c^3)").cast("double") / nD
    val e4 = exact(col("s4"), "sum(c^4)").cast("double") / nD
    val m2 = e2 - d * d
    val m3 = e3 - lit(3.0) * d * e2 + lit(2.0) * d * d * d
    val m4 = e4 - lit(4.0) * d * e3 + lit(6.0) * d * d * e2 -
      lit(3.0) * d * d * d * d
    cent.select(col(group), col("n"),
      (col("mn").cast("double") + d).as("mean_milli"),
      m2.as("m2"),
      when(m2 > 0, m3 / sqrt(m2 * m2 * m2)).as("skew"),
      when(m2 > 0, m4 / (m2 * m2) - lit(3.0)).as("kurt_excess"))
  }

  /** Benford first-significant-digit audit (Benford 1938, the fraud/
    * data-fabrication screen): per group, the observed distribution of
    * leading digits of positive values. Natural multi-scale data follows
    * `log10(1+1/d)`; a uniform or spiked digit profile is the
    * tampered-/synthetic-data signal. The comparison to the expected curve
    * is the consumer's (it needs a log; the exact OBSERVED table is the
    * engine's deliverable and the hash gate).
    *
    * Exactness: values quantize to 1e-6 fixed point (`floor(v·1e6)`, the
    * engine-standard idiom), the leading digit is the first character of
    * the INTEGER's decimal rendering — no float log10 anywhere — and the
    * fraction is one division of exact counts at the output edge.
    * Scale: one map-side-combined aggregate onto ≤ 9·|groups| rows; the
    * share window runs over ≤ 9-row groups. */
  def benford(df: DataFrame, value: String = "value",
      group: String = "event_type"): DataFrame = {
    val m = floor(col(value) * lit(1000000.0)).cast("long")
    df.filter(col(value) > 0)
      .select(col(group), m.as("m"))
      .filter(col("m") >= 1) // sub-1e-6 positives have no leading digit
      .select(col(group),
        substring(col("m").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col(group), col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("frac", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col(group))).cast("double"))
  }

  /** k-anonymity audit (Sweeney 2002): group by the quasi-identifier
    * columns and flag every equivalence class smaller than `k` — the rows
    * a release must suppress or generalize before the table stops
    * re-identifying individuals. The governance gate a training-data
    * pipeline runs before publishing metadata-joined corpora.
    *
    * Output: one row per equivalence class with its size and the
    * `suppressed` verdict; the caller either anti-joins the flagged
    * classes away (suppression) or coarsens the quasi-identifiers and
    * re-audits (generalization). One map-side-combined aggregation on the
    * quasi key — the same cost as any groupBy-count at 100 TB; nothing
    * driver-sized. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity: no quasi-identifier columns")
    require(k >= 2, s"kAnonymity: k must be >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("suppressed", (col("n") < k).cast("long"))
  }
  /** Distinct l-diversity audit (Machanavajjhala et al. 2007,
    * "l-Diversity: privacy beyond k-anonymity"): k-anonymity only bounds
    * CLASS SIZE — a class of 10,000 rows that all share one sensitive
    * value still discloses it; this audit counts, per quasi-identifier
    * equivalence class, how many DISTINCT sensitive values appear
    * (`n_sensitive`) and the largest single value's frequency
    * (`top_sensitive`, the recursive-(c,l) ingredient), flagging classes
    * below `l`. Run next to [[kAnonymity]] before any metadata release.
    *
    * Scale: two map-side-combined keyed aggregations — (quasi, sensitive)
    * then quasi — nothing driver-sized, nothing row-sorted. */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: Column,
      l: Long): DataFrame = {
    require(quasi.nonEmpty, "lDiversity: no quasi-identifier columns")
    require(l >= 2, s"lDiversity: l must be >= 2, got $l")
    val q = quasi.map(col)
    df.groupBy(q :+ sensitive.as("s"): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy(q: _*)
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_sensitive"),
        max(col("c")).as("top_sensitive"))
      .withColumn("violating", (col("n_sensitive") < l).cast("long"))
  }

  /** Banded t-closeness audit (Li, Li & Venkatasubramanian 2007,
    * "t-Closeness: privacy beyond k-anonymity and l-diversity") for an
    * ORDERED sensitive attribute: the earth-mover's distance between each
    * quasi-identifier class's sensitive-value distribution and the global
    * one — l-diversity misses skew (a class that is 99% one disease and
    * 1% another is "2-diverse" yet disclosive); EMD reads the whole
    * distribution. For ordered values with unit ground distance,
    * `EMD = Σᵢ |Σ_{j≤i}(p_j − q_j)| / (m−1)`.
    *
    * Exactness: the cumulative difference is kept in the INTEGER
    * cross-multiplied form `Σ|cum(c·N − g·n)|` (DECIMAL(38,0), guarded),
    * and `emd = num / (n·N·(m−1))` is ONE double division — identical on
    * any engine. NULL when the global support is a single band (m = 1 —
    * EMD undefined).
    *
    * Scale: the caller bands the sensitive attribute (`sensitive` is an
    * already-banded column — the [[graft.operators.RobustStats.kendallTau]]
    * banding discipline), so the (class × band) dense grid this builds is
    * bounded by |classes|·|bands|, independent of row count: one
    * (quasi, band) aggregation over the data, then every derived table —
    * class totals, band totals (full-frame window for N and m), the dense
    * cross join (broadcast, never cartesian-planned), the per-class
    * cumulative — is metadata-sized, and all three reads of the histogram
    * ride one reused exchange. */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: Column,
      t: Double): DataFrame = {
    require(quasi.nonEmpty, "tCloseness: no quasi-identifier columns")
    require(t > 0 && t < 1, s"tCloseness: t must be in (0,1), got $t")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"tCloseness: $what exceeds the exact DECIMAL(38) bound")))
    val q = quasi.map(col)
    // the histogram is the ONLY data-sized pass; localCheckpoint pins the
    // bounded (class x band) table so its three consumers (class totals,
    // band totals, the grid's left join) read one materialization instead
    // of re-running the corpus aggregation per branch — column pruning
    // gives each branch a differently-pruned scan, so exchange reuse
    // cannot collapse them (the globalRank pinning discipline)
    val h = df.groupBy(q :+ sensitive.as("v"): _*)
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val classes = h.groupBy(q: _*).agg(sum(col("c")).as("n"))
    val full = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bands = h.groupBy(col("v")).agg(sum(col("c")).as("g"))
      .withColumn("big_n", sum(col("g")).over(full))
      .withColumn("m", count(lit(1)).over(full))
    val grid = classes.crossJoin(broadcast(bands))
      .join(h, quasi :+ "v", "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val cum = Window.partitionBy(q: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val num = grid
      .withColumn("cd", sum(dec(col("c")) * dec(col("big_n"))
        - dec(col("g")) * dec(col("n"))).over(cum))
      .groupBy(q :+ col("n") :+ col("big_n") :+ col("m"): _*)
      .agg(sum(abs(col("cd"))).as("emd_num"))
    val den = dec(col("n")) * dec(col("big_n")) * dec(col("m") - 1L)
    num.select(q :+ col("n") :+ col("m") :+
      when(col("m") > 1 && col("n") > 0,
        exact(col("emd_num"), "sum |cum|").cast("double")
          / den.cast("double")).as("emd"): _*)
      .withColumn("violating",
        (col("emd") > t).cast("long"))
  }
}
