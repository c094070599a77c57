package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metric aggregation — the reference's VolumeLogger / StreamMetrics
  * surface (A7-A9): fixed-interval windowed counts, hierarchical time
  * rollups, and EWMA smoothing (`throttledAvg(avg,x) = 0.8*avg + 0.2*x`,
  * `src/StreamMetrics.ts:7-9`).
  *
  * Batch shape: two shuffles total — one to the finest window, one to the
  * stream-part — regardless of input size; the EWMA fold runs on the
  * per-group minute series (bounded by time range, not data volume).
  */
object Metrics {

  /** Integer minute index of the `minute` column — the ONE derivation the
    * gap-fill, anomaly, and trend passes all key their arithmetic on (a
    * unit change here must move all three together or their oracles
    * disagree on the index). */
  private def minuteIdx: Column =
    (unix_micros(col("minute").cast("timestamp")) / lit(60000000L))
      .cast("long")

  /** Per-(stream-part, second) message counts and byte totals — the finest
    * level of the reference's sec→min→hour→day metric cascade
    * (`StreamMetrics.ts:55-77` runs one StreamMetrics per level, each
    * feeding the next). */
  def secondCounts(streamData: DataFrame): DataFrame =
    streamData
      .groupBy(col("stream_id"), col("stream_partition"),
        date_trunc("second", col("ts")).cast("timestamp_ntz").as("second"))
      .agg(count(lit(1)).as("msgs"), sum(octet_length(col("payload"))).as("bytes"))

  /** Per-(stream-part, minute) message counts and byte totals — the
    * windowed metric base (A7; `VolumeLogger.ts:167-291`). Cascades from
    * [[secondCounts]] like the reference's level chain: each level
    * aggregates the previous level's reports, so at scale the coarser
    * levels aggregate pre-reduced rows, never the raw firehose (partial
    * map-side aggregation makes the extra level nearly free — the
    * second-level shuffle already reduced the data to one row per active
    * second). */
  def minuteCounts(streamData: DataFrame): DataFrame =
    secondCounts(streamData)
      .groupBy(col("stream_id"), col("stream_partition"),
        date_trunc("minute", col("second")).cast("timestamp_ntz").as("minute"))
      .agg(sum(col("msgs")).as("msgs"), sum(col("bytes")).as("bytes"))

  /** Dense per-minute series: [[minuteCounts]] left-joined onto each
    * stream-part's full minute spine (min..max active minute), missing
    * minutes zero-filled — the densification every fixed-cadence consumer
    * (EWMA smoothing, rate alerting, charting) needs, since an idle
    * minute is a 0-rate report, not an absent one (the reference's
    * VolumeLogger emits on a timer, so its series is dense by
    * construction; a scan-derived series must densify explicitly).
    *
    * Scale: the spine generates from one (min, max) row per stream-part —
    * `sequence()` explodes per group WITHOUT a driver loop or a global
    * range table, and the join is key-partitioned on the same (stream,
    * part, minute) key the counts aggregate already produced. Spine
    * cardinality is bounded by wall-clock coverage (minutes/day × parts),
    * independent of message volume. */
  def denseMinuteCounts(streamData: DataFrame): DataFrame = {
    val mc = minuteCounts(streamData)
    val spine = mc
      .groupBy(col("stream_id"), col("stream_partition"))
      .agg(min(col("minute")).as("lo"), max(col("minute")).as("hi"))
      .select(col("stream_id"), col("stream_partition"),
        explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 MINUTE"))).as("minute"))
    spine.join(mc, Seq("stream_id", "stream_partition", "minute"), "left")
      .select(col("stream_id"), col("stream_partition"), col("minute"),
        coalesce(col("msgs"), lit(0L)).as("msgs"),
        coalesce(col("bytes"), lit(0L)).as("bytes"))
  }

  /** Gap-filled per-minute series with LINEAR interpolation: like
    * [[denseMinuteCounts]] each stream-part's minute spine is completed,
    * but an idle minute inside a gap reports the straight-line
    * interpolation between its surrounding active minutes instead of
    * zero — the fill a downstream trend/forecast consumer wants when a
    * silent minute means "sensor didn't report", not "rate was zero"
    * (the zero-fill is for counters, this is for gauges). `filled` marks
    * synthesized rows so consumers can tell measurements from estimates.
    *
    * Interpolation is exact integer arithmetic: for a gap of `g` minutes,
    * minute `i` reports `(prev·(g−i) + next·i) div g` — the floor of the
    * true linear value, identical on every engine, no float rounding to
    * drift across implementations.
    *
    * Scale: one keyed window pass for each row's successor (the same
    * (stream, part) shuffle the counts already produced), then a per-row
    * `sequence()` explode bounded by the gap length — spine cardinality
    * is wall-clock-bounded exactly as in [[denseMinuteCounts]], and no
    * global spine table or driver loop exists. */
  def interpolatedMinuteCounts(streamData: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("stream_id"), col("stream_partition"))
      .orderBy(col("minute"))
    val nx = minuteCounts(streamData)
      .withColumn("idx", minuteIdx)
      .withColumn("msgs", col("msgs").cast("long"))
      .withColumn("nidx", lead(col("idx"), 1).over(w))
      .withColumn("nmsgs", lead(col("msgs"), 1).over(w))
    nx.select(col("stream_id"), col("stream_partition"), col("minute"),
        col("msgs"), col("idx"), col("nidx"), col("nmsgs"),
        explode(sequence(lit(0L),
          coalesce(col("nidx") - col("idx"), lit(1L)) - lit(1L))).as("i"))
      .select(col("stream_id"), col("stream_partition"),
        expr("timestampadd(MINUTE, CAST(i AS INT), minute)").as("minute"),
        when(col("i") === 0L, col("msgs"))
          .otherwise(expr(
            "(msgs * (nidx - idx - i) + nmsgs * i) div (nidx - idx)"))
          .as("msgs"),
        (col("i") > 0L).as("filled"))
  }

  /** Rolling z-score anomaly flags over the (conceptually dense,
    * [[denseMinuteCounts]]) minute series — the rate-alerting pass: each
    * ACTIVE minute is scored against the mean/stddev of the `lookback`
    * dense minutes strictly before it (the current row excluded, so a
    * spike can't mask itself), and flagged when it exceeds mean +
    * `k`·stddev. One row per active minute; idle minutes are part of
    * every trailing window's statistics but can never themselves flag
    * (0 > mean + k·σ ≥ 0 is impossible), so they are omitted from the
    * output by construction, not approximation.
    *
    * That observation is also the scale path: the dense series is never
    * materialized. A RANGE frame over each part's SPARSE minute rows
    * (keyed by integer minute index) yields the identical trailing sums —
    * idle minutes contribute zero — and the dense trailing-row count is
    * pure arithmetic, `min(lookback, idx − first_idx)`. Cost is one
    * window pass over O(active minutes), independent of wall-clock span,
    * where the naive dense formulation pays O(span × parts) (measured
    * 4×+ on the bench corpus, arbitrarily worse on sparse streams).
    *
    * Determinism: counts are integers, so the window sums are exact
    * longs; variance `(n·Σx² − (Σx)²) / n²` and the sqrt are single
    * correctly-rounded IEEE steps replayed in the same order by the
    * oracle. Warm-up minutes (fewer than `minHistory` dense
    * predecessors) are reported unflagged rather than dropped. */
  def anomalyFlags(streamData: DataFrame, lookback: Int = 60, k: Double = 3.0,
      minHistory: Int = 10): DataFrame = {
    require(lookback > 1 && minHistory >= 2, "need lookback > 1, minHistory >= 2")
    import org.apache.spark.sql.expressions.Window
    val part = Seq(col("stream_id"), col("stream_partition"))
    val w = Window.partitionBy(part: _*).orderBy(col("idx"))
      .rangeBetween(-lookback, -1)
    val wAll = Window.partitionBy(part: _*)
    minuteCounts(streamData)
      .withColumn("idx", minuteIdx)
      .withColumn("n",
        least(lit(lookback.toLong), col("idx") - min(col("idx")).over(wAll)))
      .withColumn("s", coalesce(sum(col("msgs")).over(w), lit(0L)))
      .withColumn("s2", coalesce(sum(col("msgs") * col("msgs")).over(w), lit(0L)))
      .withColumn("mean",
        when(col("n") > 0, col("s").cast("double") / col("n").cast("double")))
      .withColumn("variance",
        when(col("n") > 0,
          (col("n") * col("s2") - col("s") * col("s")).cast("double") /
            (col("n") * col("n")).cast("double")))
      .withColumn("is_anomaly",
        col("n") >= minHistory &&
          col("msgs").cast("double") >
            col("mean") + lit(k) * sqrt(col("variance")))
      .select(col("stream_id"), col("stream_partition"), col("minute"),
        col("msgs"), col("mean"), col("variance"), col("is_anomaly"))
  }

  /** Per-stream-part least-squares rate trend over the active-minute
    * series: slope/intercept of msgs-per-minute against the minute index,
    * the drift detector behind capacity planning ("is this partition's
    * rate growing?") — a one-pass GROUP BY, not a model fit.
    *
    * Determinism: x is the minute index RELATIVE to each part's first
    * active minute (keeps products small), y the integer count; all five
    * sufficient statistics (n, Σx, Σy, Σxy, Σx²) are summed as exact
    * DECIMAL(38,0) (Σx² alone wraps int64 past ~3e6 active minutes), and
    * slope/intercept derive from them in one fixed IEEE expression each —
    * the same exact-int-then-double discipline as the anomaly variance.
    * Single-minute parts report NULL (zero variance in x).
    *
    * Exactness bound: every intermediate (n·Σx², Σx·Σx, n·Σxy, Σx·Σy) is
    * exact up to 10^38 — n·Σx² ≈ n⁴/3 stays inside that through ~2e9
    * active minutes (~3,800 years per part), and n·Σxy through per-minute
    * rates of ~10^10 at that span. Past the bound Spark's non-ANSI
    * DECIMAL overflow yields NULL, which the in-plan guard converts into
    * a loud `raise_error` instead of a silent wrong slope (same
    * fail-loudly discipline as [[graft.text.TextAnalysis.bm25TopK]]'s
    * idf guard and HITS's DECIMAL(38) normalization).
    *
    * Scale: sums are map-side combined on the same (stream, part) key the
    * minute counts already shuffled on; nothing global, output is one row
    * per part. */
  def rateTrend(streamData: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Window.partitionBy(col("stream_id"), col("stream_partition"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val stats = minuteCounts(streamData)
      .withColumn("idx", minuteIdx)
      .withColumn("x", dec(col("idx") - min(col("idx")).over(part)))
      .withColumn("y", dec(col("msgs")))
      .groupBy(col("stream_id"), col("stream_partition"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"rateTrend: $what exceeds the exact DECIMAL(38) bound " +
          "(minute span/rate out of supported range)")))
    val den = exact(dec(col("n")) * col("sxx") - col("sx") * col("sx"),
      "n*sxx - sx*sx")
    val num = exact(dec(col("n")) * col("sxy") - col("sx") * col("sy"),
      "n*sxy - sx*sy")
    val slope = num.cast("double") / den.cast("double")
    stats.select(col("stream_id"), col("stream_partition"), col("n"),
      when(den > 0, slope).as("slope"),
      when(den > 0,
        (col("sy").cast("double") - slope * col("sx").cast("double"))
          / col("n").cast("double")).as("intercept"))
  }

  /** Pearson correlation between every pair of streams' per-minute rates
    * (partitions summed, pairs matched on common active minutes) — the
    * cross-stream dependence monitor ("do error spikes track click
    * spikes?"). Same exact-DECIMAL(38,0) sufficient statistics as
    * [[rateTrend]] (n, Σx, Σy, Σxy, Σx², Σy²), correlation derived in one
    * fixed IEEE expression; constant series report NULL. As in
    * [[rateTrend]], every intermediate is exact to 10^38 — good through
    * ~2e9 common minutes at per-minute stream rates up to ~10^10 — and
    * overflow past that raises loudly in-plan instead of wrapping.
    *
    * Scale: the self-join matches on the minute key — per-minute fan-out
    * is |streams|², a metadata-sized constant, never data-sized; sums are
    * map-side combined per (a, b) pair. */
  /** Lag-k autocorrelation of each stream-part's per-minute rate — the
    * self-similarity scan that detects periodic load (a strong lag-60
    * autocorrelation = hourly cycle) before capacity planning trusts a
    * linear [[rateTrend]]. Runs over the DENSE series
    * ([[denseMinuteCounts]]): idle minutes are real zeros to a cycle
    * detector, and skipping them would splice unrelated epochs together.
    *
    * Same exact-DECIMAL(38,0) sufficient statistics and single fixed IEEE
    * expression as [[crossStreamCorrelation]]; constant series report
    * NULL. The lag pairing is one `lead()` over the (stream, part) keyed
    * window the dense series already produced — no self-join, no second
    * shuffle. */
  def autocorrelation(streamData: DataFrame, lag: Int = 60): DataFrame =
    autocorrelationOfDense(denseMinuteCounts(streamData), lag)

  /** [[autocorrelation]] over a PRE-densified minute series (the
    * [[denseMinuteCounts]] schema). The four dense-series consumers
    * (autocorrelation, decompose, rollingMedian, cusum) each need the
    * same 1.7M-row-at-sf0.1 dense rebuild; at scale the series is
    * materialized ONCE (pay-once, like a bucketed layout) and every
    * consumer takes this entry point — rebuilding it per consumer
    * re-pays the scan+shuffle N times for bit-identical input. */
  def autocorrelationOfDense(dense: DataFrame, lag: Int = 60): DataFrame = {
    require(lag >= 1, s"autocorrelation lag must be >= 1, got $lag")
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val w = Window.partitionBy(col("stream_id"), col("stream_partition"))
      .orderBy(col("minute"))
    val pairs = dense
      .select(col("stream_id"), col("stream_partition"), col("minute"),
        col("msgs"))
      .withColumn("y", lead(col("msgs"), lag).over(w))
      .filter(col("y").isNotNull)
      .select(col("stream_id"), col("stream_partition"),
        dec(col("msgs")).as("x"), dec(col("y")).as("y"))
    val stats = pairs.groupBy(col("stream_id"), col("stream_partition"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"autocorrelation: $what exceeds the exact DECIMAL(38) bound")))
    val denx = exact(dec(col("n")) * col("sxx") - col("sx") * col("sx"),
      "n*sxx - sx*sx")
    val deny = exact(dec(col("n")) * col("syy") - col("sy") * col("sy"),
      "n*syy - sy*sy")
    val num = exact(dec(col("n")) * col("sxy") - col("sx") * col("sy"),
      "n*sxy - sx*sy")
    stats.select(col("stream_id"), col("stream_partition"),
      lit(lag.toLong).as("lag"), col("n"),
      when(denx > 0 && deny > 0,
        num.cast("double") /
          (sqrt(denx.cast("double")) * sqrt(deny.cast("double")))).as("corr"))
  }

  /** Additive seasonal-trend decomposition of the dense per-minute rate
    * (the classical-decomposition core of STL, Cleveland et al. 1990,
    * without the robustness loops): `x = trend + seasonal + residual`
    * where trend is the centered `2·halfWindow+1`-minute moving mean,
    * seasonal the per-(part, minute-of-day) mean of the detrended
    * series, and residual the remainder — the load-shape separation a
    * capacity planner wants before alerting on "unusual for 3am".
    *
    * Exactness: edge minutes without a full window are DROPPED (the
    * standard classical-decomposition edge rule), so the window count is
    * the constant `span` and the detrended value `span·x − Σwindow` is an
    * exact integer; every output double is a single division of exact
    * integers (no float ever sums across rows, so no engine-dependent
    * accumulation order exists).
    *
    * Scale: two window passes — the centered frame over the existing
    * (part, minute) sort, then a (part, minute-of-day) keyed window —
    * both O(1) state per row; nothing driver-sized. */
  def decompose(streamData: DataFrame, halfWindow: Int = 30): DataFrame =
    decomposeOfDense(denseMinuteCounts(streamData), halfWindow)

  /** [[decompose]] over a pre-densified series — see
    * [[autocorrelationOfDense]] for the pay-once rationale. */
  def decomposeOfDense(dense: DataFrame, halfWindow: Int = 30): DataFrame = {
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    import org.apache.spark.sql.expressions.Window
    val span = 2 * halfWindow + 1
    val frame = Window.partitionBy(col("stream_id"), col("stream_partition"))
      .orderBy(col("minute"))
      .rowsBetween(-halfWindow.toLong, halfWindow.toLong)
    val interior = dense
      .select(col("stream_id"), col("stream_partition"), col("minute"),
        col("msgs"))
      .withColumn("w_sum", sum(col("msgs")).over(frame))
      .withColumn("w_cnt", count(lit(1)).over(frame))
      .filter(col("w_cnt") === span.toLong)
      .withColumn("detr", lit(span.toLong) * col("msgs") - col("w_sum"))
      .withColumn("mod_min", pmod(minuteIdx, lit(1440L)))
    val seas = Window.partitionBy(col("stream_id"), col("stream_partition"),
      col("mod_min"))
    val trendC = col("w_sum").cast("double") / lit(span.toDouble)
    val seasC = col("s_sum").cast("double") /
      (lit(span.toLong) * col("s_cnt")).cast("double")
    interior
      .withColumn("s_sum", sum(col("detr")).over(seas))
      .withColumn("s_cnt", count(lit(1)).over(seas))
      .select(col("stream_id"), col("stream_partition"), col("minute"),
        col("msgs"), trendC.as("trend"), seasC.as("seasonal"),
        (col("msgs").cast("double") - trendC - seasC).as("residual"))
  }

  /** Exact sliding-window median of the dense per-minute rate — the
    * robust smoother that ignores a spike the mean-based EWMA chases
    * ([[ewmaRates]]): the despiked baseline for display and alerting.
    *
    * `percentile` as a WINDOW aggregate over a `window`-row trailing
    * frame — exact linear-interpolation median, hash-proven equivalent
    * to DuckDB's `quantile_cont` by q_percentiles/q_mad. Warm-up rows
    * report the median of however many minutes exist (`n_window` says
    * how many). Scale: the frame is a constant-size buffer per row over
    * the one (stream, part) keyed sort the dense series already
    * produced — no self-join, state O(window). */
  def rollingMedian(streamData: DataFrame, window: Int = 15): DataFrame =
    rollingMedianOfDense(denseMinuteCounts(streamData), window)

  /** [[rollingMedian]] over a pre-densified series — see
    * [[autocorrelationOfDense]] for the pay-once rationale. */
  def rollingMedianOfDense(dense: DataFrame, window: Int = 15): DataFrame = {
    require(window >= 1, s"rollingMedian window must be >= 1, got $window")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("stream_id"), col("stream_partition"))
      .orderBy(col("minute"))
      .rowsBetween(-(window - 1).toLong, Window.currentRow)
    dense
      .select(col("stream_id"), col("stream_partition"), col("minute"),
        col("msgs"))
      .withColumn("median_rate", percentile(col("msgs"), lit(0.5)).over(w))
      .withColumn("n_window", count(lit(1)).over(w))
  }

  /** CUSUM change-point detection (Page 1954) over each stream-part's
    * dense per-minute rate: the classic recursions
    * `s⁺_t = max(0, s⁺_{t-1} + d_t)` / `s⁻_t = max(0, s⁻_{t-1} − d_t)`
    * with `d_t = n·x_t − S` (deviation from the part's mean, scaled by
    * `n` so everything stays integer: `mean = S/n` never materializes as
    * a float). A sustained rate shift accumulates where the z-score
    * alarm ([[anomalyFlags]]) only sees single-minute spikes.
    *
    * The max(0, ·) recursion is NOT a plain running sum — but it has the
    * exact prefix form `s⁺_t = c_t − min(0, min_{j≤t} c_j)` (and the
    * mirrored `s⁻_t = max(0, max_{j≤t} c_j) − c_t`) where `c` is the
    * plain cumulative sum of `d` — so the whole detector is two window
    * passes over the one (stream, part) keyed sort, no UDAF, no driver
    * fold, oracle-replayable verbatim. Alarms fire when a statistic
    * exceeds `n·tauMsgs` — τ is "accumulated excess messages", the
    * interpretable unit. Integer bound: |c_t| ≤ n·S — at month-scale
    * n ≈ 4·10⁴ minutes this holds to S ≈ 2·10¹⁴ messages per part,
    * far past any real stream-part; beyond that, widen to DECIMAL(38)
    * as rateTrend does. */
  def cusum(streamData: DataFrame, tauMsgs: Long = 50L): DataFrame =
    cusumOfDense(denseMinuteCounts(streamData), tauMsgs)

  /** [[cusum]] over a pre-densified series — see
    * [[autocorrelationOfDense]] for the pay-once rationale. */
  def cusumOfDense(dense: DataFrame, tauMsgs: Long = 50L): DataFrame = {
    require(tauMsgs >= 1, s"cusum tauMsgs must be >= 1, got $tauMsgs")
    import org.apache.spark.sql.expressions.Window
    val part = Window.partitionBy(col("stream_id"), col("stream_partition"))
    val byMin = part.orderBy(col("minute"))
    val prefix = byMin.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .select(col("stream_id"), col("stream_partition"), col("minute"),
        col("msgs"))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("s_total", sum(col("msgs")).over(part))
      .withColumn("d", col("n") * col("msgs") - col("s_total"))
      .withColumn("c", sum(col("d")).over(prefix))
      .withColumn("cusum_pos",
        col("c") - least(lit(0L), min(col("c")).over(prefix)))
      .withColumn("cusum_neg",
        greatest(lit(0L), max(col("c")).over(prefix)) - col("c"))
      .select(col("stream_id"), col("stream_partition"), col("minute"),
        col("msgs"), col("cusum_pos"), col("cusum_neg"),
        (col("cusum_pos") > col("n") * lit(tauMsgs)).cast("long").as("alarm_up"),
        (col("cusum_neg") > col("n") * lit(tauMsgs)).cast("long").as("alarm_down"))
  }

  def crossStreamCorrelation(streamData: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val sm = minuteCounts(streamData)
      .groupBy(col("stream_id"), col("minute"))
      .agg(sum(col("msgs")).as("msgs"))
    val pairs = sm.as("a").join(sm.as("b"),
        col("a.minute") === col("b.minute") &&
          col("a.stream_id") < col("b.stream_id"))
      .select(col("a.stream_id").as("stream_a"), col("b.stream_id").as("stream_b"),
        dec(col("a.msgs")).as("x"), dec(col("b.msgs")).as("y"))
    val stats = pairs.groupBy(col("stream_a"), col("stream_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    def exact(c: Column, what: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(lit(
        s"crossStreamCorrelation: $what exceeds the exact DECIMAL(38) " +
          "bound (minute span/rate out of supported range)")))
    val denx = exact(dec(col("n")) * col("sxx") - col("sx") * col("sx"),
      "n*sxx - sx*sx")
    val deny = exact(dec(col("n")) * col("syy") - col("sy") * col("sy"),
      "n*syy - sy*sy")
    val num = exact(dec(col("n")) * col("sxy") - col("sx") * col("sy"),
      "n*sxy - sx*sy")
    stats.select(col("stream_a"), col("stream_b"), col("n"),
      when(denx > 0 && deny > 0,
        num.cast("double") /
          (sqrt(denx.cast("double")) * sqrt(deny.cast("double")))).as("corr"))
  }

  /** Hierarchical rollup minute→hour (A8; `StreamMetrics.ts:55-77`): each
    * hour reports the sum, the plain average, AND the `throttledAvg`-
    * smoothed average of its minute reports — the reference smooths at
    * every cascade level as it aggregates the level below
    * (`StreamMetrics.ts:133-143`), so spiky minutes read differently in
    * `ewma_msgs_per_min` than in the plain mean. The smoothed fold runs on
    * the already-reduced per-minute rows (≤60 per hour group), so the
    * extra column costs a bounded collect_list per group, never a scan. */
  def hourlyRollup(streamData: DataFrame): DataFrame =
    minuteCounts(streamData)
      .groupBy(col("stream_id"), col("stream_partition"),
        date_trunc("hour", col("minute")).cast("timestamp_ntz").as("hour"))
      .agg(
        count(lit(1)).as("n_minutes"),
        sum(col("msgs")).as("msgs"),
        sum(col("bytes")).as("bytes"),
        (sum(col("msgs")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_msgs_per_min"),
        collect_list(struct(col("minute"), col("msgs"))).as("__series"))
      .withColumn("ewma_msgs_per_min",
        ewmaFold(transform(array_sort(col("__series")), s => s.getField("msgs"))))
      .drop("__series")

  /** Hierarchical rollup hour→day — the top of the cascade (A8;
    * `StreamMetrics.ts:55-77`): each day reports the sum of its hour
    * reports, the average message volume per active hour, and the
    * per-level EWMA over the ordered hour reports (`StreamMetrics.ts:
    * 133-143` — each level smooths the series the level below emits). */
  def dailyRollup(streamData: DataFrame): DataFrame =
    hourlyRollup(streamData)
      .groupBy(col("stream_id"), col("stream_partition"),
        date_trunc("day", col("hour")).cast("timestamp_ntz").as("day"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("n_minutes")).as("n_minutes"),
        sum(col("msgs")).as("msgs"),
        sum(col("bytes")).as("bytes"),
        (sum(col("msgs")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_msgs_per_hour"),
        collect_list(struct(col("hour"), col("msgs"))).as("__series"))
      .withColumn("ewma_msgs_per_hour",
        ewmaFold(transform(array_sort(col("__series")), s => s.getField("msgs"))))
      .drop("__series")

  /** EWMA fold over an ordered numeric series: seeded with the first
    * element, then `0.8*acc + 0.2*x` per step (`StreamMetrics.ts:7-9,
    * 133-143`). Deterministic double sequence ⇒ engine-independent. */
  def ewmaFold(sortedValues: Column): Column = {
    val rest = slice(sortedValues, lit(2), greatest(size(sortedValues) - 1, lit(0)))
    aggregate(rest, element_at(sortedValues, 1).cast("double"),
      (acc, x) => acc * lit(0.8) + x.cast("double") * lit(0.2))
  }

  /** Per-stream-part EWMA of the per-minute message rate (A9). The minute
    * series is collected per group (bounded by the time range), sorted, and
    * folded — `array_sort` on (minute, msgs) structs orders by minute since
    * minutes are unique within a group. */
  def ewmaRates(streamData: DataFrame): DataFrame =
    minuteCounts(streamData)
      .groupBy(col("stream_id"), col("stream_partition"))
      .agg(
        count(lit(1)).as("n_minutes"),
        collect_list(struct(col("minute"), col("msgs"))).as("series"))
      .select(
        col("stream_id"), col("stream_partition"), col("n_minutes"),
        ewmaFold(transform(array_sort(col("series")), s => s.getField("msgs")))
          .as("rate_ewma"))
}
