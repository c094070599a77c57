package graft

import org.apache.spark.sql.functions.timestamp_millis

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("melt: inverse of pivot — wide columns to long rows, Expand not join") {
    val s = spark
    import s.implicits._
    val wide = Seq(("a", 1L, 2L), ("b", 0L, 5L)).toDF("k", "x", "y")
    val df = Relational.melt(wide, Seq("k"), Seq("x", "y"), "variable", "value")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "melt must be a narrow Expand pass, no shuffle")
    val out = df.orderBy("k", "variable").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", "x", 1L), ("a", "y", 2L),
      ("b", "x", 0L), ("b", "y", 5L)))
  }

  test("shippingPriority: broadcasts dimensions, pushes filters, top-10") {
    val df = Relational.shippingPriority(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no sort-merge join expected at this scale")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || plan.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter must reach the scan")
    val rows = df.collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)), "descending revenue order")
  }

  test("localSupplierVolume: six-table star join stays broadcast-shaped") {
    val df = Relational.localSupplierVolume(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    val rows = df.collect()
    // nations of the chosen region only (<= 25 nations total)
    assert(rows.length <= 25)
  }

  test("customerOrderPresence: single-scan plan matches the semi/anti formulation") {
    val single = Relational.customerOrderPresence(spark, dir)
    // production shape: exactly one scan each of customer and orders
    val plan = single.queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").count(_ => true) - 1 <= 2,
      s"expected at most one scan per table, plan:\n$plan")
    val a = single.orderBy("c_nationkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val b = Relational.customerOrderPresenceSemiAnti(spark, dir)
      .orderBy("c_nationkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(a.nonEmpty && a.sameElements(b))
    // every customer is counted exactly once across the two columns
    val totalCustomers = a.map(t => t._2 + t._3).sum
    assert(totalCustomers == graft.sources.Tables.customer(spark, dir).count())
  }

  test("bucketedRevenueByPriority: layout is scratch-scoped and reused across calls") {
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-bkt-reuse").toString
    val first = Relational.bucketedRevenueByPriority(spark, dir, scratch)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    val tag = Integer.toHexString((scratch + ":" + 8).hashCode)
    val success = new java.io.File(
      s"$scratch/graft_bkt_orders_$tag/_SUCCESS")
    assert(success.exists(), "bucketed layout must land under the scratch dir")
    val mtime = success.lastModified()
    // second call against the same scratch must NOT rewrite the layout
    val second = Relational.bucketedRevenueByPriority(spark, dir, scratch)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(success.lastModified() == mtime,
      "repeat invocation rewrote the pay-once bucketed layout")
    assert(first.sameElements(second))
    // a DIFFERENT scratch dir gets its own catalog entries (no clobber)
    val scratch2 = java.nio.file.Files
      .createTempDirectory("graft-bkt-reuse2").toString
    val tag2 = Integer.toHexString((scratch2 + ":" + 8).hashCode)
    Relational.bucketedRevenueByPriority(spark, dir, scratch2).collect()
    assert(tag != tag2 &&
      new java.io.File(s"$scratch2/graft_bkt_orders_$tag2/_SUCCESS").exists())
    assert(success.lastModified() == mtime,
      "benching a second dir clobbered the first dir's layout")
  }

  test("topEventsPerType: at most k per group, rank starts at 1") {
    val rows = Relational.topEventsPerType(spark, dir, k = 3).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    assert(byType.nonEmpty)
    byType.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length).toSeq)
      val vals = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("value"))
      assert(vals.sameElements(vals.sortBy(-_)))
    }
  }

  test("funnelOf: strict ordering enforced, absent exact-levels don't break the chain") {
    val s = spark
    import s.implicits._
    // u1 completes view->click->purchase in order; u2 clicks BEFORE
    // viewing (the click must not count) and never advances; u3 views
    // only; u4's purchase precedes the click (stops at click)
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 50L), (2L, "view", 100L),
      (3L, "view", 10L),
      (4L, "view", 10L), (4L, "click", 20L), (4L, "purchase", 15L))
      .toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.funnelOf(spark, ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "view", 4L, 1.0),
      (2L, "click", 2L, 0.5),
      (3L, "purchase", 1L, 0.25)))
    // two-step funnel where EVERY viewer converts: level 1 is empty in
    // the per-level counts and must still report the full population
    val all = Seq((1L, "view", 10L), (1L, "click", 20L),
      (2L, "view", 30L), (2L, "click", 40L))
      .toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val g2 = Relational.funnelOf(spark, all, Seq("view", "click"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(g2.toSeq == Seq((1L, 2L, 1.0), (2L, 2L, 1.0)))
  }

  test("funnelOf maxGapMs: advance counts only within the window, boundary inclusive") {
    val s = spark
    import s.implicits._
    val hour = 3600000L
    // u1's click lands 2h after the view — outside a 1h window; u2's
    // click at +30min advances, and its purchase exactly AT the 1h
    // boundary from the click still counts (<=, not <)
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 2 * hour),
      (2L, "view", 0L), (2L, "click", hour / 2),
      (2L, "purchase", hour / 2 + hour))
      .toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.funnelOf(spark, ev, Seq("view", "click", "purchase"),
      maxGapMs = Some(hour))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    // unbounded semantics unchanged: u1 advances too
    val unb = Relational.funnelOf(spark, ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(unb.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 1L)))
  }

  test("transitionsOf: lag pairs per user, event_id breaks ts ties, p row-normalized") {
    val s = spark
    import s.implicits._
    // u1: A,B,A -> A>B, B>A; u2: B,B -> B>B; u3: C,D at the SAME ts —
    // event_id order decides C>D (not D>C)
    val ev = Seq(
      (1L, 1L, "A", 0L), (2L, 1L, "B", 1L), (3L, 1L, "A", 2L),
      (4L, 2L, "B", 0L), (5L, 2L, "B", 1L),
      (6L, 3L, "C", 7L), (7L, 3L, "D", 7L))
      .toDF("event_id", "user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.transitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", "B", 1L, 1.0), ("B", "A", 1L, 0.5), ("B", "B", 1L, 0.5),
      ("C", "D", 1L, 1.0)))
  }

  test("attributionOf: bookends before the FIRST conversion, ts-tie uses event_id") {
    val s = spark
    import s.implicits._
    // u1: view,click,purchase,view -> ft view / lt click (the post-
    // conversion view is ignored); u2: click,purchase,purchase -> both
    // bookends click (first purchase binds); u3: purchase only ->
    // excluded; u4: view at the SAME ts as the purchase but a smaller
    // event_id -> strictly-before by (ts, event_id), so it counts
    val ev = Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 1L), (3L, 1L, "purchase", 2L),
      (4L, 1L, "view", 3L),
      (5L, 2L, "click", 0L), (6L, 2L, "purchase", 1L), (7L, 2L, "purchase", 2L),
      (8L, 3L, "purchase", 0L),
      (10L, 4L, "view", 5L), (11L, 4L, "purchase", 5L))
      .toDF("event_id", "user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.attributionOf(ev, "purchase").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("click", 1L, 2L), ("view", 2L, 1L)))
  }

  test("rfmOf: fixed bands from integer day-distance and micro-unit sums") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    // "now" = max ts = u2's last event. u1: last 40 days before now (r=1),
    // 1 event (f=1), 3.5 units (m=1 — under the 5-unit band). u2: last at
    // now (r=4), 2 events (f=2), 150 units total (m=4).
    val ev = Seq(
      (1L, 0L, 3.5), (2L, 38 * day, 100.0), (2L, 40 * day, 50.0))
      .toDF("user_id", "ms", "value")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.rfmOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, 1L, 3500000L), (4L, 2L, 4L, 1L, 150000000L)))
    // band boundary: exactly 1 full day ago is still r=4 (floor-div days)
    val ev2 = Seq((1L, 0L, 10.0), (2L, day, 10.0))
      .toDF("user_id", "ms", "value")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val r2 = Relational.rfmOf(ev2).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(r2 == Seq((4L, 2L))) // both users land in r=4, one cell
  }

  test("funnelOf: a skipped intermediate step blocks advancement") {
    val s = spark
    import s.implicits._
    // u1 views then purchases WITHOUT ever clicking — a later-step event
    // after a stale lower-level timestamp must NOT vault the user to
    // purchase; u2 is the honest three-step control
    val ev = Seq(
      (1L, "view", 100L), (1L, "purchase", 300L),
      (2L, "view", 100L), (2L, "click", 200L), (2L, "purchase", 300L))
      .toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.funnelOf(spark, ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (3L, 1L)),
      s"view-only-then-purchase user must stop at view: $got")
  }

  test("cohortRetention: offsets non-negative, week-0 row equals cohort size upper bound") {
    val rows = Relational.cohortRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "offset must be >= 0 (cohort week is the min)")
    // every cohort has a week-0 row, and no later offset exceeds it
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byOff = rs.map(r => r._2 -> r._3).toMap
      assert(byOff.contains(0L))
      assert(rs.forall(_._3 <= byOff(0L)), "retention cannot exceed the cohort")
    }
  }

  test("winsorize: clamped into the group's [p05,p95] band, flag consistent") {
    import graft.operators.RobustStats
    val ev = graft.sources.Tables.events(spark, dir)
    val got = RobustStats.winsorize(ev).collect()
    assert(got.length == ev.count())
    // reference band per group, computed in-memory with the same linear
    // interpolation Spark's exact `percentile` uses:
    // pos = p*(n-1); (hi-pos)*s[floor] + (pos-lo)*s[ceil]
    def pct(s: Array[Double], p: Double): Double = {
      val pos = p * (s.length - 1)
      val (l, h) = (math.floor(pos), math.ceil(pos))
      if (l == h) s(l.toInt) else (h - pos) * s(l.toInt) + (pos - l) * s(h.toInt)
    }
    val band = ev.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .map { case (t, vs) =>
        val s = vs.map(_._2).sorted
        t -> (pct(s, 0.05), pct(s, 0.95))
      }
    got.foreach { r =>
      val (t, v, w, c) = (r.getAs[String]("event_type"), r.getAs[Double]("value"),
        r.getAs[Double]("winsorized"), r.getAs[Long]("clipped"))
      val (lo, hi) = band(t)
      assert(w == math.min(math.max(v, lo), hi),
        s"$t: value $v winsorized to $w, expected clamp into [$lo, $hi]")
      assert((c == 1L) == (v < lo || v > hi), s"clipped flag wrong for $v in [$lo, $hi]")
    }
    // clamp must actually fire on the tails for a 10%-trim band
    assert(got.exists(_.getAs[Long]("clipped") == 1L))
  }

  test("moments: min-shift central moments, hand-computed skew/kurtosis, constant = NULL") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 0.0), (2L, "a", 0.001), (3L, "a", 0.002),
      (4L, "a", 0.009), (5L, "b", 5.0), (6L, "b", 5.0))
      .toDF("event_id", "event_type", "value")
    val got = graft.operators.Profile.moments(df).orderBy("event_type").collect()
    val a = got(0)
    // x = [0,1,2,9] milli: d=3, m2=12.5, m3=45, m4=348.5 (hand-derived)
    assert(a.getAs[Long]("n") == 4L)
    assert(a.getAs[Double]("mean_milli") == 3.0)
    assert(a.getAs[Double]("m2") == 12.5)
    assert(a.getAs[Double]("skew") == 45.0 / math.sqrt(12.5 * 12.5 * 12.5))
    assert(a.getAs[Double]("kurt_excess") == 348.5 / (12.5 * 12.5) - 3.0)
    val b = got(1) // constant group: zero variance -> NULLs
    assert(b.getAs[Double]("m2") == 0.0)
    assert(b.isNullAt(b.fieldIndex("skew")) && b.isNullAt(b.fieldIndex("kurt_excess")))
  }

  test("benford: leading digit from fixed-point rendering, non-positives dropped") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 123.0), (2L, "a", 0.25), (3L, "a", 9.9),
      (4L, "a", -5.0), (5L, "a", 0.0000005), (6L, "b", 42.0))
      .toDF("event_id", "event_type", "value")
    val got = graft.operators.Profile.benford(df)
      .orderBy("event_type", "digit").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("digit"),
        r.getAs[Long]("n"), r.getAs[Double]("frac")))
    assert(got.toList == List(
      ("a", 1L, 1L, 1.0 / 3.0), ("a", 2L, 1L, 1.0 / 3.0), ("a", 9L, 1L, 1.0 / 3.0),
      ("b", 4L, 1L, 1.0)))
  }

  test("quantileNormalize: integer micro-quantiles, deterministic tie order, singleton = 0") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 20.0),
      (4L, "a", 30.0), (9L, "b", 7.0))
      .toDF("event_id", "event_type", "value")
    val got = graft.operators.RobustStats.quantileNormalize(df)
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("n"), r.getAs[Long]("norm_micro")))
    assert(got.toList == List(
      (1L, 1L, 4L, 0L), (2L, 2L, 4L, 333333L),
      (3L, 3L, 4L, 666666L), (4L, 4L, 4L, 1000000L),
      (9L, 1L, 1L, 0L)))
  }

  test("globalRank: bucket decomposition reproduces the single-sort rank exactly") {
    val s = spark
    import s.implicits._
    // 40 rows with heavy value ties (only 5 distinct v_micro) across 8
    // range buckets — tie runs MUST split across bucket boundaries for
    // the offset+row_number decomposition to be exercised, and event_id
    // must resolve them to the same total order a single sort would
    val rows = (1L to 40L).map(id => (id, ((id * 7) % 5).toDouble / 2.0))
    val df = rows.toDF("event_id", "value")
    val got = graft.operators.RobustStats.globalRank(df, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = rows
      .map { case (id, v) => (id, math.floor(v * 1000000).toLong) }
      .sortBy { case (id, vm) => (vm, id) }
      .zipWithIndex.map { case ((id, vm), i) => (id, vm, i + 1L) }
    assert(got.sortBy(_._3).toSeq == expected)
    // empty input keeps the schema with zero rows
    val empty = graft.operators.RobustStats.globalRank(
      df.filter($"event_id" < 0L), buckets = 4)
    assert(empty.columns.toSeq == Seq("event_id", "v_micro", "rnk"))
    assert(empty.count() == 0L)
  }

  test("scd2: change points only, half-open intervals, open row NULL-terminated") {
    val s = spark
    import s.implicits._
    val ev = Seq( // user 1: a, a (no change), b, a
      (1L, 1L, 1000L, "a"), (1L, 2L, 2000L, "a"),
      (1L, 3L, 3000L, "b"), (1L, 4L, 4000L, "a"),
      (2L, 5L, 9000L, "x")) // single-event user: one open row
      .toDF("user_id", "event_id", "tms", "event_type")
      .select($"user_id", $"event_id",
        timestamp_millis($"tms").as("ts"), $"event_type")
    val got = Relational.scd2(ev).orderBy("user_id", "version").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
        r.getAs[String]("attr"), r.getAs[Long]("valid_from"),
        if (r.isNullAt(r.fieldIndex("valid_to"))) -1L else r.getAs[Long]("valid_to")))
    assert(got.toList == List(
      (1L, 1L, "a", 1000L, 3000L),
      (1L, 2L, "b", 3000L, 4000L),
      (1L, 3L, "a", 4000L, -1L),
      (2L, 1L, "x", 9000L, -1L)))
  }

  test("kAnonymity: class sizes and the suppression verdict") {
    val s = spark
    import s.implicits._
    val df = Seq(("en", "a"), ("en", "a"), ("en", "a"), ("de", "b"))
      .toDF("lang", "source")
    val got = graft.operators.Profile.kAnonymity(df, Seq("lang", "source"), k = 2)
      .orderBy("lang", "source").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n"), r.getAs[Long]("suppressed")))
    assert(got.toList == List(("de", "b", 1L, 1L), ("en", "a", 3L, 0L)))
    intercept[IllegalArgumentException](
      graft.operators.Profile.kAnonymity(df, Seq.empty, 2))
  }

  test("seasonalProfile: per-hour exact sums, peak ties break to the earliest hour") {
    val s = spark
    import s.implicits._
    val hourMs = 3600000L
    val ev = Seq( // two events in hour 1, two in hour 3 — tie → peak hour 1
      (1L, 1 * hourMs, "click", 1.5), (2L, 1 * hourMs + 60000L, "click", 2.0),
      (3L, 3 * hourMs, "click", 0.25), (4L, 3 * hourMs + 60000L, "click", 0.25),
      (5L, 2 * hourMs, "view", 1.0))
      .toDF("event_id", "tms", "event_type", "value")
      .select($"event_id", timestamp_millis($"tms").as("ts"), $"event_type", $"value")
    val got = Relational.seasonalProfile(ev).orderBy("event_type", "hod").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hod"),
        r.getAs[Long]("n"), r.getAs[Long]("value_sum_micro"), r.getAs[Long]("is_peak")))
    assert(got.toList == List(
      ("click", 1L, 2L, 3500000L, 1L),
      ("click", 3L, 2L, 500000L, 0L),
      ("view", 2L, 1L, 1000000L, 1L)))
  }

  test("burstiness: Fano factor from hand-computed sufficient statistics") {
    val s = spark
    import s.implicits._
    val minMs = 60000L
    val ev = Seq( // type a: minute counts [1, 3]; type b: [2, 2]
      (1L, 0L, "a", 0.0),
      (2L, minMs, "a", 0.0), (3L, minMs + 1000L, "a", 0.0), (4L, minMs + 2000L, "a", 0.0),
      (5L, 0L, "b", 0.0), (6L, 1000L, "b", 0.0),
      (7L, minMs, "b", 0.0), (8L, minMs + 1000L, "b", 0.0))
      .toDF("event_id", "tms", "event_type", "value")
      .select($"event_id", timestamp_millis($"tms").as("ts"), $"event_type", $"value")
    val got = Relational.burstiness(ev).orderBy("event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_minutes"),
        r.getAs[Long]("n_events"), r.getAs[Double]("fano")))
    // a: (2*10 - 16) / (2*4) = 0.5 (bursty); b: (2*8 - 16) / 8 = 0 (regular)
    assert(got.toList == List(("a", 2L, 4L, 0.5), ("b", 2L, 4L, 0.0)))
  }

  test("theilSen: positional lower median of pairwise slopes, ties excluded, lastN bound") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    def ev(rows: (Long, Long, Long, Double)*) = // (user, event_id, t_sec, v)
      rows.toSeq.toDF("user_id", "event_id", "t_sec", "value")
        .withColumn("ts", timestamp_micros(col("t_sec") * 1000000L))
        .drop("t_sec")
    // user 1: slopes .001/.005/.009 per (num,den) micros — median (10000, 2e6)
    // user 2: 6 pairs incl. a three-way ratio tie broken on num — row 3 is (2000, 2e6)
    // user 3: both events share ts → zero pairs → absent
    val df = graft.operators.RobustStats.theilSen(ev(
      (1L, 1L, 0L, 0.0), (1L, 2L, 1L, 1.0), (1L, 3L, 2L, 10.0),
      (2L, 4L, 0L, 0.0), (2L, 5L, 1L, 1.0), (2L, 6L, 2L, 4.0), (2L, 7L, 3L, 3.0),
      (3L, 8L, 5L, 1.0), (3L, 9L, 5L, 2.0)))
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("slope_num"), r.getAs[Long]("slope_den")))
    assert(df.toList == List(
      (1L, 3L, 10000L, 2000000L),
      (2L, 6L, 2000L, 2000000L)))
    // lastN=2 keeps only the two most recent events: one pair, its own slope
    val capped = graft.operators.RobustStats.theilSen(ev(
      (9L, 1L, 0L, 100.0), (9L, 2L, 10L, 0.0), (9L, 3L, 11L, 1.0)), lastN = 2)
      .collect().map(r => (r.getAs[Long]("n_pairs"), r.getAs[Long]("slope_num"),
        r.getAs[Long]("slope_den")))
    assert(capped.toList == List((1L, 1000L, 1000000L)))
  }

  test("medianAbsDev: mad is non-negative and <= max deviation; hand case") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 100.0))
      .toDF("event_type", "event_id", "value")
    val r = graft.operators.RobustStats.medianAbsDev(df).collect().head
    // median 3; deviations {2,1,0,1,97} → median 1
    assert(r.getAs[Double]("median") == 3.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n") == 5L)
  }

  test("eventRollup: subtotal levels are consistent and scan the facts once") {
    val df = Relational.eventRollup(spark, dir)
    val rows = df.collect()
    val total = rows.filter(_.getAs[Long]("gid") == 3L)
    val byType = rows.filter(_.getAs[Long]("gid") == 1L)
    val leaves = rows.filter(_.getAs[Long]("gid") == 0L)
    assert(total.length == 1)
    // each level's n and value sum must re-add to the grand total exactly
    assert(byType.map(_.getAs[Long]("n")).sum == total.head.getAs[Long]("n"))
    assert(leaves.map(_.getAs[Long]("n")).sum == total.head.getAs[Long]("n"))
    assert(byType.map(_.getAs[Long]("value_sum_micro")).sum
      == total.head.getAs[Long]("value_sum_micro"))
    // AQE's toString prints the initial plan after the final one — count
    // scans in the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"rollup must expand grouping sets over ONE scan:\n$plan")
  }

  test("lineitemGroupingSets: exactly the requested sets, one scan, exact re-adds") {
    val df = Relational.lineitemGroupingSets(spark, dir)
    val rows = df.collect()
    // gid 0 = leaves (rf, ls); gid 2 = per-linestatus marginal (rf grouped
    // out); gid 3 = grand total. The rollup-only gid 1 (per-returnflag)
    // must NOT appear — that's what makes the sets non-hierarchical.
    val gids = rows.map(_.getAs[Long]("gid")).distinct.sorted
    assert(gids.toList == List(0L, 2L, 3L))
    val total = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(total.length == 1)
    val leaves = rows.filter(_.getAs[Long]("gid") == 0L)
    val byStatus = rows.filter(_.getAs[Long]("gid") == 2L)
    assert(leaves.map(_.getAs[Long]("n")).sum == total.head.getAs[Long]("n"))
    assert(byStatus.map(_.getAs[Long]("n")).sum == total.head.getAs[Long]("n"))
    // per-status rows carry a null returnflag, leaves carry both keys
    assert(byStatus.forall(r => r.isNullAt(r.fieldIndex("l_returnflag"))
      && !r.isNullAt(r.fieldIndex("l_linestatus"))))
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"grouping sets must expand over ONE scan:\n$plan")
  }

  test("hoppingAgg: each event lands in width/slide epoch-aligned windows") {
    val s = spark
    import s.implicits._
    // 12:03 -> windows starting 11:55 and 12:00; 12:07 -> 12:00 and 12:05
    val base = 1704067200000L // 2024-01-01T00:00:00Z, a 10-min boundary
    val ev = Seq(
      (1L, base + 3 * 60000L, "click", 2.5),
      (2L, base + 7 * 60000L, "click", 1.0))
      .toDF("event_id", "tms", "event_type", "value")
      .select($"event_id", timestamp_millis($"tms").cast("timestamp_ntz").as("ts"),
        $"event_type", $"value")
    val out = Relational.hoppingAgg(ev, widthMin = 10, slideMin = 5)
      .orderBy("win_start_ms").collect()
      .map(r => (r.getAs[Long]("win_start_ms"), r.getAs[Long]("n"),
        r.getAs[Long]("value_sum_micro")))
    assert(out.toSeq == Seq(
      (base - 5 * 60000L, 1L, 2500000L),       // 11:55 window: event 1 only
      (base, 2L, 3500000L),                    // 12:00 window: both
      (base + 5 * 60000L, 1L, 1000000L)))      // 12:05 window: event 2 only
    // total expanded mass = rows × (width/slide)
    assert(out.map(_._2).sum == 2 * 2)
  }

  test("twap: step-interpolated weights, last sample weightless, single sample absent") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 0L, "a", 1.0), (2L, 1000L, "a", 3.0), (3L, 3000L, "a", 99.0),
      (4L, 500L, "b", 7.0)) // single sample: no interval, no output row
      .toDF("event_id", "tms", "event_type", "value")
      .select($"event_id", timestamp_millis($"tms").cast("timestamp_ntz").as("ts"),
        $"event_type", $"value")
    val got = Relational.twap(ev).orderBy("event_type").collect()
    // a: v=1 for 1000ms then v=3 for 2000ms -> (1e6*1000 + 3e6*2000)/3000/1e6;
    //    the 99.0 endpoint has nothing to hold over and must not contribute
    assert(got.length == 1 && got(0).getString(0) == "a")
    val a = got(0)
    assert(a.getAs[Long]("n_intervals") == 2L && a.getAs[Long]("span_ms") == 3000L)
    assert(a.getAs[Double]("twap") == 7.0e9 / 3000.0 / 1000000.0)
  }

  test("pairItemsets: (user, day) baskets, unordered distinct pairs") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    // u1 day0 {a,b,c}; u1 day1 {a,b}; u2 day0 {a,b} (b seen twice in the
    // basket: distinct items, pair counted once)
    val ev = Seq(
      (1L, "a", 1000L), (1L, "b", 2000L), (1L, "c", 3000L),
      (1L, "a", day + 1000L), (1L, "b", day + 2000L),
      (2L, "a", 500L), (2L, "b", 600L), (2L, "b", 700L))
      .toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.pairItemsets(ev, topK = 10)
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b"), r.getAs[Long]("support")))
    assert(got.toSeq == Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("timeToConvert: first-to-first gaps, non-attributable users dropped") {
    val s = spark
    import s.implicits._
    val h = 3600000L
    val ev = Seq(
      (1L, "view", 1000L), (1L, "purchase", 1000L + h + h / 2), // 1.5h -> bucket 1
      (2L, "view", 1000L),                                      // never converts
      (3L, "purchase", 500L), (3L, "view", 1000L),              // converted first
      (4L, "view", 2000L), (4L, "purchase", 2000L))             // instant -> bucket 0
      .toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.timeToConvert(ev)
      .collect().map(r => (r.getAs[Long]("bucket_h"), r.getAs[Long]("n_users")))
    assert(got.toSeq == Seq((0L, 1L), (1L, 1L)))
  }

  test("psiDrift and ksDrift: hand-computed banded drift statistics") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    // period 1 (day 0): 4 values in band 0; period 2 (day 1): 1 in band
    // 0 and 3 in band 1 — a clean distribution shift
    val ev = (Seq.fill(4)(1.0).map((_, 1000L)) ++
      Seq((1.0, day + 1000L), (6.0, day + 2000L),
        (6.0, day + 3000L), (6.0, day + 4000L)))
      .toDF("value", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val psi = Relational.psiDrift(ev, splitDay = 1L)
      .orderBy("band").collect()
      .map(r => (r.getAs[Long]("band"), r.getAs[Long]("c1"),
        r.getAs[Long]("c2"), r.getAs[Long]("delta_num"),
        r.getAs[Long]("dbits"), r.getAs[Double]("psi_contrib")))
    // band0: delta=1*4-4*4=-12, dbits=bits(5)-bits(17)=2-4=-2 -> 24/16
    // band1: delta=3*4-0=12, dbits=bits(13)-bits(1)=3-0=3 -> 36/16
    assert(psi.toSeq == Seq(
      (0L, 4L, 1L, -12L, -2L, 1.5), (1L, 0L, 3L, 12L, 3L, 2.25)))
    val ks = Relational.ksDrift(ev, splitDay = 1L).collect()(0)
    // cumulative: band0 |4*4 - 1*4| = 12; band1 |16-16| = 0
    assert(ks.getAs[Long]("n1") == 4L && ks.getAs[Long]("n2") == 4L)
    assert(ks.getAs[Long]("d_num") == 12L && ks.getAs[Double]("d") == 0.75)
  }

  test("abTest: exact 2x2 cells and hand-computed chi2") {
    val s = spark
    import s.implicits._
    // v0 = users 0,2 (one converts); v1 = users 1,3 (both convert)
    val ev = Seq(
      (0L, "purchase"), (0L, "view"), (2L, "view"),
      (1L, "purchase"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    val r = Relational.abTest(ev).collect()(0)
    assert(r.getAs[Long]("users0") == 2L && r.getAs[Long]("conv0") == 1L)
    assert(r.getAs[Long]("users1") == 2L && r.getAs[Long]("conv1") == 2L)
    assert(r.getAs[Double]("rate0") == 0.5 && r.getAs[Double]("rate1") == 1.0)
    // a=1 b=1 c=2 d=0, diff=-2: chi2 = 4*4 / (2*2*3*1)
    assert(r.getAs[Double]("chi2") == (4.0 * -2.0 * -2.0) / (2.0 * 2.0 * 3.0 * 1.0))
  }

  test("seqPatterns: contiguous trigrams, support counts users once") {
    val s = spark
    import s.implicits._
    // u1: a b c d (abc, bcd); u2: a b c (abc); u3: a b (too short)
    val ev = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "c", 3L, 3L), (1L, "d", 4L, 4L),
      (2L, "a", 1L, 5L), (2L, "b", 2L, 6L), (2L, "c", 3L, 7L),
      (3L, "a", 1L, 8L), (3L, "b", 2L, 9L))
      .toDF("user_id", "event_type", "ms", "event_id")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val got = Relational.seqPatterns(ev, len = 3, topK = 10)
      .collect().map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
        r.getAs[String]("s3"), r.getAs[Long]("occurrences"),
        r.getAs[Long]("support")))
    assert(got.toSeq == Seq(("a", "b", "c", 2L, 2L), ("b", "c", "d", 1L, 1L)))
  }

  test("lagFeatures: exact micro-unit lags, rolling frame, and gaps") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 1000L, 1.5, 1L), (1L, 2000L, 2.25, 2L), (1L, 4000L, -1.0, 3L))
      .toDF("user_id", "ms", "value", "event_id")
      .withColumn("ts", timestamp_millis($"ms").cast("timestamp_ntz"))
      .drop("ms")
    val got = Relational.lagFeatures(ev).orderBy("event_id").collect()
    val r1 = got(0)
    assert(r1.isNullAt(r1.fieldIndex("lag1_micro")))
    assert(r1.isNullAt(r1.fieldIndex("delta_us")))
    assert(r1.getAs[Long]("roll_sum_micro") == 1500000L
      && r1.getAs[Long]("roll_cnt") == 1L)
    val r3 = got(2)
    assert(r3.getAs[Long]("v_micro") == -1000000L)
    assert(r3.getAs[Long]("lag1_micro") == 2250000L
      && r3.getAs[Long]("lag2_micro") == 1500000L)
    assert(r3.getAs[Long]("roll_sum_micro") == 2750000L
      && r3.getAs[Long]("roll_cnt") == 3L)
    assert(r3.getAs[Long]("delta_us") == 2000000L)
    assert(r3.getAs[Double]("roll_mean_micro") == 2750000.0 / 3.0)
  }

  test("mannWhitneyDrift: hand-computed U with tie-averaged ranks and tie-corrected z") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val s = spark
    import s.implicits._
    // type a: period1 {1,2}, period2 {2,3} — combined avg ranks
    // 1->1, 2->2.5 (tie), 3->4; R1 = 3.5, U1 = 0.5, U2 = 3.5,
    // tie term 2^3-2 = 6, z = -sqrt(1.5)
    // type b: all four values tied -> sigma 0 -> z NULL
    val ev = Seq(
      ("a", "2024-01-10 00:00:00", 1.0), ("a", "2024-01-10 01:00:00", 2.0),
      ("a", "2024-01-20 00:00:00", 2.0), ("a", "2024-01-20 01:00:00", 3.0),
      ("b", "2024-01-10 00:00:00", 7.0), ("b", "2024-01-10 01:00:00", 7.0),
      ("b", "2024-01-20 00:00:00", 7.0), ("b", "2024-01-20 01:00:00", 7.0))
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = graft.operators.RobustStats.mannWhitneyDrift(ev)
      .orderBy("event_type").collect()
    val a = got(0)
    assert(a.getAs[Long]("n1") == 2L && a.getAs[Long]("n2") == 2L)
    assert(a.getAs[Double]("u1_2x") == 1.0 && a.getAs[Double]("u2_2x") == 7.0)
    assert(a.getAs[Double]("tie_cubes") == 6.0)
    assert(math.abs(a.getAs[Double]("z") - (-math.sqrt(1.5))) < 1e-12)
    val b = got(1)
    assert(b.getAs[Double]("u1_2x") == 4.0 && b.getAs[Double]("u2_2x") == 4.0,
      "all-tied U must sit at n1*n2/2")
    assert(b.isNullAt(b.fieldIndex("z")), "sigma=0 must yield NULL z")
  }

  test("spearmanTrend: monotone day/value gives rho ±1, ties averaged, constant NULL") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val s = spark
    import s.implicits._
    val ev = Seq(
      // up: strictly increasing by day -> rho = 1.0 exactly
      ("up", "2024-01-01 00:00:00", 10.0), ("up", "2024-01-02 00:00:00", 20.0),
      ("up", "2024-01-03 00:00:00", 30.0),
      // down: strictly decreasing -> rho = -1.0
      ("down", "2024-01-01 00:00:00", 9.0), ("down", "2024-01-02 00:00:00", 5.0),
      ("down", "2024-01-03 00:00:00", 1.0),
      // flat: constant value -> zero variance -> NULL
      ("flat", "2024-01-01 00:00:00", 4.0), ("flat", "2024-01-02 00:00:00", 4.0))
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = graft.operators.RobustStats.spearmanTrend(ev)
      .collect().map(r => r.getAs[String]("event_type") ->
        (if (r.isNullAt(r.fieldIndex("rho"))) None
         else Some(r.getAs[Double]("rho")))).toMap
    // sqrt(d)*sqrt(d) reproduces d only to the ulp, so rho lands within
    // an ulp of ±1 (deterministically — the same chain runs in the oracle)
    assert(math.abs(got("up").get - 1.0) < 1e-12)
    assert(math.abs(got("down").get - (-1.0)) < 1e-12)
    assert(got("flat").isEmpty)
    // same-day tie: two events on day 1 share the averaged day rank, so
    // a value swap WITHIN the day cannot change rho
    val tied = Seq(
      ("t", "2024-01-01 00:00:00", 2.0), ("t", "2024-01-01 01:00:00", 1.0),
      ("t", "2024-01-02 00:00:00", 3.0))
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val swapped = Seq(
      ("t", "2024-01-01 00:00:00", 1.0), ("t", "2024-01-01 01:00:00", 2.0),
      ("t", "2024-01-02 00:00:00", 3.0))
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val r1 = graft.operators.RobustStats.spearmanTrend(tied)
      .collect().head.getAs[Double]("rho")
    val r2 = graft.operators.RobustStats.spearmanTrend(swapped)
      .collect().head.getAs[Double]("rho")
    assert(r1 == r2)
  }
  test("kendallTau: hand-computed banded tau-b with marginal tie correction") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val s = spark
    import s.implicits._
    // type a, two 7-day bands: band1 cells {b0:1, b1:1}, band2 {b1:1, b2:1}
    // cross-band pairs: (0,1)+ (0,2)+ (1,2)+ concordant, (1,1) tied -> C=3 D=0
    // ties: tx2 = 2*1 + 2*1 = 4 (two days of 2), ty2 = 2*1 = 2 (b1 twice)
    // tau_b = 2*3 / (sqrt(12-4) * sqrt(12-2)) = 6 / sqrt(80)
    val ev = Seq(
      ("a", "2024-01-01 12:00:00", 1.0), ("a", "2024-01-01 13:00:00", 7.0),
      ("a", "2024-01-10 12:00:00", 7.0), ("a", "2024-01-10 13:00:00", 12.0),
      // type b: ONE day band -> no orderable pairs -> NULL tau, zero C/D
      ("b", "2024-01-01 12:00:00", 1.0), ("b", "2024-01-01 13:00:00", 9.0))
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = graft.operators.RobustStats.kendallTau(ev)
      .orderBy("event_type").collect()
    val a = got(0)
    assert(a.getAs[Long]("n") == 4L)
    assert(a.getAs[Double]("conc") == 3.0 && a.getAs[Double]("disc") == 0.0)
    assert(a.getAs[Double]("tau_b") ==
      2.0 * 3.0 / (math.sqrt(8.0) * math.sqrt(10.0)))
    val b = got(1)
    assert(b.getAs[Double]("conc") == 0.0 && b.getAs[Double]("disc") == 0.0)
    assert(b.isNullAt(b.fieldIndex("tau_b")),
      "fully day-tied type must yield NULL tau_b")
    intercept[IllegalArgumentException] {
      graft.operators.RobustStats.kendallTau(ev, dayBand = 0)
    }
  }
  test("lDiversity: distinct sensitive counts and the top-value frequency") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val df = Seq(
      // class a: values {1, 1, 2, 3} -> 3 distinct, top freq 2
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L),
      // class b: all one value -> 1 distinct -> violating at l=2
      ("b", 9L), ("b", 9L), ("b", 9L)).toDF("grp", "v")
    val got = graft.operators.Profile
      .lDiversity(df, Seq("grp"), col("v"), l = 2)
      .orderBy("grp").collect()
    val a = got(0)
    assert(a.getAs[Long]("n") == 4L && a.getAs[Long]("n_sensitive") == 3L)
    assert(a.getAs[Long]("top_sensitive") == 2L
      && a.getAs[Long]("violating") == 0L)
    val b = got(1)
    assert(b.getAs[Long]("n_sensitive") == 1L
      && b.getAs[Long]("top_sensitive") == 3L
      && b.getAs[Long]("violating") == 1L)
    intercept[IllegalArgumentException](
      graft.operators.Profile.lDiversity(df, Seq("grp"), col("v"), l = 1))
  }

  test("tCloseness: hand-computed ordered EMD, single-band NULL") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    // A: bands {0:3, 1:1}, B: {0:1, 1:3} -> global {0:4, 1:4}, N=8, m=2
    // A: cum(c*N - g*n) = |3*8-4*4| = 8 -> emd = 8/(4*8*1) = 0.25
    val df = Seq(
      ("A", 0L), ("A", 0L), ("A", 0L), ("A", 1L),
      ("B", 0L), ("B", 1L), ("B", 1L), ("B", 1L)).toDF("grp", "v")
    val got = graft.operators.Profile
      .tCloseness(df, Seq("grp"), col("v"), t = 0.2)
      .orderBy("grp").collect()
    assert(got.length == 2)
    for (r <- got) {
      assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("m") == 2L)
      assert(r.getAs[Double]("emd") == 0.25)
      assert(r.getAs[Long]("violating") == 1L)
    }
    // one global band: EMD undefined -> NULL emd, NULL verdict
    val one = graft.operators.Profile.tCloseness(
      Seq(("A", 5L), ("B", 5L)).toDF("grp", "v"),
      Seq("grp"), col("v"), t = 0.2).collect()
    assert(one.forall(r => r.isNullAt(r.fieldIndex("emd"))
      && r.isNullAt(r.fieldIndex("violating"))))
    // identical distributions: emd exactly 0, not violating
    val same = graft.operators.Profile.tCloseness(
      Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L)).toDF("grp", "v"),
      Seq("grp"), col("v"), t = 0.2).collect()
    assert(same.forall(r => r.getAs[Double]("emd") == 0.0
      && r.getAs[Long]("violating") == 0L))
  }
}
