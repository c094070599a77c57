package graft

import org.apache.spark.sql.functions._

import graft.functions.KllSketch
import graft.functions.KllSketch.kll_quantiles

class QuantileSketchSpec extends SparkSpec {

  test("no compaction (k >= n): exact nearest-rank percentiles") {
    val sk = new KllSketch(128)
    (1 to 100).foreach(v => sk.insert(v.toDouble))
    // nearest-rank: smallest item with cum weight >= ceil(p * 100)
    assert(sk.quantile(0.5) == 50.0)
    assert(sk.quantile(0.95) == 95.0)
    assert(sk.quantile(0.0) == 1.0)   // target clamps to rank 1
    assert(sk.quantile(1.0) == 100.0)
    assert(sk.retained == 100)
  }

  test("compaction bounds memory and keeps rank error small") {
    val n = 100000
    val sk = new KllSketch(200)
    // adversarial order: descending, so early compactions see skewed data
    (n to 1 by -1).foreach(v => sk.insert(v.toDouble))
    assert(sk.retained < 4000, s"retained ${sk.retained} — compaction not bounding memory")
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.quantile(p)
      val trueRank = p * n
      assert(math.abs(est - trueRank) <= 0.03 * n,
        s"p=$p est=$est — rank error ${math.abs(est - trueRank) / n}")
    }
  }

  test("merge: rank error holds when built from many independent parts") {
    val n = 100000
    val parts = (0 until 32).map { part =>
      val sk = new KllSketch(200)
      (part until n by 32).foreach(v => sk.insert(v.toDouble + 1.0))
      sk
    }
    val merged = parts.reduceLeft { (a, b) => a.mergeWith(b); a }
    assert(merged.count == n)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(p)
      assert(math.abs(est - p * n) <= 0.03 * n, s"p=$p est=$est")
    }
  }

  test("serde round-trip preserves the sketch exactly") {
    val sk = new KllSketch(64)
    (1 to 10000).foreach(v => sk.insert((v * 7919 % 10007).toDouble))
    val back = KllSketch.fromBytes(sk.toBytes)
    assert(back.count == sk.count && back.retained == sk.retained)
    for (p <- Seq(0.01, 0.5, 0.99))
      assert(back.quantile(p) == sk.quantile(p))
  }

  test("aggregate over a DataFrame: exact when k exceeds the group, bounded when not") {
    val s = spark
    import s.implicits._
    val df = (1 to 2000).map(i => (if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("g", "v").repartition(16)
    // k = 4096 > group size 1000 → exact nearest-rank per group
    val exact = df.groupBy("g")
      .agg(kll_quantiles(col("v"), Seq(0.5, 0.9), k = 4096).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // group a = evens 2..2000: rank 500 → 1000, rank 900 → 1800
    assert(exact("a") == Seq(1000.0, 1800.0))
    assert(exact("b") == Seq(999.0, 1799.0))
    // small k under parallel merge: estimates stay within the rank band
    val approx = df.groupBy("g")
      .agg(kll_quantiles(col("v"), Seq(0.5), k = 32).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    assert(math.abs(approx("a") - 1000.0) <= 200.0, s"a → ${approx("a")}")
    assert(math.abs(approx("b") - 999.0) <= 200.0, s"b → ${approx("b")}")
  }

  test("partial aggregation: the plan merges sketches, not rows") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val plan = df.groupBy("g")
      .agg(kll_quantiles(col("v"), Seq(0.5), k = 64).as("q"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate with a partial_ stage = map-side sketch combine
    assert(plan.contains("ObjectHashAggregate"), s"no imperative aggregate: $plan")
    assert(plan.contains("partial_kll_quantiles"), s"no map-side partial: $plan")
  }
}
