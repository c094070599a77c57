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
    import org.apache.spark.sql.expressions.Window
    val h = graft.text.TextAnalysis.md5Int60(
      concat(lit(s"$salt:"), key.cast("string")))
    val w = Window.partitionBy(stratum).orderBy(h, key)
    val kExpr = targets.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(stratum === s, lit(k)).otherwise(acc)
    }
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= kExpr)
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
}
