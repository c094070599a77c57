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
