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
}
