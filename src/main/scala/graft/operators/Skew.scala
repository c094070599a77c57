package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for hot keys (a handful of stream-parts
  * carrying most of the traffic is the expected shape of a pub/sub
  * workload at 100 TB).
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime; these
  * helpers cover the two places AQE doesn't: broadcast-side fan-out joins
  * against a *replicated* small side, and single-hot-group aggregations.
  * Salts are deterministic (hash of the row's own columns, never rand()),
  * so plans stay reproducible and re-runnable.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from tiebreak columns. */
  def saltOf(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Salted equi-join: the skewed (large) side gets a salt from its own
    * row identity; the small side is replicated `buckets` times with
    * every salt value, so each hot key spreads over `buckets` reducers.
    * Semantically identical to `large.join(small, keys)` for any
    * `buckets >= 1`. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int,
      saltCols: Seq[String]): DataFrame = {
    require(buckets >= 1)
    val salted = large.withColumn("__salt",
      saltOf(buckets, saltCols.map(col): _*))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted aggregation for hot groups: pre-aggregate on
    * (keys, salt), then merge. `agg`/`merge` must form a commutative
    * monoid over the value column (sum/count/min/max do). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      saltCols: Seq[String],
      agg: Column,
      merge: Column => Column,
      as: String): DataFrame =
    df.withColumn("__salt", saltOf(buckets, saltCols.map(col): _*))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(agg.as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(merge(col("__partial")).as(as))
}
