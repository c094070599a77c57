package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Misra–Gries heavy hitters — the live counterpart of the
  * batch two-pass [[graft.text.TextAnalysis.heavyHitters]]: per group
  * (stream, tenant, language …), maintain at most `k-1` candidate
  * counters over an unbounded item stream and emit the surviving
  * candidates with their estimate and error bound after every
  * micro-batch.
  *
  * The classic MG invariants survive streaming unchanged, because the
  * summary is a sequential fold and micro-batches are just a partition of
  * the sequence: for every item, `est ≤ true ≤ est + decrements`, and any
  * item whose true count exceeds `processed / k` is guaranteed present in
  * the candidate set (deterministically — no sketch randomness). The
  * emitted `max_err` (total decrement rounds so far) is the per-snapshot
  * certificate: a consumer promotes a candidate to a confirmed heavy
  * hitter when `est > threshold` and demotes when `est + max_err <
  * threshold`, exactly the batch operator's recount contract, shifted to
  * a monitoring loop.
  *
  * Scale: state per group is O(k) (map of at most k-1 counters + two
  * longs) regardless of stream length; each micro-batch's work is one
  * fold over that batch's rows. Groups shard across executors by key —
  * the same bounded-keyed-state shape as [[StreamDedup]] /
  * [[StreamAnomaly]].
  */
object StreamHeavyHitters {

  final case class Item(group: String, item: String)

  final case class HHState(counters: Map[String, Long], processed: Long,
      decrements: Long)

  /** One row per surviving candidate per group per micro-batch. */
  final case class HHSnapshot(group: String, item: String, est: Long,
      max_err: Long, processed: Long)

  def heavyHitters(items: Dataset[Item], k: Int): Dataset[HHSnapshot] = {
    require(k >= 2, "k must be at least 2")
    import items.sparkSession.implicits._
    val step: (String, Iterator[Item], GroupState[HHState]) => Iterator[HHSnapshot] = {
      case (group, rows, state) =>
        var st = state.getOption.getOrElse(HHState(Map.empty, 0L, 0L))
        rows.foreach { r =>
          val c = st.counters
          st =
            if (c.contains(r.item))
              st.copy(counters = c + (r.item -> (c(r.item) + 1L)),
                processed = st.processed + 1L)
            else if (c.size < k - 1)
              st.copy(counters = c + (r.item -> 1L),
                processed = st.processed + 1L)
            else {
              // decrement round: every counter loses one; zeros vacate.
              // Each round absorbs k occurrences (the new item + k-1
              // counters), so rounds ≤ processed/k — the error bound.
              val dec = c.map { case (it, n) => it -> (n - 1L) }
                .filter(_._2 > 0L)
              HHState(dec, st.processed + 1L, st.decrements + 1L)
            }
        }
        state.update(st)
        st.counters.iterator.map { case (it, n) =>
          HHSnapshot(group, it, n, st.decrements, st.processed)
        }.toSeq.sortBy(s => (-s.est, s.item)).iterator
    }
    items
      .groupByKey(_.group)
      .flatMapGroupsWithState[HHState, HHSnapshot](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(step)
  }
}
