package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming rate-anomaly alerting — the live counterpart of the batch
  * [[graft.metrics.Metrics.anomalyFlags]] rolling z-score: each completed
  * per-minute count is scored against the mean/stddev of the trailing
  * `lookback` dense minutes known at arrival and flagged when it exceeds
  * mean + `k`·stddev. Feed it the output of a windowed minute-count
  * aggregation ([[MetricsStream.minuteRates]] flattened to one row per
  * closed minute).
  *
  * State per stream-part is a ring of the last `lookback + lateSlack`
  * ACTIVE minute counts plus the first minute index ever seen — idle
  * minutes cost nothing and contribute to the statistics by arithmetic,
  * the same sparse formulation as the batch operator. In-order arrivals
  * reproduce the batch flags exactly; a late minute (within the upstream
  * watermark) is scored against the history present at arrival —
  * at-arrival semantics, the honest option for an alerting path that
  * must not retract decisions. `lateSlack` (minutes) must be at least
  * the upstream watermark delay: it is the eviction margin that keeps a
  * late minute's FULL trailing window in state — evicting at exactly
  * `newest − lookback` would have already zeroed the head of a late
  * minute's window, understating its mean/stddev and firing spurious
  * flags.
  *
  * Scale: state is O(active parts × lookback) longs, independent of
  * history length, and processing is one state lookup per closed minute —
  * the [[StreamDedup]]/[[StreamSessions]] bounded-state argument.
  */
object StreamAnomaly {

  final case class MinuteCount(stream_id: String, stream_partition: Int,
      minute: Timestamp, msgs: Long)

  final case class AnomalyState(firstIdx: Long, entries: Map[Long, Long])

  final case class AnomalyAlert(stream_id: String, stream_partition: Int,
      minute: Timestamp, msgs: Long, mean: Double, variance: Double,
      is_anomaly: Boolean)

  def flags(minutes: Dataset[MinuteCount], lookback: Int = 60,
      k: Double = 3.0, minHistory: Int = 10,
      lateSlack: Int = 5): Dataset[AnomalyAlert] = {
    require(lookback > 1 && minHistory >= 2, "need lookback > 1, minHistory >= 2")
    require(lateSlack >= 0, s"lateSlack must be >= 0: $lateSlack")
    import minutes.sparkSession.implicits._
    val step: ((String, Int), Iterator[MinuteCount],
        GroupState[AnomalyState]) => Iterator[AnomalyAlert] = {
      case ((sid, part), rows, state) =>
        var st = state.getOption.getOrElse(AnomalyState(Long.MaxValue, Map.empty))
        // event-time order within the batch, ties impossible (one row per
        // closed minute window)
        val out = rows.toSeq.sortBy(_.minute.getTime).map { r =>
          val idx = r.minute.getTime / 60000L
          val first = math.min(st.firstIdx, idx)
          val trailing = st.entries.filter { case (i, _) =>
            i >= idx - lookback && i < idx
          }
          val n = math.max(0L, math.min(lookback.toLong, idx - first))
          val s = trailing.values.sum
          val s2 = trailing.values.map(v => v * v).sum
          val mean = if (n > 0) s.toDouble / n.toDouble else 0.0
          val variance =
            if (n > 0) (n * s2 - s * s).toDouble / (n * n).toDouble else 0.0
          val flag = n >= minHistory &&
            r.msgs.toDouble > mean + k * math.sqrt(variance)
          // eviction keeps `lateSlack` extra minutes beyond the lookback
          // so a watermark-late minute still finds its full window
          st = AnomalyState(first,
            (st.entries + (idx -> r.msgs))
              .filter(_._1 > idx - lookback - lateSlack))
          AnomalyAlert(sid, part, r.minute, r.msgs, mean, variance, flag)
        }
        state.update(st)
        out.iterator
    }
    minutes
      .groupByKey(m => (m.stream_id, m.stream_partition))
      .flatMapGroupsWithState[AnomalyState, AnomalyAlert](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(step)
  }
}
