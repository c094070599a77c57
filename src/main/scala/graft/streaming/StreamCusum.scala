package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online CUSUM change detection (Page 1954, the ORIGINAL target-based
  * formulation) — the live counterpart of the batch
  * [[graft.metrics.Metrics.cusum]]. The batch detector centers on the
  * realized mean (a retrospective audit); a live monitor cannot center on
  * a mean it hasn't seen yet, so it accumulates drift from an EXPECTED
  * rate `mu0` with the standard allowance `k`:
  * `s⁺ = max(0, s⁺ + x − mu0 − k)`, `s⁻ = max(0, s⁻ + mu0 − x − k)`,
  * alarm while a statistic exceeds `h`. All longs — messages per minute
  * against integer parameters, no float ever.
  *
  * Input is the pre-aggregated per-minute count stream (the
  * [[MetricsStream]] output shape), processed at-arrival in minute order
  * within each micro-batch ([[StreamAnomaly]]'s contract). Idle minutes
  * BETWEEN observations are zero-filled into the state — silence is
  * exactly the evidence a rate-DROP detector exists for — and a gap
  * minute emits a row only when it first crosses `h` (so a long outage
  * costs O(gap) state updates, wall-clock-bounded like the dense spine,
  * but O(1) output). State per part: three longs, forever. */
object StreamCusum {

  final case class MinuteCount(part: String, minute: Long, msgs: Long)

  final case class CusumState(sPos: Long, sNeg: Long, lastMinute: Long)

  final case class Alert(part: String, minute: Long, msgs: Long,
      s_pos: Long, s_neg: Long, alarm_up: Boolean, alarm_down: Boolean)

  def detect(counts: Dataset[MinuteCount], mu0: Long,
      allowance: Long = 0L, h: Long): Dataset[Alert] = {
    require(mu0 >= 0, s"mu0 must be >= 0: $mu0")
    require(allowance >= 0, s"allowance must be >= 0: $allowance")
    require(h > 0, s"h must be > 0: $h")
    import counts.sparkSession.implicits._
    val step: (String, Iterator[MinuteCount], GroupState[CusumState]) => Iterator[Alert] = {
      case (part, rows, state) =>
        var st = state.getOption.getOrElse(CusumState(0L, 0L, Long.MinValue))
        val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
        def advance(msgs: Long, minute: Long): Unit =
          st = CusumState(
            math.max(0L, st.sPos + (msgs - mu0 - allowance)),
            math.max(0L, st.sNeg + (mu0 - msgs - allowance)),
            minute)
        rows.toSeq.sortBy(_.minute).foreach { r =>
          if (st.lastMinute != Long.MinValue) {
            var m = st.lastMinute + 1
            while (m < r.minute) {
              val wasDown = st.sNeg > h
              val wasUp = st.sPos > h
              advance(0L, m)
              if ((st.sNeg > h && !wasDown) || (st.sPos > h && !wasUp))
                out += Alert(part, m, 0L, st.sPos, st.sNeg,
                  st.sPos > h, st.sNeg > h)
              m += 1
            }
          }
          // a re-reported or out-of-order minute (minute <= lastMinute)
          // folds in at-arrival without gap fill — StreamAnomaly semantics
          advance(r.msgs, math.max(r.minute, st.lastMinute))
          out += Alert(part, r.minute, r.msgs, st.sPos, st.sNeg,
            st.sPos > h, st.sNeg > h)
        }
        state.update(st)
        out.iterator
    }
    counts.groupByKey(_.part)
      .flatMapGroupsWithState[CusumState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }
}
