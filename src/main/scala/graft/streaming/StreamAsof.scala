package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the live counterpart of
  * [[graft.operators.AsofJoin]]: each left event picks up the most recent
  * right event for its key ("latest purchase at or before this click",
  * "latest config/dimension version for this reading"). Spark's built-in
  * stream-stream join needs a time-bounded join condition and buffers BOTH
  * sides; for the asymmetric latest-state shape, keyed state via
  * `flatMapGroupsWithState` holds exactly ONE right row per key — the
  * MLlib-free, SURVEY §2.8-style custom-state pattern.
  *
  * Ordering semantics: within a micro-batch, rows are processed in event
  * time (ties: right before left, then id — identical to
  * `AsofJoin.asofBackward`), so intra-batch causality never depends on
  * arrival order. Across batches the state is "latest right seen so far":
  * a right row that ARRIVES late (after a left in a previous batch was
  * already emitted) cannot retro-enrich — the standard streaming trade;
  * the batch as-of over the store is the at-rest backstop, exactly like
  * [[StreamDedup]]'s relationship to the batch dedups. Conversely a LEFT
  * row that arrives late (in a later batch than a right with a greater
  * event time) still only sees state at-or-before its own event time —
  * the emit-side visibility filter below — so the backward contract is
  * never violated in either direction; at worst a late left misses a
  * right the single-row state has already superseded (it emits None
  * rather than a wrong-future row).
  *
  * Scale: one shuffle per micro-batch on the key; state is one small
  * tuple per key. Pass `idleRetention = Some(...)` in long-lived
  * deployments to evict idle keys via processing-time timeout (without
  * it, state grows with lifetime key cardinality). The eviction is
  * opt-in because registering processing-time timeouts makes the
  * micro-batch engine schedule timeout-check batches continuously —
  * correct under a paced production trigger, but it never quiesces under
  * `processAllAvailable`-style test drains.
  */
object StreamAsof {

  /** Input row: `left = false` rows update state, `left = true` rows emit. */
  case class AsofEvent(key: Long, tms: Long, left: Boolean, id: Long, value: Double)

  /** Latest right row per key carried across batches. */
  case class AsofState(tms: Long, id: Long, value: Double)

  /** Left row + the as-of right row (None when no right row seen yet). */
  case class AsofOut(key: Long, tms: Long, id: Long, value: Double,
      asof_id: Option[Long], asof_value: Option[Double])

  def enrich(events: Dataset[AsofEvent],
      idleRetention: Option[String] = None): Dataset[AsofOut] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val timeoutConf = if (idleRetention.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append(), timeoutConf) {
        (key: Long, it: Iterator[AsofEvent], state: GroupState[AsofState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            idleRetention.foreach(state.setTimeoutDuration)
            var cur = state.getOption
            // event-time order inside the batch; right (left=false) sorts
            // before left at an equal timestamp — AsofJoin's tie policy
            val rows = it.toArray.sortBy(e => (e.tms, if (e.left) 1 else 0, e.id))
            val out = rows.flatMap { e =>
              if (!e.left) {
                // keep the max-(tms, id) right row: a LATE-arriving right
                // row older than the carried state must not regress it (the
                // in-batch sort already orders this batch's rights, so the
                // guard only bites against cross-batch state)
                if (cur.forall(c => e.tms > c.tms || (e.tms == c.tms && e.id >= c.id)))
                  cur = Some(AsofState(e.tms, e.id, e.value))
                None
              } else {
                // visibility check: the carried state is the latest right
                // seen SO FAR, which for a late-arriving left may lie in
                // the left's future — the 'at or before' contract must
                // hold across batches too, so such state is invisible to
                // this emit (the state update itself stays max-based)
                val vis = cur.filter(_.tms <= e.tms)
                Some(AsofOut(e.key, e.tms, e.id, e.value,
                  vis.map(_.id), vis.map(_.value)))
              }
            }
            cur.foreach(state.update)
            out.iterator
          }
      }
  }
}
