package graft.streaming

/** Dynamic storage-assignment state (R7/U2) — the engine analog of the
  * reference's StorageConfig, which polls the assigned-streams API and
  * listens to the assignment event stream, diffing added/removed
  * stream-parts on every refresh (`src/storage/StorageConfig.ts:96-149`).
  *
  * The ingest pipeline reads `get()` at the top of every micro-batch, so an
  * update takes effect on the next batch boundary — a stream-part added
  * mid-stream starts persisting, a removed one stops, with no restart.
  * `None` means "store everything" (an unscoped node).
  */
final class DynamicAssignment(initial: Option[Set[String]] = None) {

  @volatile private var current: Option[Set[String]] = initial

  /** Current assignment snapshot (read per micro-batch). */
  def get(): Option[Set[String]] = current

  /** Replace the assignment and report the delta, mirroring
    * `StorageConfig.ts:127-141` (`onStreamsAdded`/`onStreamsRemoved`).
    * Returns (added, removed) stream-part keys. */
  def update(next: Option[Set[String]]): (Set[String], Set[String]) = {
    val delta = DynamicAssignment.diff(current, next)
    current = next
    delta
  }
}

object DynamicAssignment {

  /** U2 — set difference for a config refresh: which stream-part keys were
    * added and which removed between two assignment snapshots. `None` is
    * the universal set (store everything), so e.g. None→Some(s) removes
    * the unbounded scope and Some(s)→None adds it; deltas against the
    * universal set report only the explicit side. */
  def diff(before: Option[Set[String]], after: Option[Set[String]]):
      (Set[String], Set[String]) = (before, after) match {
    case (Some(b), Some(a)) => (a -- b, b -- a)
    case _                  => (Set.empty, Set.empty) // to/from the universal set
  }
}
