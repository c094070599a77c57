package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.multimodal.ShardWriter

/** Live shard sealing — the STREAMING tail of the training-data factory,
  * and the reference's size-capped bucket state machine
  * (`src/storage/BucketManager.ts:72-97` routes rows into an open bucket
  * and closes it when its record/size cap trips) re-expressed for
  * training shards: documents arrive per stream, accumulate into the
  * OPEN shard, and when the next record would push the container past
  * `budgetBytes` the shard SEALS — emitted downstream as finished
  * TFRecord container bytes ([[ShardWriter.tfRecordFrame]] framing, the
  * same bytes the gated validating reader parses) — and a fresh shard
  * opens. The batch writers ([[ShardWriter.emitTfRecordShards]]) are the
  * backfill path; this is the continuous one.
  *
  * Greedy seal rule (the packGreedy discipline, bytes instead of
  * tokens): a record seals the open shard only if the shard is
  * non-empty and would overflow — so a record larger than the budget
  * still forms its own single-record shard, never dropped, never split.
  *
  * At-arrival contract: rows process in `seq` order within each
  * micro-batch; `seq` is assumed monotone across batches per stream (the
  * broker's per-partition ordering guarantee). The OPEN shard rides in
  * state — payload bytes retained, BOUNDED BY `budgetBytes` exactly like
  * the reference's open bucket — and survives checkpoint restart, so a
  * crash never loses or duplicates a sealed shard. The trailing partial
  * shard stays open until a later record seals it (or an operational
  * oversize sentinel flushes it); [[batchReplay]] mirrors that by
  * emitting ONLY budget-sealed shards, which is what makes stream ==
  * batch parity exact. */
object StreamShardEmit {

  final case class DocEvent(stream: String, seq: Long, payload: Array[Byte])

  final case class ShardState(shardSeq: Long, fill: Long,
      firstSeq: Long, lastSeq: Long, payloads: Seq[Array[Byte]])

  final case class SealedShard(stream: String, shard_seq: Long,
      n_records: Long, n_bytes: Long, first_seq: Long, last_seq: Long,
      data: Array[Byte])

  /** Budget guard shared by [[emit]] and [[batchReplay]]: positive, and
    * small enough that a budget-bounded shard always fits a JVM byte
    * array — `fill` feeds a `ByteArrayOutputStream` size hint and the
    * sealed blob is one array, so a budget past `Int.MaxValue - 16`
    * would overflow the hint into a negative int and throw at seal time
    * instead of here. (A single oversize record still caps at the JVM
    * array limit inherently: one record IS one array already.) */
  private def requireBudget(budgetBytes: Long): Unit =
    require(budgetBytes > 0 && budgetBytes <= Int.MaxValue.toLong - 16L,
      s"budgetBytes must be in (0, ${Int.MaxValue.toLong - 16L}]: $budgetBytes")

  /** Container bytes a payload adds: the 16 TFRecord framing bytes plus
    * the payload itself. */
  @inline private def recBytes(p: Array[Byte]): Long = 16L + p.length

  private def empty(shardSeq: Long) =
    ShardState(shardSeq, 0L, -1L, -1L, Vector.empty)

  private def seal(stream: String, st: ShardState): SealedShard = {
    // the hint is clamped, not trusted: an oversize single-record shard's
    // fill can exceed a legal array size hint even under a valid budget
    val bos = new java.io.ByteArrayOutputStream(
      math.min(st.fill, Int.MaxValue.toLong - 16L).toInt)
    st.payloads.foreach(p => bos.write(ShardWriter.tfRecordFrame(p)))
    val data = bos.toByteArray
    SealedShard(stream, st.shardSeq, st.payloads.length.toLong,
      data.length.toLong, st.firstSeq, st.lastSeq, data)
  }

  def emit(events: Dataset[DocEvent],
      budgetBytes: Long = 1L << 20): Dataset[SealedShard] = {
    requireBudget(budgetBytes)
    import events.sparkSession.implicits._
    val step: (String, Iterator[DocEvent], GroupState[ShardState]) => Iterator[SealedShard] = {
      case (stream, rows, state) =>
        var st = state.getOption.getOrElse(empty(0L))
        val out = scala.collection.mutable.ArrayBuffer.empty[SealedShard]
        rows.toSeq.sortBy(_.seq).foreach { r =>
          val p = Option(r.payload).getOrElse(Array.emptyByteArray)
          if (st.fill > 0L && st.fill + recBytes(p) > budgetBytes) {
            out += seal(stream, st)
            st = empty(st.shardSeq + 1L)
          }
          st = ShardState(st.shardSeq, st.fill + recBytes(p),
            if (st.payloads.isEmpty) r.seq else st.firstSeq, r.seq,
            st.payloads :+ p)
        }
        state.update(st)
        out.iterator
    }
    events.groupByKey(_.stream)
      .flatMapGroupsWithState[ShardState, SealedShard](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Batch replay of the same seal chain — the parity oracle: per stream
    * in seq order, identical greedy boundaries, only budget-SEALED shards
    * emitted (the trailing partial stays open in the stream too). */
  def batchReplay(events: Dataset[DocEvent],
      budgetBytes: Long = 1L << 20): Dataset[SealedShard] = {
    requireBudget(budgetBytes)
    import events.sparkSession.implicits._
    events.groupByKey(_.stream)
      .flatMapSortedGroups($"seq".asc) { (stream, rows) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[SealedShard]
        var st = empty(0L)
        rows.foreach { r =>
          val p = Option(r.payload).getOrElse(Array.emptyByteArray)
          if (st.fill > 0L && st.fill + recBytes(p) > budgetBytes) {
            out += seal(stream, st)
            st = empty(st.shardSeq + 1L)
          }
          st = ShardState(st.shardSeq, st.fill + recBytes(p),
            if (st.payloads.isEmpty) r.seq else st.firstSeq, r.seq,
            st.payloads :+ p)
        }
        out.iterator
      }
  }
}
