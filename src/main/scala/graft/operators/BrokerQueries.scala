package graft.operators

import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's cold-path read surface re-expressed as declarative
  * DataFrame plans over the canonical `stream_data` relation
  * (graft.model.StreamMessage schema).
  *
  * Semantics contract (reference `src/storage/Storage.ts`):
  *  - requestLast  — the N most recent messages of a stream-part, returned
  *    ascending; N clamped to 10 000 (`Storage.ts:18,101-194`).
  *  - requestFrom  — everything at-or-after a `(ts, sequenceNo)` bound,
  *    ascending, optional publisher/msgChain filter (`Storage.ts:196-208,
  *    253-331`).
  *  - requestRange — closed `(ts, seq)`-bounded interval, ascending,
  *    optional publisher/msgChain filter (`Storage.ts:211-251,333-410`).
  *
  * The reference splits the seq-bounded scans into 2–3 disjoint CQL queries
  * concatenated in order (`Storage.ts:295-314,371-394`); here each bound is
  * a single composite predicate that Catalyst pushes into the parquet scan,
  * and the final `orderBy` reproduces the merge order. Output order is
  * `(ts, sequence_no)` ascending with a deterministic `(publisher_id,
  * msg_chain_id)` tiebreak (SURVEY §7.4 — the reference's clustering order).
  *
  * Scale notes: every plan filters on the stream-part columns first (which
  * are the table's physical partition columns when written via
  * [[graft.store.MessageStore]], so pruning happens before I/O), and
  * requestLast compiles to TakeOrderedAndProject — a distributed top-K, no
  * global sort, no driver-side materialization beyond the clamped N.
  */
object BrokerQueries {

  /** Hard clamp on requestLast result size (`Storage.ts:18`). */
  val MaxResendLast = 10000

  /** A `(timestamp, sequenceNo)` message reference bound (epoch millis). */
  final case class MsgRef(tsMs: Long, seq: Int) {
    def ntz: Column = lit(LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(tsMs), java.time.ZoneOffset.UTC))
  }

  private def streamPart(streamId: String, partition: Int): Column =
    col("stream_id") === streamId && col("stream_partition") === partition

  /** From-bound: `(ts > T) OR (ts = T AND seq >= S)` — the reference's
    * 2-way disjoint sub-scan pair as one predicate (`Storage.ts:295-298`). */
  def fromBound(from: MsgRef): Column =
    col("ts") > from.ntz || (col("ts") === from.ntz && col("sequence_no") >= from.seq)

  /** To-bound: `(ts < T) OR (ts = T AND seq <= S)` (`Storage.ts:371-376`). */
  def toBound(to: MsgRef): Column =
    col("ts") < to.ntz || (col("ts") === to.ntz && col("sequence_no") <= to.seq)

  /** Optional publisher/msgChain equality filter.
    *
    * Intentional deviations from `Storage.ts` `requestFrom`/`requestRange`
    * (a bug-fixed superset — do not "fix" tests/oracles back to reference
    * behavior): (1) partial combinations (publisher-only or msgChain-only)
    * are accepted, where the reference throws 'Invalid combination' unless
    * both or neither are given; (2) sequence-number bounds are always
    * applied, where the reference ignores them on the no-publisher path
    * (the NET-268 TODO at `Storage.ts:200-208,214-223`). */
  private def publisherFilter(publisher: Option[String], msgChain: Option[String]): Column =
    Seq(
      publisher.map(col("publisher_id") === _),
      msgChain.map(col("msg_chain_id") === _)
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))

  private val ascending =
    Seq(col("ts").asc, col("sequence_no").asc, col("publisher_id").asc, col("msg_chain_id").asc)

  /** N most recent messages, ascending output (`Storage.ts:101-194`). */
  def requestLast(streamData: DataFrame, streamId: String, partition: Int, limit: Int): DataFrame = {
    val n = math.min(math.max(limit, 0), MaxResendLast) // clamp, Storage.ts:102-105
    streamData
      .filter(streamPart(streamId, partition))
      .orderBy(col("ts").desc, col("sequence_no").desc,
        col("publisher_id").desc, col("msg_chain_id").desc)
      .limit(n)
      .orderBy(ascending: _*)
  }

  /** Per-stream-part last-N — the grouped variant of [[requestLast]]
    * (SURVEY §2.5 T1): one windowed pass over all stream-parts instead of
    * one query per part, for bulk serving/metadata jobs. Ascending within
    * each part like the single-part contract. */
  def requestLastGrouped(streamData: DataFrame, limit: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = math.min(math.max(limit, 0), MaxResendLast)
    val w = Window.partitionBy(col("stream_id"), col("stream_partition"))
      .orderBy(col("ts").desc, col("sequence_no").desc,
        col("publisher_id").desc, col("msg_chain_id").desc)
    streamData
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
      .orderBy(col("stream_id") +: col("stream_partition") +: ascending: _*)
  }

  /** All messages at-or-after `from`, ascending (`Storage.ts:196-208`). */
  def requestFrom(
      streamData: DataFrame,
      streamId: String,
      partition: Int,
      from: MsgRef,
      publisher: Option[String] = None,
      msgChain: Option[String] = None): DataFrame =
    streamData
      .filter(streamPart(streamId, partition) && fromBound(from) &&
        publisherFilter(publisher, msgChain))
      .orderBy(ascending: _*)

  /** Messages in the closed `(from, to)` interval, ascending
    * (`Storage.ts:211-251`). */
  def requestRange(
      streamData: DataFrame,
      streamId: String,
      partition: Int,
      from: MsgRef,
      to: MsgRef,
      publisher: Option[String] = None,
      msgChain: Option[String] = None): DataFrame =
    streamData
      .filter(streamPart(streamId, partition) && fromBound(from) && toBound(to) &&
        publisherFilter(publisher, msgChain))
      .orderBy(ascending: _*)

  /** Per-stream-part metadata: message count, byte total, first/last
    * timestamp — the reference's four metadata endpoints in one aggregate
    * (`Storage.ts:452-576`; answers come from partial aggregation, one
    * shuffle of (stream-part count) rows). */
  def metadata(streamData: DataFrame): DataFrame =
    streamData
      .groupBy(col("stream_id"), col("stream_partition"))
      .agg(
        count(lit(1)).as("message_count"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  /** DISTINCT stream-parts (`DeleteExpiredCmd.ts:72-81`). */
  def distinctStreamParts(streamData: DataFrame): DataFrame =
    streamData.select(col("stream_id"), col("stream_partition")).distinct()

  /** The reference's `bucket` index/statistics table, derived: one row per
    * (stream-part, hour bucket) with record count and byte size
    * (`src/storage/BucketManager.ts:327-344` upserts the same stats). */
  def bucketStats(streamData: DataFrame): DataFrame =
    streamData
      .groupBy(col("stream_id"), col("stream_partition"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bucket_ts"))
      .agg(
        count(lit(1)).as("records"),
        sum(octet_length(col("payload"))).as("size"))

  /** Buckets eligible for retention deletion: a bucket expires only when
    * its MAX(ts) is older than the cutoff — the data-aware rule, not just
    * the bucket's creation date (`src/storage/DeleteExpiredCmd.ts:135-161`).
    */
  def expiredBuckets(streamData: DataFrame, cutoff: MsgRef): DataFrame =
    streamData
      .groupBy(col("stream_id"), col("stream_partition"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bucket_ts"))
      .agg(max(col("ts")).as("max_ts"))
      .filter(col("max_ts") < cutoff.ntz)
      .select(col("stream_id"), col("stream_partition"), col("bucket_ts"))

  /** Retention enforcement as a plan: rows surviving the expiry pass.
    * On the physical table this is a partition drop, not a rewrite. */
  def retainUnexpired(streamData: DataFrame, cutoff: MsgRef): DataFrame = {
    val expired = expiredBuckets(streamData, cutoff)
      .withColumnRenamed("bucket_ts", "expired_bucket_ts")
    streamData
      .join(expired,
        streamData("stream_id") === expired("stream_id") &&
          streamData("stream_partition") === expired("stream_partition") &&
          date_trunc("hour", streamData("ts")).cast("timestamp_ntz") === expired("expired_bucket_ts"),
        "left_anti")
  }
}
