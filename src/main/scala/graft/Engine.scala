package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.BrokerQueries
import graft.operators.BrokerQueries.MsgRef
import graft.serve.{Formats, Resend, SubscriptionRegistry}
import graft.store.MessageStore
import graft.streaming.IngestPipeline

/** The engine facade — the reference broker's storage-node API surface
  * (SURVEY §3) over one bucketed store:
  *
  *  - write path: `publish` (batch) / `startIngest` (streaming) run the
  *    validate→assign→dedup→append chain (§3.3);
  *  - read path: `last`/`from`/`range` serve the resend envelope in any
  *    format (§3.1-3.2), `metadata` the count/bytes/first/last endpoints
  *    (`Storage.ts:452-576`);
  *  - live path: `subscribe` receives each ingested micro-batch (R1);
  *  - ops: `deleteExpired` enforces retention by bucket drop
  *    (`DeleteExpiredCmd.ts`).
  */
final class GraftEngine(
    val spark: SparkSession,
    val storePath: String,
    assigned: Option[Set[String]] = None) {

  // The engine's NTZ columns carry UTC wall-clock (epoch-ms in the
  // reference); pin the session zone so TIMESTAMP casts (serve-format
  // epoch rendering, window functions) agree with that convention
  // regardless of host JVM zone.
  spark.conf.set("spark.sql.session.timeZone", "UTC")

  val subscriptions = new SubscriptionRegistry()

  /** The store as a relation (empty store ⇒ empty relation). */
  def table: DataFrame =
    try MessageStore.open(spark, storePath)
    catch {
      case _: Throwable =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          graft.model.StreamMessage.schema)
    }

  /** Batch publish: one prepared micro-batch through the ingest chain,
    * persisted and fanned out. Returns accepted-row count. */
  def publish(messages: DataFrame, nowMs: Long = System.currentTimeMillis()): Long = {
    val prepared = IngestPipeline.prepareBatch(messages, nowMs, assigned).cache()
    try {
      val n = prepared.count()
      if (n > 0) MessageStore.append(prepared, storePath)
      subscriptions.dispatch(prepared, -1L)
      n
    } finally prepared.unpersist()
  }

  /** Streaming publish (the hot path). */
  def startIngest(source: DataFrame, checkpointPath: String,
      triggerMs: Long = 1000L): StreamingQuery =
    IngestPipeline.start(source, storePath, checkpointPath, assigned, triggerMs,
      onBatch = subscriptions.dispatch)

  // ---- reads (§3.1): resend envelope over the chosen format ----
  def last(streamId: String, partition: Int, n: Int,
      format: String = "object"): Iterator[Resend.Frame] =
    // bounded scan: newest buckets only (Storage.ts:142-181 analog)
    Resend.envelope(Formats.format(
      MessageStore.requestLastBounded(spark, storePath, streamId, partition,
        math.min(math.max(n, 0), BrokerQueries.MaxResendLast)),
      format))

  def from(streamId: String, partition: Int, ref: MsgRef,
      format: String = "object"): Iterator[Resend.Frame] =
    Resend.from(MessageStore.pruneTime(table, Some(ref.tsMs), None),
      streamId, partition, ref, format)

  def range(streamId: String, partition: Int, fromRef: MsgRef, toRef: MsgRef,
      format: String = "object"): Iterator[Resend.Frame] =
    Resend.range(MessageStore.pruneTime(table, Some(fromRef.tsMs), Some(toRef.tsMs)),
      streamId, partition, fromRef, toRef, format)

  /** Metadata endpoints (count/bytes/first/last per stream-part). */
  def metadata(streamId: String, partition: Int): Option[(Long, Long, Long, Long)] =
    BrokerQueries.metadata(
      table.filter(col("stream_id") === streamId && col("stream_partition") === partition))
      .collect().headOption.map { r =>
        (r.getAs[Long]("message_count"), r.getAs[Long]("total_bytes"),
          r.getAs[java.time.LocalDateTime]("first_ts")
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
          r.getAs[java.time.LocalDateTime]("last_ts")
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      }

  /** Live subscription (R1); returns the bounded queue to drain. */
  def subscribe(subscriberId: String, streamId: String, partition: Int) =
    subscriptions.subscribe(subscriberId, streamId, partition)

  /** Maintenance: merge per-batch small files of a stream-part's buckets
    * (the reference's bucket-rolling analog). Returns buckets compacted. */
  def compact(streamId: String, partition: Int): Int =
    MessageStore.compactStreamPart(spark, storePath, streamId, partition)

  /** Retention: drop buckets whose newest row is older than
    * `retentionDays` (default 365 like the reference,
    * `DeleteExpiredCmd.ts:91`). Returns dropped bucket paths. */
  def deleteExpired(retentionDays: Int = 365,
      nowMs: Long = System.currentTimeMillis()): Seq[String] =
    MessageStore.dropExpiredBuckets(spark, storePath,
      MsgRef(nowMs - retentionDays * 86400000L, 0))
}
