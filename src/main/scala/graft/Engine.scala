package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.BrokerQueries
import graft.operators.BrokerQueries.MsgRef
import graft.serve.{Formats, Resend, SubscriptionRegistry}
import graft.store.MessageStore
import graft.streaming.{DynamicAssignment, IngestPipeline}

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
    assigned: Option[Set[String]] = None,
    /** Per-stream bucket granularity (stream id → [[MessageStore.HourBucket]]
      * for hot streams; absent streams bucket at [[MessageStore.DayBucket]])
      * — the reference sizes buckets per stream-part volume the same way
      * (`BucketManager.ts:50-51`). Reads stay exact across any mix via
      * [[MessageStore.pruneTimeMixed]]. */
    granularityFor: Map[String, String] = Map.empty) {

  // The engine's NTZ columns carry UTC wall-clock (epoch-ms in the
  // reference); pin the session zone so TIMESTAMP casts (serve-format
  // epoch rendering, window functions) agree with that convention
  // regardless of host JVM zone.
  spark.conf.set("spark.sql.session.timeZone", "UTC")

  val subscriptions = new SubscriptionRegistry()

  /** Engine-lifetime bucket-width memory for the append guard: both write
    * paths ([[publish]] and [[startIngest]]) share it, so the guard lists
    * each stream's bucket directories once per engine instead of once per
    * append. The engine is the single writer of its store (same contract
    * as compaction), and it is also the only component that runs retention
    * — the one operation that can invalidate a width entry (an emptied day
    * makes a width flip newly legal) — so every retention entry point
    * below invalidates the dropped streams before returning. */
  private val widthCache = new MessageStore.BucketWidthCache

  /** Forget cached widths for every stream a retention sweep touched, so a
    * width flip onto a now-empty day re-learns from the filesystem instead
    * of being rejected by a stale entry. Dropped paths carry the writer's
    * escaped `stream_id=` segment; unescape or streams with reserved
    * characters ('/', '%') would silently stay cached. */
  private def invalidateDropped(dropped: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName
    dropped
      .flatMap(_.split('/').find(_.startsWith("stream_id=")))
      .map(seg => unescapePathName(seg.stripPrefix("stream_id=")))
      .distinct
      .foreach(widthCache.invalidate)
    dropped
  }

  /** R7 — live storage-assignment state: seeded from the constructor,
    * refreshed via [[updateAssignment]]; the streaming ingest re-reads it
    * every micro-batch (`StorageConfig.ts:96-149`). */
  val assignment = new DynamicAssignment(assigned)

  /** Refresh the storage assignment (polling/event-stream callback site).
    * Returns the (added, removed) stream-part delta (U2). Takes effect on
    * the next micro-batch / publish — no restart. */
  def updateAssignment(next: Option[Set[String]]): (Set[String], Set[String]) =
    assignment.update(next)

  /** The store as a relation. Only the genuinely-empty cases map to an
    * empty relation — the store not yet created, or a directory tree whose
    * data files have all been retention-dropped (schema inference finds
    * nothing). A corrupt or unreadable store (permissions, bad footers)
    * propagates its error: an unreadable store must not masquerade as an
    * empty one (reads silently answering no_resend would hide the fault). */
  def table: DataFrame = {
    def emptyRelation = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.model.StreamMessage.schema)
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) emptyRelation
    else
      // upsert view (merge-on-read): replayed publishes from later
      // micro-batches are invisible to every Engine read, matching the
      // reference's Cassandra primary-key semantics
      try MessageStore.openMerged(spark, storePath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" ||
              String.valueOf(e.getMessage).contains("Unable to infer schema") =>
          emptyRelation
      }
  }

  /** Batch publish: one prepared micro-batch through the ingest chain,
    * persisted and fanned out. Returns accepted-row count. */
  def publish(messages: DataFrame, nowMs: Long = System.currentTimeMillis()): Long = {
    val prepared = IngestPipeline.prepareBatch(messages, nowMs, assignment.get()).cache()
    try {
      val n = prepared.count()
      if (n > 0) MessageStore.appendPerStream(prepared, storePath, granularityFor,
        widthCache = Some(widthCache))
      subscriptions.dispatch(prepared, -1L)
      n
    } finally prepared.unpersist()
  }

  /** Streaming publish (the hot path). The assignment supplier is read at
    * every batch boundary, so [[updateAssignment]] reshapes a running
    * ingest without restart. */
  def startIngest(source: DataFrame, checkpointPath: String,
      triggerMs: Long = 1000L, autoCompactEvery: Int = 0): StreamingQuery =
    IngestPipeline.start(source, storePath, checkpointPath, assignment.get _,
      triggerMs, onBatch = subscriptions.dispatch,
      granularityFor = granularityFor, autoCompactEvery = autoCompactEvery,
      widthCache = Some(widthCache))

  // ---- reads (§3.1): resend envelope over the chosen format ----
  def last(streamId: String, partition: Int, n: Int,
      format: String = "object", version: Option[Int] = None): Iterator[Resend.Frame] =
    // bounded scan: newest buckets only (Storage.ts:142-181 analog)
    Resend.envelope(Formats.format(
      MessageStore.requestLastBounded(spark, storePath, streamId, partition,
        math.min(math.max(n, 0), BrokerQueries.MaxResendLast)),
      format, version))

  def from(streamId: String, partition: Int, ref: MsgRef,
      format: String = "object", version: Option[Int] = None,
      publisher: Option[String] = None): Iterator[Resend.Frame] =
    Resend.from(MessageStore.pruneTimeMixed(table, Some(ref.tsMs), None),
      streamId, partition, ref, format, version, publisher)

  def range(streamId: String, partition: Int, fromRef: MsgRef, toRef: MsgRef,
      format: String = "object", version: Option[Int] = None,
      publisher: Option[String] = None,
      msgChain: Option[String] = None): Iterator[Resend.Frame] =
    Resend.range(
      MessageStore.pruneTimeMixed(table, Some(fromRef.tsMs), Some(toRef.tsMs)),
      streamId, partition, fromRef, toRef, format, version, publisher, msgChain)

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

  /** Live subscription (R1); returns the bounded queue to drain. `format`
    * picks the delivered wire shape (object | protocol | raw). */
  def subscribe(subscriberId: String, streamId: String, partition: Int,
      format: String = "object") =
    subscriptions.subscribe(subscriberId, streamId, partition, format)

  /** Maintenance: merge per-batch small files of a stream-part's buckets
    * (the reference's bucket-rolling analog). Crashed compactions from an
    * earlier run are recovered first. Returns buckets compacted. */
  def compact(streamId: String, partition: Int): Int = {
    MessageStore.recoverCompaction(spark, storePath)
    MessageStore.compactStreamPart(spark, storePath, streamId, partition)
  }

  /** Policy-driven maintenance across the whole store: compact every
    * bucket whose per-batch file count reached `maxFilesPerBucket` (the
    * reference's size-triggered bucket rolling, `BucketManager.ts:50-51,
    * 105-107`). Run it on a maintenance cadence; buckets under the
    * threshold cost only a directory listing. Compacted buckets come out
    * replay-purged and marker-clean, so serving reads over them skip the
    * merge window. Returns buckets compacted. */
  def autoCompact(maxFilesPerBucket: Int = 4): Int =
    // recovery of crashed earlier sweeps happens inside autoCompact
    MessageStore.autoCompact(spark, storePath, maxFilesPerBucket)

  /** Retention: drop buckets whose newest row is older than
    * `retentionDays` (default 365 like the reference,
    * `DeleteExpiredCmd.ts:91`). Returns dropped bucket paths. */
  def deleteExpired(retentionDays: Int = 365,
      nowMs: Long = System.currentTimeMillis()): Seq[String] =
    invalidateDropped(MessageStore.dropExpiredBuckets(spark, storePath,
      MsgRef(nowMs - retentionDays * 86400000L, 0)))

  /** Per-stream retention (`DeleteExpiredCmd.ts:86-107`): each stream
    * expires against its own `storageDays`, defaulting like the reference
    * to 365 for streams without an explicit policy. */
  def deleteExpired(storageDays: Map[String, Int], defaultDays: Int,
      nowMs: Long): Seq[String] =
    invalidateDropped(
      MessageStore.dropExpiredBucketsPerStream(spark, storePath, streamId =>
        MsgRef(nowMs - storageDays.getOrElse(streamId, defaultDays) * 86400000L, 0)))

  /** S4 TTL sweep — the non-storage node's transient-relay window
    * (`USING TTL 259200`, `BatchManager.ts:12-14`): age-expire whole
    * buckets from directory names only (zero data I/O). Default TTL is
    * the reference's 3 days. Returns dropped bucket paths. */
  def ttlSweep(ttlSeconds: Long = 259200L,
      nowMs: Long = System.currentTimeMillis()): Seq[String] =
    invalidateDropped(MessageStore.dropAgedBuckets(spark, storePath,
      MsgRef(nowMs - ttlSeconds * 1000L, 0)))

  /** Release the engine's process-local serving resources (the
    * subscription registry handle). The SparkSession is caller-owned. */
  def close(): Unit = subscriptions.close()
}
