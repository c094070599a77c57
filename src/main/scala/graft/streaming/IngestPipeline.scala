package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup
import graft.ingest.Validate
import graft.store.MessageStore

/** The hot-path ingest pipeline (SURVEY §3.3): validated, partitioned,
  * deduplicated micro-batches appended to the bucketed [[MessageStore]].
  *
  * Mirrors the reference's publish→store chain — future-timestamp reject
  * (`Publisher.ts:35-41`), JSON validity (`Publisher.ts:46`), storage
  * assignment filter (`Storage.ts:65-69`), bucket routing
  * (`BucketManager.ts:72-97`) — with the reference's ~550 LoC of
  * batch/bucket FSMs collapsed into the micro-batch engine (S3-S5).
  *
  * Design notes for scale:
  *  - NO watermark on the persist path: the reference accepts arbitrarily
  *    late rows into historical buckets (R2); the derived bucket column
  *    routes them correctly by construction.
  *  - Dedup within each micro-batch on the uniqueness key reproduces the
  *    Cassandra primary-key upsert for intra-batch duplicates. foreachBatch
  *    is at-least-once: a crash between append and checkpoint commit
  *    replays the batch, so appends are guarded by per-batch commit
  *    markers (skip when the marker exists). The residual window — crash
  *    after append, before marker — leaves duplicates that the uniqueness
  *    key makes harmless: read paths can apply [[Dedup.ingestDedup]], the
  *    observable-semantics analog of the reference's upsert.
  *  - The assignment filter is a small broadcast set refreshed per batch —
  *    the slowly-changing-state analog of StorageConfig polling (R7).
  */
object IngestPipeline {

  /** One micro-batch through the validation/partition/dedup chain.
    * `assigned` is the optional set of "stream_id::partition" keys this
    * node stores (None ⇒ store everything). */
  def prepareBatch(
      batch: DataFrame,
      nowMs: Long,
      assigned: Option[Set[String]] = None): DataFrame = {
    // NTZ literal built directly from the UTC instant — session-timezone
    // independent (a Timestamp lit + cast would shift by the session zone)
    val now = lit(java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(nowMs), java.time.ZoneOffset.UTC))
    val validated = Validate.accepted(batch, now)
    val scoped = assigned match {
      case Some(keys) =>
        // F6 — storage-assignment filter against a broadcast-able set
        // (StorageConfig.hasStream, `src/storage/StorageConfig.ts:83-86`)
        validated.filter(
          concat_ws("::", col("stream_id"), col("stream_partition"))
            .isInCollection(keys))
      case None => validated
    }
    Dedup.ingestDedup(scoped)
  }

  /** One micro-batch commit: prepare → append → mark. The per-batch marker
    * makes replays (foreachBatch is at-least-once) idempotent — a
    * re-delivered batchId whose marker exists is skipped entirely.
    * Returns true when the batch was (newly) applied. */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      storePath: String,
      checkpointPath: String,
      assigned: () => Option[Set[String]] = () => None,
      nowMs: Long = System.currentTimeMillis(),
      onBatch: (DataFrame, Long) => Unit = (_, _) => (),
      granularityFor: Map[String, String] = Map.empty,
      widthCache: Option[MessageStore.BucketWidthCache] = None): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(
      s"$checkpointPath/graft-committed/$batchId")
    val fs = marker.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false // replay guard: already appended
    else {
      // R7: the assignment supplier is re-evaluated at each batch boundary
      // (DynamicAssignment.get) — assignment changes apply to the next
      // micro-batch without restarting the query (StorageConfig.ts:96-149)
      val prepared = prepareBatch(batch, nowMs, assigned()).cache()
      try {
        MessageStore.appendPerStream(prepared, storePath, granularityFor,
          widthCache = widthCache)
        // the marker doubles as the batch-statistics record (A10): rows,
        // commit time, and the batch's ts span — IngestStats aggregates
        // these into the BatchManager-style observability surface
        // ts is TIMESTAMP_NTZ: aggregate it as-is and convert to epoch-ms
        // driver-side with an explicit UTC interpretation — unix_millis on
        // a cast would shift with spark.sql.session.timeZone, diverging
        // from Engine.metadata's UTC-pinned conversion of the same data
        val stats = prepared.agg(
          count(lit(1)), min(col("ts")), max(col("ts"))).collect().head
        def epochMs(i: Int): Long =
          if (stats.isNullAt(i)) nowMs
          else stats.getAs[java.time.LocalDateTime](i)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        val (rows, minTs, maxTs) = (stats.getLong(0), epochMs(1), epochMs(2))
        // write-then-rename: a crash mid-write must never leave a
        // truncated marker for batchLog to parse into an all-null row
        // (the same commit-point discipline as the store's bucket swap)
        val tmp = new org.apache.hadoop.fs.Path(
          marker.getParent, "." + marker.getName + ".tmp")
        val out = fs.create(tmp, true)
        out.write(
          s"""{"batch_id":$batchId,"rows":$rows,"committed_ms":$nowMs,"min_ts_ms":$minTs,"max_ts_ms":$maxTs}"""
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        fs.delete(marker, false)
        fs.rename(tmp, marker)
        onBatch(prepared, batchId)
        true
      } finally prepared.unpersist()
    }
  }

  /** Start the streaming ingest: source → prepare → bucketed store append.
    * `onBatch` is the subscriber fan-out hook (R1) — called with each
    * prepared micro-batch so a serving layer can dispatch to live
    * subscriptions while the same rows are persisted.
    *
    * `autoCompactEvery` > 0 runs the file-count compaction policy
    * ([[MessageStore.autoCompact]]) after every Nth committed batch — the
    * ingest-cadence analog of the reference's full-bucket check timer
    * (`BucketManager.ts:48` checkFullBucketsTimeout). It runs inside
    * foreachBatch, which Structured Streaming serializes with the appends,
    * so the policy never races this query's own writer; a concurrent
    * foreign writer is handled by compaction's swap guard (it aborts, the
    * next cadence retries). */
  def start(
      source: DataFrame,
      storePath: String,
      checkpointPath: String,
      assigned: () => Option[Set[String]] = () => None,
      triggerMs: Long = 1000L,
      onBatch: (DataFrame, Long) => Unit = (_, _) => (),
      granularityFor: Map[String, String] = Map.empty,
      autoCompactEvery: Int = 0,
      maxFilesPerBucket: Int = 4,
      widthCache: Option[MessageStore.BucketWidthCache] = None): StreamingQuery = {
    // width memory: the guard lists each stream's buckets once, then
    // steady ingest checks widths in memory (zero FS listing per batch).
    // Default scope is the query, so a restart re-learns from the
    // filesystem; compaction preserves bucket names, so the in-query
    // autoCompact below never needs to invalidate it. A caller that runs
    // RETENTION beside a live ingest (GraftEngine) passes its own
    // longer-lived cache instead and invalidates dropped streams — a
    // retention-emptied day makes a width flip newly legal, which a stale
    // entry would conservatively reject.
    val cache = widthCache.getOrElse(new MessageStore.BucketWidthCache)
    source.writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val applied = processBatch(batch, batchId, storePath, checkpointPath,
          assigned, onBatch = onBatch, granularityFor = granularityFor,
          widthCache = Some(cache))
        if (applied && autoCompactEvery > 0 &&
            batchId % autoCompactEvery == (autoCompactEvery - 1).toLong)
          MessageStore.autoCompact(batch.sparkSession, storePath, maxFilesPerBucket)
        ()
      }
      .start()
  }
}
