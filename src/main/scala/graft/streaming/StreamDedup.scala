package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-batch exact dedup of a streaming document source — the "dedup the
  * live crawl before it lands" stage of a streaming training-data
  * pipeline. Intra-batch duplicates and duplicates arriving in LATER
  * micro-batches are both dropped, keyed on content hash, for as long as
  * the duplicate lands inside the watermark horizon.
  *
  * Built on `dropDuplicatesWithinWatermark`: the state store keeps one
  * 16-byte md5 entry per distinct document seen within the horizon and the
  * watermark evicts expired keys, so state is bounded by
  * (arrival rate × horizon), not by corpus history — the property that
  * lets this run forever at ingest scale. A duplicate arriving after the
  * horizon passes through; the batch-side operators
  * ([[graft.dedup.Dedup.exactDedup]], [[graft.dedup.Dedup.incrementalFlags]])
  * are the backstop that catches those at rest, exactly like the
  * store's merge-on-read backstops the at-least-once ingest path.
  *
  * Contrast with [[IngestPipeline]]: the broker persist path deliberately
  * takes NO watermark (arbitrarily late rows are accepted into historical
  * buckets, R2) — this operator is for pipelines where dropping
  * within-horizon duplicates early is worth a bounded state store.
  */
object StreamDedup {

  /** Deduplicate `docs` (streaming; needs `text` and event-time `tsCol`)
    * on exact text content within `horizon`. The first arrival of each
    * distinct text survives with all its columns plus its `content_hash`. */
  def dedupStream(docs: DataFrame, horizon: String = "1 hour",
      tsCol: String = "ts"): DataFrame =
    dedupStreamBy(docs, md5(col("text")), horizon, tsCol)

  /** Generalized variant: dedup on any derived key column — e.g. a
    * SimHash for near-dup blocking or a (stream_id, sequence_no) composite
    * for envelope replays. */
  def dedupStreamBy(docs: DataFrame, key: Column, horizon: String = "1 hour",
      tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("content_hash", key)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
