package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.model.StreamMessage

/** Streaming metric operators (SURVEY §2.8 R4 + A9-as-stream): tumbling
  * windowed rates over the live message stream, and the EWMA fold as
  * keyed streaming state.
  *
  * These run on the METRICS path, which tolerates dropping very-late rows —
  * so a watermark bounds state here. The PERSIST path deliberately has no
  * watermark (R2: arbitrarily late rows must store; see IngestPipeline).
  */
object MetricsStream {

  /** Tumbling per-minute counts/bytes per stream-part over a streaming
    * source, with a watermark bounding window state
    * (`VolumeLogger.ts:107-125` fixed-interval reports).
    *
    * The TIMESTAMP_NTZ event time converts to the watermark's TIMESTAMP
    * by INTERVAL ARITHMETIC — epoch + (ts − ntz-epoch) — never through
    * `cast("timestamp")`, which would re-interpret the wall time in
    * `spark.sql.session.timeZone` (shifting every window boundary in a
    * non-UTC session, and merging DST-gap wall minutes), the exact
    * hazard IngestPipeline documents on the persist path. The interval
    * form pins wall-time-as-UTC in any session zone (a watermark cannot
    * ride an NTZ column directly in Spark 4). */
  def minuteRates(stream: DataFrame, watermarkDelay: String = "5 minutes"): DataFrame =
    stream
      .withColumn("ts_tz", expr(
        "timestamp'1970-01-01 00:00:00Z' + (ts - timestamp_ntz'1970-01-01 00:00:00')"))
      .withWatermark("ts_tz", watermarkDelay)
      .groupBy(
        col("stream_id"), col("stream_partition"),
        window(col("ts_tz"), "1 minute").as("win"))
      .agg(count(lit(1)).as("msgs"), sum(octet_length(col("payload"))).as("bytes"))

  /** Keyed EWMA state carried across micro-batches: per stream-part, the
    * running `0.8*avg + 0.2*x` over per-batch message counts — the
    * reference's throttledAvg as `mapGroupsWithState`
    * (`StreamMetrics.ts:7-9,133-143`).
    *
    * `backfill` is the reference's restart seeding: on startup each
    * StreamMetrics level fetches its last stored report by resend-last and
    * continues the average from there instead of resetting
    * (`StreamMetrics.ts:150-203`). Pass the last stored reports (e.g.
    * [[lastReports]] over the metrics sink) and the fold resumes exactly
    * where the previous run stopped. */
  final case class EwmaState(avg: Double, batches: Long)
  final case class EwmaReport(stream_id: String, stream_partition: Int,
      avg: Double, batches: Long)

  def ewmaPerBatch(
      stream: Dataset[StreamMessage],
      backfill: Option[Dataset[EwmaReport]] = None): Dataset[EwmaReport] = {
    import stream.sparkSession.implicits._
    val step: ((String, Int), Iterator[StreamMessage], GroupState[EwmaState]) => EwmaReport = {
      case ((sid, part), rows, state) =>
        val x = rows.size.toDouble
        val next = state.getOption match {
          case Some(EwmaState(avg, n)) => EwmaState(avg * 0.8 + x * 0.2, n + 1)
          case None                    => EwmaState(x, 1L) // seed with first value
        }
        state.update(next)
        EwmaReport(sid, part, next.avg, next.batches)
    }
    val grouped = stream.groupByKey(m => (m.stream_id, m.stream_partition))
    backfill match {
      case Some(reports) =>
        val initial = reports
          .groupByKey(r => (r.stream_id, r.stream_partition))
          .mapValues(r => EwmaState(r.avg, r.batches))
        grouped.mapGroupsWithState[EwmaState, EwmaReport](
          GroupStateTimeout.NoTimeout, initial)(step)
      case None =>
        grouped.mapGroupsWithState[EwmaState, EwmaReport](
          GroupStateTimeout.NoTimeout)(step)
    }
  }

  /** Newest stored report per stream-part — the resend-last(1) lookup the
    * reference performs per level on startup (`StreamMetrics.ts:150-203`).
    * `reports` is a batch view of the metrics sink with a `batches` column
    * ordering reports within a stream-part. */
  def lastReports(reports: Dataset[EwmaReport]): Dataset[EwmaReport] = {
    import reports.sparkSession.implicits._
    reports
      .groupByKey(r => (r.stream_id, r.stream_partition))
      .reduceGroups((a, b) => if (a.batches >= b.batches) a else b)
      .map(_._2)
  }
}
