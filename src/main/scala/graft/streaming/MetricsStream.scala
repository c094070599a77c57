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
    * (`VolumeLogger.ts:107-125` fixed-interval reports). */
  def minuteRates(stream: DataFrame, watermarkDelay: String = "5 minutes"): DataFrame =
    stream
      .withColumn("ts_tz", col("ts").cast("timestamp"))
      .withWatermark("ts_tz", watermarkDelay)
      .groupBy(
        col("stream_id"), col("stream_partition"),
        window(col("ts_tz"), "1 minute").as("win"))
      .agg(count(lit(1)).as("msgs"), sum(octet_length(col("payload"))).as("bytes"))

  /** Keyed EWMA state carried across micro-batches: per stream-part, the
    * running `0.8*avg + 0.2*x` over per-batch message counts — the
    * reference's throttledAvg as `mapGroupsWithState`
    * (`StreamMetrics.ts:7-9,133-143`). */
  final case class EwmaState(avg: Double, batches: Long)
  final case class EwmaReport(stream_id: String, stream_partition: Int,
      avg: Double, batches: Long)

  def ewmaPerBatch(stream: Dataset[StreamMessage]): Dataset[EwmaReport] = {
    import stream.sparkSession.implicits._
    stream
      .groupByKey(m => (m.stream_id, m.stream_partition))
      .mapGroupsWithState[EwmaState, EwmaReport](GroupStateTimeout.NoTimeout) {
        case ((sid, part), rows, state: GroupState[EwmaState]) =>
          val x = rows.size.toDouble
          val next = state.getOption match {
            case Some(EwmaState(avg, n)) => EwmaState(avg * 0.8 + x * 0.2, n + 1)
            case None                    => EwmaState(x, 1L) // seed with first value
          }
          state.update(next)
          EwmaReport(sid, part, next.avg, next.batches)
      }
  }
}
