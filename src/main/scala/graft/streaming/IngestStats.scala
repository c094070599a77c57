package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest batch statistics (SURVEY §2.4 A10) — the reference's BatchManager
  * observability: mean batch age at commit and a bucketed batch-size
  * histogram (`src/storage/BatchManager.ts:159-202` tracks mean batch age
  * and a retry histogram; the micro-batch engine has no per-batch retries —
  * replays are whole-batch and idempotent — so the histogram buckets here
  * count batch SIZES at the same ≥5/≥10/≥100 thresholds).
  *
  * The records are the per-batch commit markers [[IngestPipeline]] already
  * writes (one small JSON file per committed batch under
  * `<checkpoint>/graft-committed/`), so the stats cost nothing extra on the
  * hot path and survive restarts with the checkpoint.
  */
object IngestStats {

  private val LogSchema =
    "batch_id LONG, rows LONG, committed_ms LONG, min_ts_ms LONG, max_ts_ms LONG"

  /** The committed-batch log as a relation. The marker directory only
    * exists after the FIRST batch commits, and a dashboard polls this at
    * startup — a missing directory is an empty log, not an error. */
  def batchLog(spark: SparkSession, checkpointPath: String): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(s"$checkpointPath/graft-committed")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(LogSchema))
    else spark.read.schema(LogSchema).json(dir.toString)
  }

  /** One-row summary: batches, rows, mean batch size, mean batch age at
    * commit (commit time minus the batch's newest message ts — the
    * freshness lag), and the ≥5/≥10/≥100 size-bucket counts. */
  def summary(spark: SparkSession, checkpointPath: String): DataFrame =
    batchLog(spark, checkpointPath).agg(
      count(lit(1)).as("n_batches"),
      sum(col("rows")).as("total_rows"),
      avg(col("rows")).as("mean_batch_rows"),
      avg(col("committed_ms") - col("max_ts_ms")).as("mean_age_ms"),
      sum(when(col("rows") >= 5, 1L).otherwise(0L)).as("batches_ge_5"),
      sum(when(col("rows") >= 10, 1L).otherwise(0L)).as("batches_ge_10"),
      sum(when(col("rows") >= 100, 1L).otherwise(0L)).as("batches_ge_100"))
}
