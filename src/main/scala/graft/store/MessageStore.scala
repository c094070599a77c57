package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.BrokerQueries.MsgRef

/** The physical message store: the reference's Cassandra
  * `stream_data`/`bucket` pair (`src/storage/BatchManager.ts:8-14`,
  * `BucketManager.ts:327-344`) re-expressed as a parquet table partitioned
  * by `(stream_id, stream_partition, bucket)`.
  *
  * The bucket is a derived *hour truncation of ts* (sortable string
  * partition value), which replaces the reference's stateful BucketManager
  * entirely (SURVEY §4): bucket routing is a map-stage expression, late
  * rows land in their historical bucket by construction (R2 — no watermark
  * on the persist path), and Catalyst prunes bucket directories from `ts`
  * predicates because the bucket is a monotone function of ts.
  *
  * At 100 TB: stream-part query pruning happens at the directory level
  * before any I/O; per-bucket file counts stay bounded by the ingest
  * micro-batch cadence (one file per bucket per batch per writer task);
  * retention is a metadata-only directory drop, mirroring the reference's
  * bucket-granular DELETE (`DeleteExpiredCmd.ts:135-161`).
  */
object MessageStore {

  /** Bucket granularity — like the reference's size-capped buckets
    * (100 MB / 500k records, `BucketManager.ts:50-51`), the right bucket
    * width depends on per-stream volume: day for ordinary streams, hour
    * for hot ones. Day is the default; hour-granular pruning is still
    * available through ts predicates on the row-level min/max stats. */
  val DayBucket = "yyyy-MM-dd"
  val HourBucket = "yyyy-MM-dd-HH"

  /** Bucket partition value of a message timestamp (sortable,
    * filesystem-safe). */
  def bucketOf(ts: Column, granularity: String = DayBucket): Column =
    date_format(ts, granularity)

  /** Append a message batch into the partitioned layout.
    *
    * The repartition on the partition columns is load-bearing at scale:
    * without it every write task emits a file into every bucket directory
    * (tasks × buckets small files); with it each bucket is written by
    * exactly one task — one file per bucket per batch. */
  def append(messages: DataFrame, path: String, granularity: String = DayBucket): Unit =
    messages
      .withColumn("bucket", bucketOf(col("ts"), granularity))
      .repartition(col("stream_id"), col("stream_partition"), col("bucket"))
      .write
      .partitionBy("stream_id", "stream_partition", "bucket")
      .mode("append")
      .parquet(path)

  /** Open the store (partition columns recovered from directory names). */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Inject the bucket partition predicate implied by a ts bound. Catalyst
    * does NOT infer `bucket >= trunc(from)` from `ts >= from` (the bucket
    * is our derived column), so without this a time-bounded read of a
    * year-deep stream-part still lists and footer-reads every bucket
    * directory; with it, directory-level partition pruning kicks in before
    * any I/O. The bucket value is a monotone truncation of ts, so bounding
    * by the truncated endpoints is exact: the lower bound's floor IS the
    * reference's covering-first-bucket trick (`BucketManager.ts:228-264` —
    * the bucket containing `from` can hold earlier rows, and row-level ts
    * predicates still filter inside it). */
  def pruneTime(store: DataFrame, fromMs: Option[Long], toMs: Option[Long],
      granularity: String = DayBucket): DataFrame = {
    if (!store.columns.contains("bucket")) return store
    def bucketStr(ms: Long): String = java.time.LocalDateTime
      .ofInstant(java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern(granularity))
    val b = col("bucket").cast("string")
    val lower = fromMs.map(ms => b >= bucketStr(ms))
    val upper = toMs.map(ms => b <= bucketStr(ms))
    (lower ++ upper).reduceOption(_ && _).map(store.filter).getOrElse(store)
  }

  /** The `bucket` index/statistics view (records + bytes per bucket),
    * computed from the store — SURVEY §2.4 A1-A3. */
  def bucketStats(store: DataFrame): DataFrame =
    store.groupBy(col("stream_id"), col("stream_partition"), col("bucket"))
      .agg(
        count(lit(1)).as("records"),
        sum(octet_length(col("payload"))).as("size"),
        max(col("ts")).as("max_ts"))

  /** Buckets whose MAX(ts) is older than the cutoff — the data-aware
    * expiry rule (F9, `DeleteExpiredCmd.ts:135-161`). */
  def expiredBuckets(store: DataFrame, cutoff: MsgRef): DataFrame =
    bucketStats(store)
      .filter(col("max_ts") < cutoff.ntz)
      .select(col("stream_id"), col("stream_partition"), col("bucket"))

  /** Bounded last-N over the physical layout — the reference's iterative
    * bucket expansion (`Storage.ts:142-181`): walk bucket directories
    * newest→oldest accumulating row counts (parquet metadata-only counts,
    * no data I/O) until they cover `limit`, then top-K over just those
    * buckets. A deep stream-part answers last-N from its newest buckets
    * instead of scanning years of history. Falls back to the whole part
    * when it holds fewer than `limit` rows. */
  def requestLastBounded(
      spark: SparkSession, path: String, streamId: String, partition: Int,
      limit: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    import graft.operators.BrokerQueries
    val partDir = new Path(
      s"$path/stream_id=${escapePathName(streamId)}/stream_partition=$partition")
    val fs = partDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(partDir))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.StreamMessage.schema)
    val buckets = fs.listStatus(partDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(_.getPath.toString).sorted.reverse // newest first (sortable format)
    var covered = 0L
    val needed = buckets.takeWhile { b =>
      val take = covered < limit
      if (take) covered += spark.read.parquet(b).count() // metadata-only count
      take
    }
    if (needed.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.StreamMessage.schema)
    val subset = spark.read.parquet(needed: _*)
      .withColumn("stream_id", lit(streamId))
      .withColumn("stream_partition", lit(partition))
    BrokerQueries.requestLast(subset, streamId, partition, limit)
  }

  /** Compact one stream-part's buckets: micro-batch ingest leaves one file
    * per bucket per batch, so long-lived buckets accumulate small files —
    * the engine-side analog of the reference's size-capped bucket rolling
    * (`BucketManager.ts:50-51`). Rewrites each multi-file bucket directory
    * to `targetFiles` files via a staging dir + swap. Returns the number of
    * buckets compacted. */
  def compactStreamPart(
      spark: SparkSession, path: String, streamId: String, partition: Int,
      targetFiles: Int = 1, minFiles: Int = 2): Int = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val partDir = new Path(
      s"$path/stream_id=${escapePathName(streamId)}/stream_partition=$partition")
    val fs = partDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(partDir)) return 0
    val buckets = fs.listStatus(partDir).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("bucket="))
    var compacted = 0
    buckets.foreach { b =>
      val dataFiles = fs.listStatus(b.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (dataFiles.length >= minFiles) {
        val staging = new Path(b.getPath.getParent, s".${b.getPath.getName}.compact")
        spark.read.parquet(b.getPath.toString)
          .coalesce(targetFiles)
          .write.mode("overwrite").parquet(staging.toString)
        fs.delete(b.getPath, true)
        fs.rename(staging, b.getPath)
        compacted += 1
      }
    }
    compacted
  }

  /** Retention enforcement: drop expired bucket directories (metadata-only,
    * no rewrite — the Spark analog of the reference's bucket-granular
    * delete job). Returns the dropped partition paths. */
  def dropExpiredBuckets(spark: SparkSession, path: String, cutoff: MsgRef): Seq[String] = {
    // partition directory names are escaped by the writer (e.g. '/' in a
    // stream id becomes %2F) — escape identically or deletes silently miss
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val store = open(spark, path)
    val expired = expiredBuckets(store, cutoff).collect().map { r =>
      // bucket comes back as DATE when partition type inference recognizes
      // the day format — its toString round-trips the directory value
      s"$path/stream_id=${escapePathName(r.getAs[String]("stream_id"))}" +
        s"/stream_partition=${r.getAs[Int]("stream_partition")}" +
        s"/bucket=${escapePathName(String.valueOf(r.getAs[Any]("bucket")))}"
    }.toSeq
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    expired.filter(p => fs.delete(new Path(p), true))
  }
}
