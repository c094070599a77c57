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

  /** Per-stream bucket value: hot streams get their own granularity
    * (typically [[HourBucket]]), everything else the default — the analog
    * of the reference sizing buckets per stream-part volume
    * (`BucketManager.ts:50-51` caps are per stream's live bucket). One
    * codegen'd `when` branch per DISTINCT granularity (streams of a policy
    * become an `isInCollection` set), so the expression tree is O(policies)
    * even with thousands of hot streams — a per-stream chain would rebuild
    * the giant-literal-tree problem CentroidRank exists to avoid.
    *
    * Only [[DayBucket]]/[[HourBucket]] are accepted: [[pruneTimeMixed]]'s
    * bound math and the bounded read's day-grouping are proven for exactly
    * these two widths — an unvalidated coarser pattern (e.g. month) would
    * silently prune in-range buckets. */
  def bucketOfPerStream(ts: Column, streamId: Column,
      granularityFor: Map[String, String],
      default: String = DayBucket): Column = {
    (granularityFor.values.toSet + default).foreach { g =>
      require(g == DayBucket || g == HourBucket,
        s"unsupported bucket granularity '$g' (supported: $DayBucket, $HourBucket)")
    }
    granularityFor.groupBy(_._2).toSeq.sortBy(_._1)
      .foldLeft(bucketOf(ts, default)) { case (acc, (g, entries)) =>
        when(streamId.isInCollection(entries.keys.toSeq.sorted), bucketOf(ts, g))
          .otherwise(acc)
      }
  }

  /** Driver-held (stream, UTC day) → bucket-width memory for the width
    * guard: a steady ingest query appends to the same streams batch after
    * batch, and without this every [[appendPerStream]] re-lists every
    * touched stream's bucket directories — at thousands of buckets per
    * stream that's a per-micro-batch driver FS sweep for information that
    * never changes (a day's width is fixed for its lifetime). The cache is
    * the metastore stand-in: a stream's directories are listed ONCE (on
    * its first touched batch), then every later batch checks and records
    * widths in memory — zero FS listing on the steady path.
    *
    * Staleness is one-sided by construction: entries only ever say "this
    * day holds this width", which stays true for as long as the day has
    * data. Compaction preserves bucket names, so no invalidation is
    * needed; RETENTION can empty a day (making a width flip newly legal),
    * and a stale entry then rejects that flip conservatively — call
    * [[invalidate]] for streams whose buckets were dropped (or [[clear]]
    * after a store-wide sweep) to re-learn from the filesystem. Never
    * share a cache across stores, and never use one beside a concurrent
    * foreign writer — same single-writer contract as compaction. */
  final class BucketWidthCache {
    // widths present per (stream, day): a set, so a pre-guard store that
    // already holds both widths on one day keeps failing appends of
    // either width exactly like the filesystem check would
    private val known =
      scala.collection.mutable.Map[(String, String), Set[String]]()
    private val listed = scala.collection.mutable.Set[String]()
    private[store] def widthsOf(stream: String, day: String): Set[String] =
      synchronized(known.getOrElse((stream, day), Set.empty))
    private[store] def isListed(stream: String): Boolean =
      synchronized(listed.contains(stream))
    private[store] def putListing(stream: String,
        widths: Map[String, Set[String]]): Unit = synchronized {
      widths.foreach { case (d, ws) =>
        known((stream, d)) = known.getOrElse((stream, d), Set.empty) ++ ws
      }
      listed += stream
    }
    private[store] def record(stream: String, day: String, width: String): Unit =
      synchronized {
        known((stream, day)) = known.getOrElse((stream, day), Set.empty) + width
        listed += stream
      }
    /** Forget one stream (call after retention dropped its buckets). */
    def invalidate(stream: String): Unit = synchronized {
      listed -= stream
      known.filterInPlace { case ((s, _), _) => s != stream }
    }
    /** Forget everything (call after a store-wide retention sweep). */
    def clear(): Unit = synchronized { known.clear(); listed.clear() }
  }

  /** Append a message batch into the partitioned layout.
    *
    * The repartition on the partition columns is load-bearing at scale:
    * without it every write task emits a file into every bucket directory
    * (tasks × buckets small files); with it each bucket is written by
    * exactly one task — one file per bucket per batch. */
  def append(messages: DataFrame, path: String, granularity: String = DayBucket,
      widthCache: Option[BucketWidthCache] = None): Unit = {
    require(granularity == DayBucket || granularity == HourBucket,
      s"unsupported bucket granularity '$granularity' (supported: $DayBucket, $HourBucket)")
    // same width guard as appendPerStream — without it this entrypoint
    // could still write a second width onto an occupied day (free on a
    // fresh store: the guard returns before any job when no root exists)
    val touched = requireConsistentWidths(messages, path, Map.empty, granularity, widthCache)
    appendWith(messages, path, bucketOf(col("ts"), granularity))
    widthCache.foreach(c => touched.foreach { case (s, d) => c.record(s, d, granularity) })
  }

  /** [[append]] with per-stream bucket granularity (see
    * [[bucketOfPerStream]]). Pass a [[BucketWidthCache]] from a long-lived
    * ingest query so the width guard stops re-listing bucket directories
    * on every micro-batch. */
  def appendPerStream(messages: DataFrame, path: String,
      granularityFor: Map[String, String],
      default: String = DayBucket,
      widthCache: Option[BucketWidthCache] = None): Unit = {
    val touched =
      requireConsistentWidths(messages, path, granularityFor, default, widthCache)
    appendWith(messages, path,
      bucketOfPerStream(col("ts"), col("stream_id"), granularityFor, default))
    widthCache.foreach(c => touched.foreach { case (s, d) =>
      c.record(s, d, granularityFor.getOrElse(s, default))
    })
  }

  /** Replay dedup is bucket-local — [[openMerged]] keys the merge window on
    * uniqueKey + bucket, and the clean-marker fast paths skip the window
    * entirely — so a key replayed AFTER its stream flips day↔hour would
    * land in a different-width bucket than its original row and survive as
    * a permanent duplicate that bucket-local compaction can never purge.
    * Guard: a (stream, UTC day) holds exactly ONE bucket width for its
    * lifetime; an append whose rows would put the other width onto a day
    * that already has data is rejected before any file lands. Forward-only
    * migration stays legal (flip a stream's width starting from a day with
    * no data yet). Cost per micro-batch: one distinct aggregate over the
    * batch (streams × days — micro-batch-bounded) plus a bucket listing of
    * just the affected stream directories, the same metadata sweep
    * [[openMerged]] performs — and with a [[BucketWidthCache]] the listing
    * happens once per stream per query lifetime instead of per batch.
    * Returns the batch's touched (stream, day) pairs so the caller can
    * record them into the cache after the append lands. */
  private def requireConsistentWidths(messages: DataFrame, path: String,
      granularityFor: Map[String, String], default: String,
      cache: Option[BucketWidthCache] = None): Array[(String, String)] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val spark = messages.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootExists = fs.exists(root)
    // fresh store with no cache to feed: nothing to conflict with, and the
    // early return keeps this entry point zero-job (with a cache, the
    // touched aggregate still runs once so the batch's days get recorded)
    if (!rootExists && cache.isEmpty) return Array.empty
    val touched = messages
      .select(col("stream_id"), date_format(col("ts"), DayBucket).as("day"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    def nameWidth(b: String): String = if (b.length == 10) DayBucket else HourBucket
    val conflicts = touched.groupBy(_._1).flatMap { case (stream, days) =>
      val width = granularityFor.getOrElse(stream, default)
      cache match {
        // warm path: the stream's directory widths are already in memory —
        // no filesystem access at all
        case Some(c) if c.isListed(stream) =>
          days.map(_._2).toSeq.flatMap { d =>
            c.widthsOf(stream, d).filter(_ != width)
              .map(w => s"$stream day $d already holds buckets of width " +
                s"'$w' (cached listing)")
          }
        case _ =>
          if (!rootExists) Nil
          else {
            val streamDir = new Path(root, s"stream_id=${escapePathName(stream)}")
            if (!fs.exists(streamDir)) {
              cache.foreach(_.putListing(stream, Map.empty))
              Nil
            } else {
              // bucket name widths present per day, across all partitions of
              // the stream: day names are 10 chars, hour names 13
              val existing = (for {
                part <- fs.listStatus(streamDir) if part.isDirectory
                b <- fs.listStatus(part.getPath)
                if b.isDirectory && b.getPath.getName.startsWith("bucket=")
              } yield b.getPath.getName.stripPrefix("bucket=")).toSeq
              // the one listing feeds the cache with EVERY day's widths, so
              // later batches touching other days of this stream stay warm
              cache.foreach(_.putListing(stream,
                existing.groupBy(_.take(10))
                  .map { case (d, bs) => d -> bs.map(nameWidth).toSet }))
              val daySet = days.map(_._2).toSet
              existing.filter(b => daySet.contains(b.take(10)) &&
                  (b.length == 10) != (width == DayBucket))
                .map(b => s"$stream day ${b.take(10)} already holds " +
                  s"bucket '$b' of the other width")
            }
          }
      }
    }
    if (conflicts.nonEmpty)
      throw new IllegalStateException(
        "bucket-width conflict: replay dedup is bucket-local, so writing a " +
          "second width into a day that already has data would make any " +
          "replayed key a permanent duplicate. Re-append with the day's " +
          "original granularity (width flips apply to NEW days only). " +
          conflicts.mkString("; "))
    touched
  }

  private def appendWith(messages: DataFrame, path: String, bucket: Column): Unit =
    messages
      .withColumn("bucket", bucket)
      // explicit partition count: the keyed repartition alone lets AQE
      // coalesce this small exchange to a handful of tasks, and each
      // write task then creates its partition DIRECTORIES serially — r18
      // event logs showed the sf0.1 append collapsed to 6 tasks spending
      // 8s wall / 3s CPU on ~1,200 dir+file creations. Pinning the count
      // to defaultParallelism keeps one file per bucket dir (the keyed
      // hash still routes a bucket to one task) while spreading the
      // filesystem work across the cluster width — scale-adaptive, not a
      // local[32] constant.
      .repartition(messages.sparkSession.sparkContext.defaultParallelism,
        col("stream_id"), col("stream_partition"), col("bucket"))
      .write
      .partitionBy("stream_id", "stream_partition", "bucket")
      .mode("append")
      .parquet(path)

  /** Open the store (partition columns recovered from directory names). */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Open the store with upsert semantics — the read-side half of the
    * reference's Cassandra primary-key upsert: the store is append-only,
    * so a message republished in a LATER micro-batch (same uniqueness key)
    * lands as a second physical row; this view merges replays away exactly
    * like Cassandra's merge-on-read, and [[compactStreamPart]] purges them
    * physically (the sstable-compaction analog), making the merge window
    * cheap again. The one-shuffle window is the price of upsert-exact
    * answers; scans that tolerate at-least-once duplicates (e.g. byte-rate
    * monitoring) can read [[open]] directly. The window's partition key is
    * the uniqueness key PLUS the bucket column: bucket is a function of ts
    * (constant within every uniqueness group, so grouping is unchanged),
    * and listing it as a partition key is what lets [[pruneTime]]'s bucket
    * predicate push below the window to the directory-pruning scan —
    * Catalyst cannot infer that itself. */
  def openMerged(spark: SparkSession, path: String): DataFrame = {
    val store = open(spark, path)
    if (!store.columns.contains("bucket"))
      return graft.dedup.Dedup.ingestDedup(store, graft.model.StreamMessage.uniqueKey)
    val key = graft.model.StreamMessage.uniqueKey :+ "bucket"
    // Replays can only exist in buckets that received appends after their
    // last compaction ([[compactBucket]] purges them and stamps a _clean
    // marker recording the committed file count — any later append changes
    // the count and voids the marker). Split the scan: clean buckets read
    // window-free, only dirty buckets pay the merge shuffle — so the
    // steady post-compaction state serves at plain-scan cost, the engine
    // analog of Cassandra upserts being free after sstable compaction.
    // The cleanliness sweep is driver-side FS metadata, the same listing
    // Spark's file index performs for any read; a production deployment
    // would serve it from the manifest/metastore instead.
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (clean, dirty) = bucketDirs(fs, new Path(path))
      .partition(b => isCleanBucket(fs, b))
    if (dirty.isEmpty && clean.nonEmpty) return store
    if (clean.isEmpty) return graft.dedup.Dedup.ingestDedup(store, key)
    val base = spark.read.option("basePath", path)
    val cleanScan = base.parquet(clean.map(_.toString): _*)
    val mergedScan = graft.dedup.Dedup.ingestDedup(
      base.parquet(dirty.map(_.toString): _*), key)
    cleanScan.unionByName(mergedScan)
  }

  /** Marker file a committed compaction stamps into its bucket directory:
    * holds the parquet-file count at commit, so validity is checkable from
    * one directory listing (appends after compaction add files and void
    * the marker). Underscore-prefixed — parquet readers skip it. */
  val CleanMarker = "_clean"

  private def parquetFileCount(fs: org.apache.hadoop.fs.FileSystem,
      bucket: Path): Int =
    fs.listStatus(bucket)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))

  /** `fileCount` is the parquet-file count of the STAGING directory,
    * captured before the swap: staging is private to the compaction, so
    * the count cannot fold in a concurrent append — listing the live
    * bucket after the swap could, and would stamp a dirty bucket clean. */
  private def writeCleanMarker(fs: org.apache.hadoop.fs.FileSystem,
      bucket: Path, fileCount: Int): Unit = {
    val out = fs.create(new Path(bucket, CleanMarker), true)
    try out.write(String.valueOf(fileCount).getBytes("UTF-8"))
    finally out.close()
  }

  /** True when the bucket's `_clean` marker exists and still matches the
    * directory's parquet-file count — i.e. no append since the marker was
    * stamped. One directory listing (marker presence and file count come
    * from the same listStatus) plus the marker read when present;
    * conservative on any read failure. */
  private[store] def isCleanBucket(fs: org.apache.hadoop.fs.FileSystem,
      bucket: Path): Boolean =
    try {
      val entries = fs.listStatus(bucket)
      val hasMarker = entries.exists(f => f.isFile && f.getPath.getName == CleanMarker)
      if (!hasMarker) false
      else {
        val files = entries
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        val in = fs.open(new Path(bucket, CleanMarker))
        val recorded =
          try new String(in.readAllBytes(), "UTF-8").trim.toIntOption
          finally in.close()
        recorded.contains(files)
      }
    } catch { case _: java.io.IOException => false }

  /** All live bucket directories under the store root. */
  private def bucketDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[Path] =
    (for {
      stream <- fs.listStatus(root) if stream.isDirectory
      if stream.getPath.getName.startsWith("stream_id=")
      part <- fs.listStatus(stream.getPath) if part.isDirectory
      bucket <- fs.listStatus(part.getPath)
      if bucket.isDirectory && bucket.getPath.getName.startsWith("bucket=")
    } yield bucket.getPath).toSeq

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
    val b = col("bucket").cast("string")
    val lower = fromMs.map(ms => b >= bucketStr(ms, granularity))
    val upper = toMs.map(ms => b <= bucketStr(ms, granularity))
    (lower ++ upper).reduceOption(_ && _).map(store.filter).getOrElse(store)
  }

  /** [[pruneTime]] that is exact for ANY per-stream mix of day and hour
    * buckets in one store: the lower bound is floored to the coarsest
    * granularity (a day name is ≤ all its hour names, so every bucket that
    * can hold rows ≥ from survives) and the upper bound rendered in the
    * finest (a day name is a proper prefix of its hour names, so the
    * boundary day's bucket of either width survives while whole hour
    * buckets past `to` still prune). Costs at most one extra day of hour
    * buckets at the lower edge versus granularity-exact pruning; row-level
    * ts predicates keep the answer exact either way. */
  def pruneTimeMixed(store: DataFrame, fromMs: Option[Long],
      toMs: Option[Long]): DataFrame = {
    if (!store.columns.contains("bucket")) return store
    val b = col("bucket").cast("string")
    val lower = fromMs.map(ms => b >= bucketStr(ms, DayBucket))
    val upper = toMs.map(ms => b <= bucketStr(ms, HourBucket))
    (lower ++ upper).reduceOption(_ && _).map(store.filter).getOrElse(store)
  }

  private def bucketStr(ms: Long, granularity: String): String =
    java.time.LocalDateTime
      .ofInstant(java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern(granularity))

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
    * bucket expansion (`Storage.ts:142-181`): per-bucket row counts decide
    * how many newest buckets cover `limit`, then top-K over just those
    * buckets. A deep stream-part answers last-N from its newest buckets
    * instead of scanning years of history. Falls back to the whole part
    * when it holds fewer than `limit` rows.
    *
    * All bucket counts come from ONE distributed job (a groupBy on the
    * `bucket` partition column reads parquet footers only — no data
    * pages); the earlier shape launched one serial driver-side count job
    * per bucket, which a sparse stream-part spanning hundreds of buckets
    * paid as hundreds of sequential job launches. */
  def requestLastBounded(
      spark: SparkSession, path: String, streamId: String, partition: Int,
      limit: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.{escapePathName, unescapePathName}
    import graft.operators.BrokerQueries
    val partDir = new Path(
      s"$path/stream_id=${escapePathName(streamId)}/stream_partition=$partition")
    val fs = partDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def emptyRelation = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.model.StreamMessage.schema)
    if (!fs.exists(partDir)) return emptyRelation
    val bucketDirs = fs.listStatus(partDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(p => unescapePathName(p.getPath.getName.stripPrefix("bucket=")) ->
        p.getPath.toString)
      .toMap
    if (bucketDirs.isEmpty) return emptyRelation
    // one job: per-bucket counts, newest first (bucket format is sortable)
    val counts = spark.read.parquet(partDir.toString)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1))
    // coverage selection works in whole UTC days (the first 10 chars of
    // either bucket format): when a stream's granularity changed mid-day,
    // a day bucket and that day's hour buckets coexist and overlap in
    // time, so name order between them is NOT newest-first — selecting a
    // whole day at a time keeps the expansion exact for any mix (a
    // pure-hour tail day just reads its few extra hour buckets)
    val dayGroups = counts.groupBy(_._1.take(10)).toSeq
      .sortBy(_._1)(Ordering[String].reverse)
    var covered = 0L
    val needed = dayGroups.takeWhile { case (_, bs) =>
      val take = covered < limit
      if (take) covered += bs.map(_._2).sum
      take
    }.flatMap(_._2).flatMap { case (b, _) => bucketDirs.get(b) }
    if (needed.isEmpty) return emptyRelation
    // result rows are clamped to MaxResendLast (10k) by contract, so the
    // answer is collected once — the widen check below would otherwise
    // re-execute the whole dedup+top-K job when the caller consumes the
    // returned frame (count + lazy re-read = 2× the serving latency)
    def lastOver(paths: Seq[String]): Array[org.apache.spark.sql.Row] = {
      // compacted buckets hold no replays (marker voided by any append), so
      // a read covered entirely by clean buckets skips the dedup window —
      // the common steady-state serve is scan + top-K only. An append
      // landing between this sweep and plan execution could put a replay
      // into a scan already planned window-free: accepted as
      // eventual-consistency for serving reads — the same read raced
      // against the append could equally have run a moment earlier and
      // missed the row entirely, and the duplicate is gone on the next
      // read (the marker is void from then on). Readers that need
      // serialized exactness take [[openMerged]]'s always-merged path.
      val dedup = !paths.forall(p => isCleanBucket(fs, new Path(p)))
      boundedLastPlan(spark, paths, streamId, partition, limit, dedup).collect()
    }
    val res = lastOver(needed.toIndexedSeq)
    // physical per-bucket counts over-count replayed rows, so the covering
    // buckets can hold fewer UNIQUE rows than `limit`; widen to the whole
    // part in that (rare — only with replays in the tail buckets) case
    val clamped = math.min(math.max(limit, 0), BrokerQueries.MaxResendLast)
    val rows =
      if (needed.length < bucketDirs.size && res.length < clamped)
        lastOver(bucketDirs.values.toIndexedSeq)
      else res
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      if (rows.isEmpty) graft.model.StreamMessage.schema else rows.head.schema)
  }

  /** The dedup+top-K plan [[requestLastBounded]] executes over its covering
    * bucket directories — extracted so the plan contract can be asserted on
    * the REAL physical read path (the bounded read collects eagerly, so its
    * returned relation is driver-local and plan-opaque). */
  private[graft] def boundedLastPlan(
      spark: SparkSession, paths: Seq[String], streamId: String,
      partition: Int, limit: Int, dedup: Boolean = true): DataFrame = {
    import graft.operators.BrokerQueries
    val subset = spark.read.parquet(paths: _*)
      .withColumn("stream_id", lit(streamId))
      .withColumn("stream_partition", lit(partition))
      // canonical column order: the empty-store early returns use
      // StreamMessage.schema, so the non-empty path must not leak the
      // parquet read order (data columns first, stream-part appended)
      .select(graft.model.StreamMessage.schema.fieldNames.map(col(_)): _*)
    // merge-on-read (see [[openMerged]]): replayed publishes collapse to
    // one logical row before the top-K; skipped when every covering bucket
    // is marker-clean (no replays can exist)
    BrokerQueries.requestLast(
      if (dedup) graft.dedup.Dedup.ingestDedup(subset) else subset,
      streamId, partition, limit)
  }

  /** Compact one stream-part's buckets: micro-batch ingest leaves one file
    * per bucket per batch, so long-lived buckets accumulate small files —
    * the engine-side analog of the reference's size-capped bucket rolling
    * (`BucketManager.ts:50-51`). Rewrites each multi-file bucket directory
    * to `targetFiles` files, purging cross-batch replay duplicates in the
    * same rewrite (the sstable-compaction half of the upsert contract —
    * [[openMerged]] is the merge-on-read half; a replayed key's ts lands it
    * in the same bucket as the original, so bucket-local dedup on the
    * within-bucket key `(ts, sequence_no, publisher_id, msg_chain_id)` is
    * exact). Returns the number of buckets compacted.
    *
    * Crash-safe, and defensive against a concurrent writer (though
    * compaction is designed to run from the maintenance path, not to race
    * an active ingest — schedule it off-peak or per idle stream-part):
    *  - the staged file set is re-checked after the staging write AND
    *    re-verified from the trash directory after the rename(live→trash)
    *    — the rename is the commit point, so a file that slipped in
    *    between check and rename is detected and the bucket is restored,
    *    never deleted;
    *  - rename(staging→live) runs only when the live path is absent (a
    *    Hadoop rename onto an existing directory would nest the source
    *    inside it); if a concurrent writer recreated the live dir, the
    *    original files are moved back file-by-file (part-file names are
    *    globally unique) and the compaction aborts;
    *  - the swap order rename(live→trash), rename(staging→live),
    *    delete(trash) keeps committed data live-or-recoverable at every
    *    instant; [[recoverCompaction]] sweeps leftover hidden dirs on the
    *    next maintenance run. */
  def compactStreamPart(
      spark: SparkSession, path: String, streamId: String, partition: Int,
      targetFiles: Int = 1, minFiles: Int = 2): Int = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val partDir = new Path(
      s"$path/stream_id=${escapePathName(streamId)}/stream_partition=$partition")
    val fs = partDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(partDir)) return 0
    // every compaction entry point recovers crash states first (the
    // policy sweep and Engine.compact used to compensate caller-side;
    // a hidden-live or blocked-trash bucket must never silently skip)
    recoverCompaction(spark, path)
    val buckets = fs.listStatus(partDir).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("bucket="))
    buckets.count(b => compactBucket(spark, fs, b.getPath, targetFiles, minFiles))
  }

  /** Policy-driven compaction across the whole store: compact exactly the
    * buckets whose accumulated per-batch file count reached
    * `maxFilesPerBucket` — the maintenance-side analog of the reference's
    * size-triggered bucket rolling (`BucketManager.ts:50-51` caps a bucket
    * at 100 MB / 500k records and rolls it when `incrementBucket` pushes it
    * past the cap, `BucketManager.ts:105-107`). The trigger here is file
    * count, not bytes, because micro-batch ingest makes files-per-bucket
    * the cost that actually grows (one file per batch): reads pay per-file
    * open/footer overhead, so the policy bounds exactly that. The sweep is
    * pure filesystem metadata — no data reads for buckets under the
    * threshold. Returns the number of buckets compacted. */
  def autoCompact(spark: SparkSession, path: String,
      maxFilesPerBucket: Int = 4, targetFiles: Int = 1): Int = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    // a crashed earlier sweep leaves buckets in swap states that both hide
    // rows (live renamed to .trash) and block all future compaction of the
    // bucket (the !exists(trash) guard) — every policy entry point must
    // recover first; recovery is idempotent and metadata-only when clean
    recoverCompaction(spark, path)
    bucketDirs(fs, root).count { b =>
      parquetFileCount(fs, b) >= maxFilesPerBucket &&
        compactBucket(spark, fs, b, targetFiles, minFiles = maxFilesPerBucket)
    }
  }

  /** One bucket's dedup-rewrite + crash-safe swap (see [[compactStreamPart]]
    * for the protocol contract). Returns true when the swap committed. */
  private def compactBucket(
      spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem, bucket: Path,
      targetFiles: Int, minFiles: Int): Boolean = {
    def dataFiles = fs.listStatus(bucket)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen)).toSet
    val staged = dataFiles
    if (staged.size < minFiles) return false
    val staging = new Path(bucket.getParent, s".${bucket.getName}.compact")
    val trash = new Path(bucket.getParent, s".${bucket.getName}.trash")
    fs.delete(staging, true) // stale staging from an earlier crash
    val bucketRows = spark.read.parquet(bucket.toString)
    // stream_id/stream_partition are directory levels here, constant
    // within the bucket — the remaining uniqueness-key columns suffice
    graft.dedup.Dedup.ingestDedup(bucketRows,
      graft.model.StreamMessage.uniqueKey.filter(bucketRows.columns.contains))
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(staging.toString)
    val stagedOut = parquetFileCount(fs, staging)
    // concurrent-append guard: only swap if the live file set is
    // exactly what was staged
    if (dataFiles == staged && !fs.exists(trash) &&
        fs.rename(bucket, trash)) {
      // the rename is the commit point — re-verify from the trash side
      // that nothing landed between the re-check and the rename
      val trashed = fs.listStatus(trash)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => (f.getPath.getName, f.getLen)).toSet
      // swap-in precondition: live must be absent (rename onto an
      // existing dir would nest staging inside it)
      if (trashed == staged && !fs.exists(bucket) &&
          fs.rename(staging, bucket)) {
        // TOCTOU re-check: a writer recreating live between the exists
        // check and the rename makes Hadoop nest staging INSIDE the new
        // live dir (rename still returns true). Verify the swap landed
        // flat before the trash delete — that delete is the only
        // destructive step. Restore order matters for crash recovery:
        // originals back first, THEN drop the nested copy (so a
        // leftover nested dir always means originals are already live,
        // which is what recoverCompaction assumes).
        val nested = new Path(bucket, staging.getName)
        if (fs.exists(nested)) {
          restoreBucket(fs, trash, bucket)
          fs.delete(nested, true)
          false
        } else {
          fs.delete(trash, true)
          // swap committed: the bucket now holds exactly the dedup-rewritten
          // files — stamp it clean so reads skip the merge window until the
          // next append (a crash before the stamp just leaves the bucket
          // conservatively unclean; an append racing the stamp voids it by
          // count mismatch because the count is the pre-swap staging one)
          writeCleanMarker(fs, bucket, stagedOut)
          true
        }
      } else {
        // late append detected, live dir recreated by a concurrent
        // writer, or swap-in failed: restore originals and abort
        restoreBucket(fs, trash, bucket)
        fs.delete(staging, true)
        false
      }
    } else { fs.delete(staging, true); false } // bucket changed mid-compact
  }

  /** Put a trashed bucket back: whole-dir rename when the live path is
    * free (atomic), else file-by-file moves into the recreated live dir —
    * part-file names are globally unique, so nothing can collide with what
    * a concurrent writer added. */
  private def restoreBucket(fs: org.apache.hadoop.fs.FileSystem,
      trash: Path, live: Path): Unit = {
    if (!fs.exists(live) && fs.rename(trash, live)) return
    if (fs.exists(trash)) {
      fs.listStatus(trash).filter(_.isFile).foreach { f =>
        fs.rename(f.getPath, new Path(live, f.getPath.getName))
      }
      fs.delete(trash, true)
    }
  }

  /** Recover buckets left in a crashed-compaction state. Per bucket, the
    * surviving (live, `.trash`, `.compact`, nested-`.compact`) combination
    * identifies exactly where the crash fell in [[compactStreamPart]]'s
    * swap protocol, and each state has one safe action:
    *  - live missing, trash/compact twin present → rename the twin back in
    *    (trash preferred — it is the pre-compaction original; a `.compact`
    *    twin is equivalent rows);
    *  - live recreated by a concurrent writer while originals sat in trash
    *    (trash + part-level `.compact`, or trash + a `.compact` dir nested
    *    INSIDE live by the rename race) → merge the trashed originals back
    *    file-by-file (part-file names are globally unique), then drop the
    *    staged copy;
    *  - live present with only a trash twin and no staged copy anywhere →
    *    the compacted swap committed and only the trash delete was lost:
    *    drop the trash (its rows are equivalent to the live compacted
    *    files);
    *  - a nested `.compact` with no trash → originals were already
    *    restored (compactStreamPart restores before dropping the nested
    *    copy, in that order precisely so this state is unambiguous): drop
    *    the nested dir.
    * Returns recovered/restored live bucket paths. Idempotent; run
    * before/after compaction sweeps. */
  def recoverCompaction(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val recovered = scala.collection.mutable.ArrayBuffer[String]()
    for {
      stream <- fs.listStatus(root) if stream.isDirectory
      part <- fs.listStatus(stream.getPath) if part.isDirectory
      hidden <- fs.listStatus(part.getPath)
      name = hidden.getPath.getName
      if hidden.isDirectory && name.startsWith(".bucket=")
    } {
      val live = new Path(part.getPath,
        name.stripPrefix(".").stripSuffix(".trash").stripSuffix(".compact"))
      if (!fs.exists(live)) {
        // crash window: restore committed data, trash preferred — it is
        // the pre-compaction original, and may hold a file a concurrent
        // writer slipped in after staging that the .compact copy lacks.
        // The preference must be enforced HERE, not left to listing
        // order: '.compact' lists before '.trash', and renaming the
        // staged copy first would make the later .trash iteration read
        // "swap committed" and delete the originals.
        val trashTwin = new Path(part.getPath,
          name.stripSuffix(".compact") + ".trash")
        if (name.endsWith(".compact") && fs.exists(trashTwin)) {
          if (fs.rename(trashTwin, live)) {
            fs.delete(hidden.getPath, true)
            recovered += live.toString
          }
        } else if (fs.rename(hidden.getPath, live)) recovered += live.toString
      } else if (name.endsWith(".trash")) {
        val stagedFlat = new Path(part.getPath, s"$name".stripSuffix(".trash") + ".compact")
        val stagedNested = new Path(live, stagedFlat.getName)
        if (fs.exists(stagedFlat) || fs.exists(stagedNested)) {
          // writer recreated live mid-swap: live holds only the writer's
          // new files — merge the originals back, then drop staged copies.
          // The merge can also REINTRODUCE rows a committed compaction had
          // already purged (a stale trash from a pre-delete crash beside a
          // later run's staging is indistinguishable from this state), so
          // always dedup-rewrite the merged bucket: duplicates can never
          // survive recovery, whichever history produced the state.
          restoreBucket(fs, hidden.getPath, live)
          fs.delete(stagedFlat, true)
          fs.delete(stagedNested, true)
          compactBucket(spark, fs, live, targetFiles = 1, minFiles = 1)
          recovered += live.toString
        } else {
          // flat swap committed (live IS the compacted rows); only the
          // trash delete was lost
          fs.delete(hidden.getPath, true)
        }
      } else {
        // pre-swap .compact leftover — but when a sibling .trash exists it
        // is this bucket's disambiguation signal (writer-recreated-live vs
        // committed-swap), so leave both for the .trash branch to resolve
        // regardless of listing order
        val trashTwin = new Path(part.getPath,
          name.stripSuffix(".compact") + ".trash")
        if (!fs.exists(trashTwin)) fs.delete(hidden.getPath, true)
      }
    }
    // nested staging dirs with no part-level trash: originals are already
    // restored (see compactStreamPart's restore-then-delete order) — sweep
    for {
      stream <- fs.listStatus(root) if stream.isDirectory
      part <- fs.listStatus(stream.getPath) if part.isDirectory
      bucket <- fs.listStatus(part.getPath)
      if bucket.isDirectory && bucket.getPath.getName.startsWith("bucket=")
      nested <- fs.listStatus(bucket.getPath)
      if nested.isDirectory && nested.getPath.getName.startsWith(".bucket=")
    } fs.delete(nested.getPath, true)
    recovered.toSeq
  }

  /** Retention enforcement: drop expired bucket directories (metadata-only,
    * no rewrite — the Spark analog of the reference's bucket-granular
    * delete job). Returns the dropped partition paths. */
  def dropExpiredBuckets(spark: SparkSession, path: String, cutoff: MsgRef): Seq[String] =
    dropExpiredBucketsPerStream(spark, path, _ => cutoff)

  /** Per-stream retention (`DeleteExpiredCmd.ts:86-107`): each stream's
    * buckets expire against that stream's own cutoff (the reference reads
    * `storageDays` per stream, defaulting 365). The expiry rule stays
    * data-aware — a bucket is dropped only when its MAX(ts) is older than
    * its stream's cutoff — and the cutoff lookup happens driver-side on
    * the already-aggregated bucket stats (one row per bucket), so the
    * distributed work is independent of how many streams have custom
    * retention. */
  def dropExpiredBucketsPerStream(
      spark: SparkSession, path: String, cutoffFor: String => MsgRef): Seq[String] = {
    // partition directory names are escaped by the writer (e.g. '/' in a
    // stream id becomes %2F) — escape identically or deletes silently miss
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val store = open(spark, path)
    val stats = bucketStats(store)
      .select(col("stream_id"), col("stream_partition"), col("bucket"), col("max_ts"))
      .collect()
    val expired = stats.filter { r =>
      val cutoffMs = cutoffFor(r.getAs[String]("stream_id")).tsMs
      r.getAs[java.time.LocalDateTime]("max_ts")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli < cutoffMs
    }.map { r =>
      // bucket comes back as DATE when partition type inference recognizes
      // the day format — its toString round-trips the directory value
      s"$path/stream_id=${escapePathName(r.getAs[String]("stream_id"))}" +
        s"/stream_partition=${r.getAs[Int]("stream_partition")}" +
        s"/bucket=${escapePathName(String.valueOf(r.getAs[Any]("bucket")))}"
    }.toSeq
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    expired.filter(p => fs.delete(new Path(p), true))
  }

  /** Age-based bucket drop — the S4 TTL analog (`USING TTL 259200`,
    * `src/storage/BatchManager.ts:12-14`): a non-storage node keeps only a
    * transient relay window, expiring data by AGE rather than per-stream
    * retention policy. The decision is made purely from the bucket
    * directory name (the bucket value is the hour/day truncation of the
    * data's ts), so the sweep is pure filesystem metadata — zero reads.
    * Late-arriving rows land in old buckets and therefore expire earlier
    * than wall-clock TTL would — acceptable for the transient-relay use
    * the reference puts TTL writes to. Returns dropped bucket paths. */
  def dropAgedBuckets(
      spark: SparkSession, path: String, cutoff: MsgRef,
      granularity: String = DayBucket): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    // each bucket expires against ITS OWN width, parsed from the name
    // (day names are 10 chars, hour names 13): a bucket is deletable iff
    // every instant it can contain is before the cutoff, i.e. its
    // EXCLUSIVE end <= cutoff. A single-granularity name comparison is
    // unsound in a per-stream mixed store — a day name is a PREFIX of its
    // hour names, so "2024-01-15" < "2024-01-15-15" would delete a day
    // bucket whose tail rows are younger than an intra-day cutoff (the
    // hazard pruneTimeMixed handles on the read path). `granularity` is
    // retained for signature stability; the width decision is per name.
    // total on malformed input: a right-length-but-unparseable name (a
    // corrupted directory, a foreign file) is SKIPPED like wrong-length
    // names are, never deletes, never aborts the sweep mid-way
    def bucketEndMs(bucketName: String): Option[Long] = {
      val fmt = if (bucketName.length == 13) HourBucket
        else if (bucketName.length == 10) DayBucket
        else return None
      scala.util.Try {
        val start = java.time.LocalDateTime.parse(
          bucketName + (if (fmt == DayBucket) "-00" else ""),
          java.time.format.DateTimeFormatter.ofPattern(HourBucket))
        val end = if (fmt == DayBucket) start.plusDays(1) else start.plusHours(1)
        end.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }.toOption
    }
    val dropped = for {
      stream <- fs.listStatus(root) if stream.isDirectory
      part <- fs.listStatus(stream.getPath) if part.isDirectory
      bucket <- fs.listStatus(part.getPath)
      name = bucket.getPath.getName
      if bucket.isDirectory && name.startsWith("bucket=")
      end <- bucketEndMs(name.stripPrefix("bucket="))
      if end <= cutoff.tsMs
      if fs.delete(bucket.getPath, true)
    } yield bucket.getPath.toString
    dropped.toSeq
  }
}
