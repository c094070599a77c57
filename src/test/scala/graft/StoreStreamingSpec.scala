package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.StreamMessage
import graft.operators.BrokerQueries
import graft.operators.BrokerQueries.MsgRef
import graft.store.MessageStore
import graft.streaming.IngestPipeline

class StoreStreamingSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("store roundtrip: bucket layout, late data routed to historical bucket") {
    val path = tmpDir("graft-store")
    MessageStore.append(streamDataOf(
      msg("s", 0, 1700000000000L, 0),           // 2023-11-14 22:xx
      msg("s", 0, 1700003600000L, 1),           // next hour
      msg("s", 1, 1700000000000L, 0)), path)
    // late arrival: much older ts appended later lands in its own bucket
    MessageStore.append(streamDataOf(msg("s", 0, 1600000000000L, 5)), path)

    val dirs = new java.io.File(s"$path/stream_id=s/stream_partition=0").list().sorted
    assert(dirs.toSeq == Seq("bucket=2020-09-13", "bucket=2023-11-14"))

    val store = MessageStore.open(spark, path)
    assert(store.count() == 4)
    // requestLast over the store returns the latest-N ascending (the late
    // 1600000000000 row is correctly older and excluded)
    val got = keysOf(BrokerQueries.requestLast(store, "s", 0, 2))
    assert(got == Seq(
      (1700000000000L, 0, "publisher", "1"), (1700003600000L, 1, "publisher", "1")))
  }

  test("stream-part predicate prunes partition directories") {
    val path = tmpDir("graft-prune")
    MessageStore.append(streamDataOf(
      msg("a", 0, 1700000000000L, 0), msg("b", 1, 1700000000000L, 0)), path)
    val store = MessageStore.open(spark, path)
    val plan = BrokerQueries.requestLast(store, "a", 0, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "partition filters expected in scan")
    assert(plan.contains("stream_id"), plan)
  }

  test("last-N spanning multiple buckets matches single-relation semantics " +
    "(Storage.test.ts:295-313 analog)") {
    val path = tmpDir("graft-multibucket")
    val dayMs = 86400000L
    val base = 1700000000000L
    // 60 messages across 3 day-buckets (20 per day)
    val msgs = (0 until 60).map(i =>
      msg("s", 0, base + (i / 20) * dayMs + (i % 20) * 1000L, i % 4))
    MessageStore.append(streamDataOf(msgs: _*), path)
    val store = MessageStore.open(spark, path)
    assert(new java.io.File(s"$path/stream_id=s/stream_partition=0").list().length == 3)

    // last-25 spans the bucket boundary: 20 from day 3 + 5 from day 2
    val got = keysOf(BrokerQueries.requestLast(store, "s", 0, 25)).map(_._1)
    val want = msgs.sortBy(m => (m.ts.toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
      m.sequence_no)).takeRight(25)
      .map(_.ts.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    assert(got == want)

    // range queries across each bucket boundary
    val r1 = BrokerQueries.requestRange(store, "s", 0,
      MsgRef(base + 19000L, 0), MsgRef(base + dayMs + 1000L, 99))
    assert(r1.count() == 3) // 19s day1, 0s + 1s day2
    val r2 = BrokerQueries.requestRange(store, "s", 0,
      MsgRef(base, 0), MsgRef(base + 2 * dayMs + 19000L, 99))
    assert(r2.count() == 60)
  }

  test("retention drops expired bucket directories, metadata-only") {
    val path = tmpDir("graft-retention")
    MessageStore.append(streamDataOf(
      msg("s", 0, 1600000000000L, 0),   // old bucket — expired
      msg("s", 0, 1700000000000L, 1)), path) // recent bucket — kept
    val dropped = MessageStore.dropExpiredBuckets(spark, path, MsgRef(1650000000000L, 0))
    assert(dropped.size == 1 && dropped.head.contains("bucket=2020-09-13"))
    val left = MessageStore.open(spark, path)
    assert(keysOf(left) == Seq((1700000000000L, 1, "publisher", "1")))
  }

  test("retention handles escaped partition values (stream id with '/')") {
    val path = tmpDir("graft-escape")
    MessageStore.append(streamDataOf(
      msg("0xabc/path", 0, 1600000000000L, 0),
      msg("0xabc/path", 0, 1700000000000L, 1)), path)
    val dropped = MessageStore.dropExpiredBuckets(spark, path, MsgRef(1650000000000L, 0))
    assert(dropped.size == 1 && dropped.head.contains("stream_id=0xabc%2Fpath"))
    assert(keysOf(MessageStore.open(spark, path)) ==
      Seq((1700000000000L, 1, "publisher", "1")))
  }

  test("requestLastBounded: newest buckets only, matches full-scan result") {
    val path = tmpDir("graft-lastbounded")
    val dayMs = 86400000L
    val base = 1700000000000L
    val msgs = (0 until 30).map(i =>
      msg("s", 0, base + (i / 10) * dayMs + (i % 10) * 1000L, 0))
    MessageStore.append(streamDataOf(msgs: _*), path)

    // N=5 is covered by the newest bucket alone
    val bounded = MessageStore.requestLastBounded(spark, path, "s", 0, 5)
    val full = BrokerQueries.requestLast(MessageStore.open(spark, path), "s", 0, 5)
    assert(keysOf(bounded) == keysOf(full))
    // N spanning two buckets still matches
    val bounded15 = MessageStore.requestLastBounded(spark, path, "s", 0, 15)
    assert(keysOf(bounded15) ==
      keysOf(BrokerQueries.requestLast(MessageStore.open(spark, path), "s", 0, 15)))
    // limit beyond total falls back to everything
    assert(MessageStore.requestLastBounded(spark, path, "s", 0, 100).count() == 30)
    // unknown stream-part: empty, correct schema
    val none = MessageStore.requestLastBounded(spark, path, "nope", 0, 5)
    assert(none.count() == 0 && none.columns.contains("payload"))
  }

  test("requestLastBounded: N spanning several of many buckets, one count job") {
    val path = tmpDir("graft-manybuckets")
    val dayMs = 86400000L
    val base = 1700000000000L
    // 25 day-buckets, 2 rows each
    val msgs = (0 until 50).map(i =>
      msg("s", 0, base + (i / 2) * dayMs + (i % 2) * 1000L, 0))
    MessageStore.append(streamDataOf(msgs: _*), path)
    assert(new java.io.File(s"$path/stream_id=s/stream_partition=0").list().length == 25)
    // N=7 needs the newest 4 buckets (2 rows each)
    val got = keysOf(MessageStore.requestLastBounded(spark, path, "s", 0, 7))
    val want = keysOf(BrokerQueries.requestLast(MessageStore.open(spark, path), "s", 0, 7))
    assert(got == want && got.length == 7)
  }

  test("ttl sweep drops aged buckets from directory names only") {
    val path = tmpDir("graft-ttl")
    val dayMs = 86400000L
    val base = 1700000000000L // 2023-11-14
    MessageStore.append(streamDataOf(
      msg("s", 0, base - 10 * dayMs, 0),  // old — beyond TTL
      msg("s", 0, base, 1)), path)        // recent — kept
    val dropped = MessageStore.dropAgedBuckets(spark, path,
      MsgRef(base - 3 * dayMs, 0))
    assert(dropped.size == 1 && dropped.head.contains("bucket=2023-11-04"))
    assert(keysOf(MessageStore.open(spark, path)) ==
      Seq((base, 1, "publisher", "1")))
  }

  test("dynamic assignment: stream-part added mid-stream persists, removed stops") {
    val s = spark
    import s.implicits._
    val path = tmpDir("graft-dynassign")
    val ckpt = tmpDir("graft-dynassign-ckpt")
    val now = System.currentTimeMillis()
    val assignment = new graft.streaming.DynamicAssignment(Some(Set("s::0")))

    val input = MemoryStream[StreamMessage](s)
    val q = IngestPipeline.start(input.toDF(), path, ckpt, assignment.get _)
    input.addData(msg("s", 0, now - 5000, 0), msg("t", 0, now - 5000, 0))
    q.processAllAvailable()

    // refresh: t gains assignment, s loses it (diff reported)
    val (added, removed) = assignment.update(Some(Set("t::0")))
    assert(added == Set("t::0") && removed == Set("s::0"))
    input.addData(msg("s", 0, now - 4000, 1), msg("t", 0, now - 4000, 1))
    q.processAllAvailable()
    q.stop()

    val stored = MessageStore.open(spark, path)
      .select($"stream_id", $"sequence_no").as[(String, Int)].collect().toSet
    assert(stored == Set(("s", 0), ("t", 1)))
  }

  test("ingest batch statistics: commit markers aggregate to the A10 surface") {
    val path = tmpDir("graft-stats")
    val ckpt = tmpDir("graft-stats-ckpt")
    assert(IngestPipeline.processBatch(
      streamDataOf((0 until 12).map(i => msg("s", 0, 1000L + i, i % 4)): _*),
      0L, path, ckpt, nowMs = 10000L))
    assert(IngestPipeline.processBatch(
      streamDataOf(msg("s", 0, 5000L, 0), msg("s", 0, 6000L, 1)),
      1L, path, ckpt, nowMs = 20000L))
    val s = graft.streaming.IngestStats.summary(spark, ckpt).collect().head
    assert(s.getAs[Long]("n_batches") == 2L)
    assert(s.getAs[Long]("total_rows") == 14L)
    assert(s.getAs[Double]("mean_batch_rows") == 7.0)
    // ages at commit: 10000-1011=8989 and 20000-6000=14000 → mean 11494.5
    assert(s.getAs[Double]("mean_age_ms") == 11494.5)
    assert(s.getAs[Long]("batches_ge_5") == 1L)
    assert(s.getAs[Long]("batches_ge_10") == 1L)
    assert(s.getAs[Long]("batches_ge_100") == 0L)
  }

  test("compact: crashed swap is recoverable; concurrent append aborts the swap") {
    val path = tmpDir("graft-compact-crash")
    (0 until 2).foreach { i =>
      MessageStore.append(streamDataOf(msg("s", 0, 1700000000000L + i * 1000, i)), path)
    }
    val partDir = new java.io.File(s"$path/stream_id=s/stream_partition=0")
    val live = new java.io.File(partDir, "bucket=2023-11-14")
    val trash = new java.io.File(partDir, ".bucket=2023-11-14.trash")
    // simulate a crash after rename(live→trash): live dir missing
    assert(live.renameTo(trash))
    assert(MessageStore.recoverCompaction(spark, path).size == 1)
    assert(keysOf(MessageStore.open(spark, path)).length == 2)
    // stale staging next to a healthy live dir is swept
    val staging = new java.io.File(partDir, ".bucket=2023-11-14.compact")
    assert(staging.mkdir())
    assert(MessageStore.recoverCompaction(spark, path).isEmpty)
    assert(!staging.exists())
    // compaction still works end-to-end after recovery
    assert(MessageStore.compactStreamPart(spark, path, "s", 0) == 1)
    assert(keysOf(MessageStore.open(spark, path)).length == 2)
  }

  test("recovery prefers .trash over .compact when live is missing (late append survives)") {
    val path = tmpDir("graft-trash-pref")
    (0 until 2).foreach { i =>
      MessageStore.append(streamDataOf(msg("s", 0, 1700000000000L + i * 1000, i)), path)
    }
    val partDir = new java.io.File(s"$path/stream_id=s/stream_partition=0")
    val live = new java.io.File(partDir, "bucket=2023-11-14")
    val staged = new java.io.File(partDir, ".bucket=2023-11-14.compact")
    // stage a compacted copy of the CURRENT two files...
    assert(staged.mkdir())
    live.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(staged, f.getName).toPath)
    }
    // ...then a concurrent writer slips a third message into live, and
    // the crash lands after rename(live -> trash): live missing, BOTH
    // twins present, trash the superset
    MessageStore.append(streamDataOf(msg("s", 0, 1700000002000L, 2)), path)
    assert(live.renameTo(new java.io.File(partDir, ".bucket=2023-11-14.trash")))
    assert(MessageStore.recoverCompaction(spark, path).size == 1)
    // the pre-compaction original won — including the late third message
    // — and the staged copy (which lacks it) is gone; '.compact' listing
    // before '.trash' must not flip the preference
    assert(keysOf(MessageStore.open(spark, path)).length == 3)
    assert(!staged.exists())
    assert(!new java.io.File(partDir, ".bucket=2023-11-14.trash").exists())
  }

  test("dropAgedBuckets: a day bucket survives an intra-day hour cutoff (mixed-width store)") {
    val path = tmpDir("graft-ttl-mixed")
    // day-bucketed stream with rows at 2023-11-14T00:00 and T15:00
    MessageStore.append(streamDataOf(
      msg("s", 0, 1699920000000L, 0),     // 2023-11-14T00:00Z
      msg("s", 0, 1699974000000L, 1)), path) // 2023-11-14T15:00Z
    // hour-granularity cutoff at 2023-11-14T10:00: the day bucket's name
    // "2023-11-14" sorts BELOW "2023-11-14-10", but its tail row (15:00)
    // is younger than the cutoff — the bucket must survive
    val dropped = MessageStore.dropAgedBuckets(spark, path,
      MsgRef(1699956000000L, 0), MessageStore.HourBucket)
    assert(dropped.isEmpty)
    assert(keysOf(MessageStore.open(spark, path)).length == 2)
    // a cutoff past the day's exclusive end drops it
    val dropped2 = MessageStore.dropAgedBuckets(spark, path,
      MsgRef(1700006400000L, 0), MessageStore.HourBucket) // 2023-11-15T00:00Z
    assert(dropped2.size == 1)
  }

  test("dropAgedBuckets: a malformed right-length bucket name is skipped, not fatal") {
    val path = tmpDir("graft-ttl-malformed")
    MessageStore.append(streamDataOf(
      msg("s", 0, 1699920000000L, 0)), path) // bucket=2023-11-14
    val partDir = new java.io.File(s"$path/stream_id=s/stream_partition=0")
    // a corrupted/foreign directory whose name LENGTH matches a day bucket
    // but which is not a date — the old LocalDateTime.parse aborted the
    // whole sweep on it; it must now be skipped like wrong-length names
    assert(new java.io.File(partDir, "bucket=GARBAGE-XX").mkdir())
    val dropped = MessageStore.dropAgedBuckets(spark, path,
      MsgRef(1700006400000L, 0)) // past the day's exclusive end
    assert(dropped.size == 1 && dropped.head.contains("2023-11-14"))
    assert(new java.io.File(partDir, "bucket=GARBAGE-XX").exists())
  }

  test("autoCompact recovers a crashed swap before applying the policy") {
    val path = tmpDir("graft-ac-recover")
    (0 until 2).foreach { i =>
      MessageStore.append(streamDataOf(msg("s", 0, 1700000000000L + i * 1000, i)), path)
    }
    val partDir = new java.io.File(s"$path/stream_id=s/stream_partition=0")
    val live = new java.io.File(partDir, "bucket=2023-11-14")
    // crash after rename(live→trash): rows hidden, bucket blocked for
    // compaction by the !exists(trash) guard — the policy entry point must
    // recover, then compact (2 files >= threshold 2)
    assert(live.renameTo(new java.io.File(partDir, ".bucket=2023-11-14.trash")))
    assert(MessageStore.autoCompact(spark, path, maxFilesPerBucket = 2) == 1)
    assert(keysOf(MessageStore.open(spark, path)).length == 2)
    assert(live.listFiles().count(_.getName.endsWith(".parquet")) == 1)
  }

  test("cross-batch replay: merge-on-read hides duplicates; compaction purges them") {
    val path = tmpDir("graft-replay-upsert")
    val m = msg("s", 0, 1700000000000L, 0)
    MessageStore.append(streamDataOf(m), path)
    // a later batch replays m and adds a genuinely new message
    MessageStore.append(streamDataOf(m, msg("s", 0, 1700000001000L, 1)), path)
    assert(MessageStore.open(spark, path).count() == 3)       // physical: at-least-once
    assert(MessageStore.openMerged(spark, path).count() == 2) // logical: upsert
    assert(MessageStore.requestLastBounded(spark, path, "s", 0, 10).count() == 2)
    // compaction rewrites the bucket without the replay (sstable analog)
    assert(MessageStore.compactStreamPart(spark, path, "s", 0) == 1)
    assert(MessageStore.open(spark, path).count() == 2)
  }

  test("clean markers: fully-compacted store reads window-free, appends void the marker") {
    val path = tmpDir("graft-clean")
    val m = msg("s", 0, 1700000000000L, 0)
    MessageStore.append(streamDataOf(m), path)
    MessageStore.append(streamDataOf(m, msg("s", 0, 1700000001000L, 1)), path)
    def mergedPlan = MessageStore.openMerged(spark, path)
      .queryExecution.executedPlan.toString
    // dirty store (replay present): the merged read pays the window
    assert(mergedPlan.contains("Window"))
    assert(MessageStore.openMerged(spark, path).count() == 2)
    // compaction stamps the bucket clean: NO Window and NO Exchange — the
    // steady-state serve is a plain scan
    assert(MessageStore.compactStreamPart(spark, path, "s", 0) == 1)
    assert(!mergedPlan.contains("Window") && !mergedPlan.contains("Exchange"),
      mergedPlan)
    assert(MessageStore.openMerged(spark, path).count() == 2)
    // the bounded last-N read skips its dedup too over clean buckets
    assert(MessageStore.requestLastBounded(spark, path, "s", 0, 10).count() == 2)
    // an append after compaction voids the marker: the window returns and
    // the replayed row stays merged away
    MessageStore.append(streamDataOf(m), path)
    assert(mergedPlan.contains("Window"))
    assert(MessageStore.openMerged(spark, path).count() == 2)
    assert(MessageStore.requestLastBounded(spark, path, "s", 0, 10).count() == 2)
  }

  test("clean markers: mixed store merges only dirty buckets") {
    val path = tmpDir("graft-clean-mixed")
    val dayMs = 86400000L
    val a = msg("s", 0, 1700000000000L, 0)
    val b = msg("s", 0, 1700000000000L + dayMs, 1)
    MessageStore.append(streamDataOf(a, b), path)
    MessageStore.append(streamDataOf(a, b), path) // replays in both buckets
    assert(MessageStore.compactStreamPart(spark, path, "s", 0) == 2)
    // dirty exactly one bucket: replay b again + a genuinely new row
    MessageStore.append(
      streamDataOf(b, msg("s", 0, 1700000001000L + dayMs, 2)), path)
    val merged = MessageStore.openMerged(spark, path)
    val plan = merged.queryExecution.executedPlan.toString
    // union of a window-free clean scan and one windowed dirty scan
    assert(plan.contains("Union") && plan.contains("Window"), plan)
    assert(keysOf(merged).map(_._2).sorted == Seq(0, 1, 2))
    // time pruning still reaches partition filters under the union+window
    val pruned = MessageStore.pruneTime(merged,
      Some(1700000000000L + dayMs), None)
    val scans = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.partitionFilters.mkString(" AND ")
    }
    assert(scans.nonEmpty && scans.forall(_.contains("bucket")), scans.mkString("; "))
    assert(keysOf(pruned).map(_._2).sorted == Seq(1, 2))
  }

  test("requestLastBounded widens when replays deflate the covering buckets") {
    val path = tmpDir("graft-lb-widen")
    val newest = msg("s", 0, 1700000000000L + 86400000L, 2)
    MessageStore.append(streamDataOf(
      msg("s", 0, 1700000000000L, 0), msg("s", 0, 1700000001000L, 1), newest), path)
    MessageStore.append(streamDataOf(newest), path) // replay
    MessageStore.append(streamDataOf(newest), path) // replay again
    // newest bucket counts 3 physical rows but holds 1 unique: the physical
    // covering of limit=3 deflates, so the read must widen to older buckets
    val got = MessageStore.requestLastBounded(spark, path, "s", 0, 3)
    assert(keysOf(got).map(_._2) == Seq(0, 1, 2))
  }

  test("recover: a stale trash beside fresh staging cannot resurrect purged replays") {
    val path = tmpDir("graft-stale-trash")
    val m = msg("s", 0, 1700000000000L, 0)
    MessageStore.append(streamDataOf(m), path)
    MessageStore.append(streamDataOf(m), path) // replay -> 2 physical rows
    val partDir = new java.io.File(s"$path/stream_id=s/stream_partition=0")
    val live = new java.io.File(partDir, "bucket=2023-11-14")
    // keep a copy of the pre-compaction originals (what a pre-delete-crash
    // trash dir would hold)
    val copy = new java.io.File(partDir, ".originals-keep") // dot: invisible to Spark
    assert(copy.mkdir())
    live.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(copy, f.getName).toPath)
    }
    // compaction commits: replay purged
    assert(MessageStore.compactStreamPart(spark, path, "s", 0) == 1)
    assert(MessageStore.open(spark, path).count() == 1)
    // simulate crash state: stale trash of originals + a later run's staging
    assert(copy.renameTo(new java.io.File(partDir, ".bucket=2023-11-14.trash")))
    assert(new java.io.File(partDir, ".bucket=2023-11-14.compact").mkdir())
    assert(MessageStore.recoverCompaction(spark, path).size == 1)
    // recovery merged the stale originals but dedup-rewrote the bucket:
    // the purged replay must NOT come back
    assert(MessageStore.open(spark, path).count() == 1)
  }

  test("compact: writer-recreated-live race states restore originals, not delete them") {
    // state A: trash holds originals, a concurrent writer recreated live,
    // part-level staged .compact still present (crash before swap-in)
    val path = tmpDir("graft-compact-race")
    (0 until 2).foreach { i =>
      MessageStore.append(streamDataOf(msg("s", 0, 1700000000000L + i * 1000, i)), path)
    }
    val partDir = new java.io.File(s"$path/stream_id=s/stream_partition=0")
    val live = new java.io.File(partDir, "bucket=2023-11-14")
    val trash = new java.io.File(partDir, ".bucket=2023-11-14.trash")
    val staging = new java.io.File(partDir, ".bucket=2023-11-14.compact")
    assert(live.renameTo(trash))
    // "concurrent writer" recreates the live dir with a new row
    MessageStore.append(streamDataOf(msg("s", 0, 1700000002000L, 2)), path)
    assert(staging.mkdir())
    assert(MessageStore.recoverCompaction(spark, path).size == 1)
    assert(keysOf(MessageStore.open(spark, path)).length == 3) // 2 originals + 1 new
    assert(!trash.exists() && !staging.exists())

    // state B: the rename(staging→live) nested staging INSIDE the
    // recreated live dir (the TOCTOU the inline guard detects)
    assert(live.renameTo(trash))
    MessageStore.append(streamDataOf(msg("s", 0, 1700000003000L, 3)), path)
    val nested = new java.io.File(live, ".bucket=2023-11-14.compact")
    assert(nested.mkdir())
    assert(MessageStore.recoverCompaction(spark, path).size == 1)
    assert(keysOf(MessageStore.open(spark, path)).length == 4) // 3 restored + 1 new
    assert(!trash.exists() && !nested.exists())
  }

  test("pruneTime injects bucket partition filters for time-bounded reads") {
    val path = tmpDir("graft-prunetime")
    MessageStore.append(streamDataOf(
      msg("s", 0, 1600000000000L, 0),   // bucket 2020-09-13
      msg("s", 0, 1700000000000L, 1)), path) // bucket 2023-11-14
    val store = MessageStore.open(spark, path)
    val pruned = MessageStore.pruneTime(store, Some(1690000000000L), None)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    // only the newer bucket's rows survive; correctness preserved
    assert(keysOf(pruned) == Seq((1700000000000L, 1, "publisher", "1")))
    // widened-bound safety: a from inside a bucket keeps that bucket
    val mid = MessageStore.pruneTime(store, Some(1700000005000L), None)
    assert(mid.count() == 1)
    // the merge-on-read window must NOT break directory pruning: bucket is
    // a window partition key precisely so this predicate reaches the scan
    val merged = MessageStore.pruneTime(
      MessageStore.openMerged(spark, path), Some(1690000000000L), None)
    val mergedScanFilters = merged.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.partitionFilters.mkString(" AND ")
    }.mkString
    assert(mergedScanFilters.contains("bucket"), mergedScanFilters)
    assert(keysOf(merged) == Seq((1700000000000L, 1, "publisher", "1")))
  }

  test("per-stream bucket granularity: hot stream hour-bucketed, pruning stays exact") {
    val path = tmpDir("graft-granularity")
    val base = 1700000000000L // 2023-11-14 22:13:20 UTC
    val hourMs = 3600000L
    // "hot" bucketed by hour, "cold" by day (default), same store
    MessageStore.appendPerStream(streamDataOf(
      msg("hot", 0, base - 2 * hourMs, 0),   // 20:13 → bucket 2023-11-14-20
      msg("hot", 0, base, 1),                // 22:13 → bucket 2023-11-14-22
      msg("cold", 0, base - 2 * hourMs, 0),
      msg("cold", 0, base, 1)),
      path, Map("hot" -> MessageStore.HourBucket))
    assert(new java.io.File(s"$path/stream_id=hot/stream_partition=0").list().sorted
      .toSeq == Seq("bucket=2023-11-14-20", "bucket=2023-11-14-22"))
    assert(new java.io.File(s"$path/stream_id=cold/stream_partition=0").list()
      .toSeq == Seq("bucket=2023-11-14"))
    // mixed-safe pruning from base-1h: hour bucket 20 prunes away, the
    // boundary-day buckets of either width survive, answers exact
    val store = MessageStore.open(spark, path)
    val pruned = MessageStore.pruneTimeMixed(store, Some(base - hourMs), None)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    import graft.operators.BrokerQueries
    assert(keysOf(BrokerQueries.requestFrom(pruned, "hot", 0,
      MsgRef(base - hourMs, 0))) == Seq((base, 1, "publisher", "1")))
    assert(keysOf(BrokerQueries.requestFrom(
      MessageStore.pruneTimeMixed(store, Some(base - hourMs), None),
      "cold", 0, MsgRef(base - hourMs, 0))) == Seq((base, 1, "publisher", "1")))
    // an upper bound prunes whole hour buckets past `to` but keeps the
    // boundary day bucket
    val upTo = MessageStore.pruneTimeMixed(store, None, Some(base - hourMs))
    assert(keysOf(BrokerQueries.requestRange(upTo, "hot", 0,
      MsgRef(0L, 0), MsgRef(base - hourMs, 99))) ==
      Seq((base - 2 * hourMs, 0, "publisher", "1")))
    // bounded last-N selects whole UTC days, so mixed widths stay exact
    assert(keysOf(MessageStore.requestLastBounded(spark, path, "hot", 0, 1)) ==
      Seq((base, 1, "publisher", "1")))
    assert(keysOf(MessageStore.requestLastBounded(spark, path, "hot", 0, 2)).length == 2)
  }

  test("granularity flip guard: second width on an occupied day rejected, new day allowed") {
    val path = tmpDir("graft-width-guard")
    val base = 1700000000000L // 2023-11-14 22:13:20 UTC
    val dayMs = 86400000L
    MessageStore.appendPerStream(streamDataOf(msg("s", 0, base, 0)), path, Map.empty)
    // replay/append of the same day after a day→hour flip: would create a
    // second-width bucket whose replays the bucket-local merge window can
    // never collapse — rejected before any file lands
    val e = intercept[IllegalStateException] {
      MessageStore.appendPerStream(streamDataOf(msg("s", 0, base, 0)), path,
        Map("s" -> MessageStore.HourBucket))
    }
    assert(e.getMessage.contains("bucket-width conflict"), e.getMessage)
    assert(new java.io.File(s"$path/stream_id=s/stream_partition=0").list()
      .toSeq == Seq("bucket=2023-11-14"))
    // forward-only migration: hour width on a fresh day is legal, and the
    // same-day original width still appends (replays keep working)
    MessageStore.appendPerStream(streamDataOf(msg("s", 0, base + dayMs, 1)), path,
      Map("s" -> MessageStore.HourBucket))
    MessageStore.appendPerStream(streamDataOf(msg("s", 0, base, 0)), path, Map.empty)
    assert(new java.io.File(s"$path/stream_id=s/stream_partition=0").list().sorted
      .toSeq == Seq("bucket=2023-11-14", "bucket=2023-11-15-22"))
    // and the day bucket's replay collapsed on read as before
    assert(keysOf(MessageStore.openMerged(spark, path)).length == 2)
  }

  test("width cache: guard answers from memory after warmup, invalidate re-learns") {
    val path = tmpDir("graft-width-cache")
    val base = 1700000000000L // 2023-11-14 22:13:20 UTC
    val cache = new MessageStore.BucketWidthCache
    // warmup: first append lists (fresh store — nothing there) and records
    // the written day's width into the cache
    MessageStore.appendPerStream(streamDataOf(msg("s", 0, base, 0)), path,
      Map.empty, widthCache = Some(cache))
    // width flip on the occupied day still rejected, now from the cache
    val e = intercept[IllegalStateException] {
      MessageStore.appendPerStream(streamDataOf(msg("s", 0, base, 1)), path,
        Map("s" -> MessageStore.HourBucket), widthCache = Some(cache))
    }
    assert(e.getMessage.contains("cached listing"),
      s"post-warmup conflict must come from the cache, not a re-listing: ${e.getMessage}")
    // PROOF the steady path does zero FS listing: wipe the stream's
    // buckets behind the cache's back — the filesystem now permits a width
    // flip, but the cached (stream, day) entry still rejects it, so the
    // guard cannot have consulted the filesystem
    val partDir = new java.io.File(s"$path/stream_id=s/stream_partition=0")
    partDir.listFiles().foreach { d =>
      d.listFiles().foreach(_.delete()); d.delete()
    }
    val e2 = intercept[IllegalStateException] {
      MessageStore.appendPerStream(streamDataOf(msg("s", 0, base, 1)), path,
        Map("s" -> MessageStore.HourBucket), widthCache = Some(cache))
    }
    assert(e2.getMessage.contains("cached listing"), e2.getMessage)
    // retention contract: invalidate the stream → the guard re-lists, sees
    // the empty directory, and the flip becomes legal
    cache.invalidate("s")
    MessageStore.appendPerStream(streamDataOf(msg("s", 0, base, 1)), path,
      Map("s" -> MessageStore.HourBucket), widthCache = Some(cache))
    assert(new java.io.File(s"$path/stream_id=s/stream_partition=0").list()
      .toSeq == Seq("bucket=2023-11-14-22"))
    // and the re-learned entry keeps guarding: day width now conflicts
    val e3 = intercept[IllegalStateException] {
      MessageStore.appendPerStream(streamDataOf(msg("s", 0, base, 2)), path,
        Map.empty, widthCache = Some(cache))
    }
    assert(e3.getMessage.contains("cached listing"), e3.getMessage)
  }

  test("plain append is width-guarded too: second width on an occupied day rejected") {
    val path = tmpDir("graft-width-append")
    val base = 1700000000000L // 2023-11-14 UTC
    MessageStore.append(streamDataOf(msg("s", 0, base, 0)), path)
    val e = intercept[IllegalStateException] {
      MessageStore.append(streamDataOf(msg("s", 0, base, 1)), path,
        MessageStore.HourBucket)
    }
    assert(e.getMessage.contains("bucket-width conflict"), e.getMessage)
    intercept[IllegalArgumentException] {
      MessageStore.append(streamDataOf(msg("s", 0, base, 1)), path, "yyyy-MM")
    }
  }

  test("processBatch replay guard: same batchId appends exactly once") {
    val path = tmpDir("graft-replay")
    val ckpt = tmpDir("graft-replay-ckpt")
    val batch = streamDataOf(msg("s", 0, 1000L, 0), msg("s", 0, 2000L, 1))
    assert(graft.streaming.IngestPipeline.processBatch(
      batch, 7L, path, ckpt, nowMs = 10000L))
    // at-least-once redelivery of the same batch id is a no-op
    assert(!graft.streaming.IngestPipeline.processBatch(
      batch, 7L, path, ckpt, nowMs = 10000L))
    assert(MessageStore.open(spark, path).count() == 2)
    // a new batch id still appends
    assert(graft.streaming.IngestPipeline.processBatch(
      streamDataOf(msg("s", 0, 3000L, 2)), 8L, path, ckpt, nowMs = 10000L))
    assert(MessageStore.open(spark, path).count() == 3)
  }

  test("compactStreamPart merges per-batch small files, preserving rows") {
    val path = tmpDir("graft-compact")
    // three appends -> three files in the same day bucket
    (0 until 3).foreach { i =>
      MessageStore.append(streamDataOf(msg("s", 0, 1700000000000L + i * 1000, i)), path)
    }
    val bucketDir = new java.io.File(
      s"$path/stream_id=s/stream_partition=0/bucket=2023-11-14")
    def files = bucketDir.listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(files == 3)
    val before = keysOf(MessageStore.open(spark, path)).sorted
    assert(MessageStore.compactStreamPart(spark, path, "s", 0) == 1)
    assert(files == 1)
    assert(keysOf(MessageStore.open(spark, path)).sorted == before)
    // idempotent: nothing left to compact
    assert(MessageStore.compactStreamPart(spark, path, "s", 0) == 0)
  }

  test("streaming ingest auto-compaction cadence keeps per-bucket files bounded") {
    val s = spark
    import s.implicits._
    val path = tmpDir("graft-ingest-ac")
    val ckpt = tmpDir("graft-ingest-ac-ckpt")
    val now = System.currentTimeMillis()
    val input = MemoryStream[StreamMessage](s)
    // threshold 3, sweep after every 2nd committed batch
    val q = IngestPipeline.start(input.toDF(), path, ckpt,
      autoCompactEvery = 2, maxFilesPerBucket = 3)
    try {
      // four single-row batches into the same day bucket
      (0 until 4).foreach { i =>
        input.addData(msg("s", 0, now - 5000 + i, i))
        q.processAllAvailable()
      }
      val bucketDir = new java.io.File(s"$path/stream_id=s/stream_partition=0")
        .listFiles().filter(_.getName.startsWith("bucket=")).head
      val files = bucketDir.listFiles().count(_.getName.endsWith(".parquet"))
      // batch 3's cadence fired with 3 accumulated files -> compacted to 1,
      // then batch 4 appended one more; without the policy there'd be 4
      assert(files <= 2, s"expected compacted bucket, found $files files")
      assert(MessageStore.open(spark, path).count() == 4)
    } finally q.stop()
  }

  test("streaming ingest: validates, dedups, persists; fan-out hook fires") {
    val s = spark
    import s.implicits._
    val path = tmpDir("graft-ingest")
    val ckpt = tmpDir("graft-ckpt")
    val now = System.currentTimeMillis()

    val input = MemoryStream[StreamMessage](s)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = IngestPipeline.start(
      input.toDF(), path, ckpt,
      assigned = () => Some(Set("s::0")),
      onBatch = (batch, _) => seen.addAndGet(batch.count()))

    input.addData(
      msg("s", 0, now - 1000, 0),                         // accepted
      msg("s", 0, now - 1000, 0),                         // duplicate -> dropped
      msg("s", 0, now + 600000L, 1),                      // future -> rejected
      msg("s", 0, now - 1000, 2, payload = "not json"),   // invalid -> rejected
      msg("other", 3, now - 1000, 0))                     // unassigned -> dropped
    q.processAllAvailable()
    q.stop()

    val stored = MessageStore.open(spark, path).collect()
    assert(stored.length == 1)
    assert(stored.head.getAs[String]("stream_id") == "s")
    assert(stored.head.getAs[Int]("sequence_no") == 0)
    assert(seen.get() == 1)
  }

  test("retention invalidates the engine width cache: emptied day accepts a width flip") {
    val path = tmpDir("graft-widthflip")
    val now = 1710000000000L
    // pre-existing store written under an older day-width config
    MessageStore.append(streamDataOf(msg("s", 0, 1700000000000L, 0)), path)
    // engine reconfigured to hour buckets for "s": a same-day append is
    // rejected (the day already holds day-width data) and the failed
    // attempt warms the engine's width cache with the directory listing
    val engine = new GraftEngine(spark, path,
      granularityFor = Map("s" -> MessageStore.HourBucket))
    val ex = intercept[IllegalStateException] {
      engine.publish(streamDataOf(msg("s", 0, 1700003600000L, 1)), now)
    }
    assert(ex.getMessage.contains("bucket-width conflict"))
    // retention empties the day, making the flip newly legal; before the
    // invalidation hook the stale cached {day -> day-width} entry kept
    // rejecting this from memory even though the filesystem allows it
    assert(engine.deleteExpired(retentionDays = 0, nowMs = now).nonEmpty)
    assert(engine.publish(streamDataOf(msg("s", 0, 1700003600000L, 1)), now) == 1L)
    val dirs = new java.io.File(s"$path/stream_id=s/stream_partition=0")
      .list().filter(_.startsWith("bucket=")).toSeq
    assert(dirs == Seq("bucket=2023-11-14-23"), dirs.toString)
  }

  test("ingest fan-out: drift + vocab monitors consume the validated stream " +
      "the store persists; monitors checkpoint-restart mid-stream") {
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.{IngestMonitors, StreamDrift, StreamVocabGrowth}
    val s = spark
    import s.implicits._
    val path = tmpDir("graft-montap")
    val ckpt = tmpDir("graft-montap-ckpt")
    val (cpD, outD) = (tmpDir("graft-montap-dcp"), tmpDir("graft-montap-dout"))
    val (cpV, outV) = (tmpDir("graft-montap-vcp"), tmpDir("graft-montap-vout"))
    // real-clock base so the persist path's own batch clock agrees with
    // the monitors' pinned literal about what counts as "future"
    val nowMs = System.currentTimeMillis()
    val baseMin = nowMs / 60000L - 10L
    def tsAt(k: Int): Long = (baseMin + k) * 60000L + 500L
    val assigned = Set("s::0")

    val input = MemoryStream[StreamMessage](s)
    // one source, three sinks: the persist query plus both monitors run
    // off the SAME MemoryStream, each from its own checkpoint
    val persist = IngestPipeline.start(input.toDF(), path, ckpt,
      () => Some(assigned))
    def prepared() =
      IngestMonitors.prepared(input.toDF(), lit(ldt(nowMs)), Some(assigned))
    def startDrift() = StreamDrift.detect(
        IngestMonitors.driftEvents(prepared()),
        windowMinutes = 1L, bandWidth = 4000000L)
      .writeStream.format("parquet").option("path", outD)
      .option("checkpointLocation", cpD)
      .outputMode(OutputMode.Append()).start()
    def startVocab() = StreamVocabGrowth.detect(
        IngestMonitors.vocabEvents(prepared()),
        windowMinutes = 1L)
      .writeStream.format("parquet").option("path", outV)
      .option("checkpointLocation", cpV)
      .outputMode(OutputMode.Append()).start()
    var (qd, qv) = (startDrift(), startVocab())
    def processAll(): Unit =
      Seq(persist, qd, qv).foreach(_.processAllAvailable())
    try {
      // window base+0: two 9-char accepted payloads, plus three rows the
      // validate/assign chain must hide from store AND monitors alike —
      // malformed JSON, future timestamp, unassigned part
      input.addData(
        msg("s", 0, tsAt(0), 0, payload = """{"a":"x"}"""),
        msg("s", 0, tsAt(0), 1, payload = """{"a":"x"}"""),
        msg("s", 0, tsAt(0), 2, payload = "oops"),
        msg("s", 0, nowMs + 600000L, 3, payload = """{"a":"x"}"""),
        msg("u", 0, tsAt(0), 4, payload = """{"a":"x"}"""))
      processAll()
      // window base+1: one 13-char novel payload + one 9-char repeat of
      // window 0's token (closes window 0: drift reference, vocab report)
      input.addData(
        msg("s", 0, tsAt(1), 5, payload = """{"a":"xyzzy"}"""),
        msg("s", 0, tsAt(1), 6, payload = """{"a":"x"}"""))
      processAll()
      // restart both monitors from their checkpoints mid-stream
      qd.stop(); qv.stop()
      qd = startDrift(); qv = startVocab()
      // window base+2 opener closes window base+1 against the RECOVERED
      // drift reference / vocab bitmap
      input.addData(msg("s", 0, tsAt(2), 7, payload = """{"c":1}"""))
      processAll()

      // store persisted exactly the accepted rows (seq 0,1,5,6,7)
      val stored = MessageStore.open(spark, path)
        .select(col("sequence_no")).collect().map(_.getInt(0)).toSet
      assert(stored == Set(0, 1, 5, 6, 7), stored.toString)

      // drift: ref = {band 2: 2 docs of len 9}; window base+1 = {band 3:
      // len 13, band 2: len 9} -> band2 term (1·2−2·2)·(bits3−bits5) = 2,
      // band3 term (1·2−0)·(bits3−bits1) = 2 -> psi = 4/(2·2) = 1.0
      val drift = spark.read.parquet(outD).collect()
        .map(r => (r.getAs[String]("part"), r.getAs[Long]("window"),
          r.getAs[Long]("n_ref"), r.getAs[Long]("n"), r.getAs[Double]("psi")))
      assert(drift.toSeq == Seq(("s::0", baseMin + 1L, 2L, 2L, 1.0)),
        drift.mkString(","))

      // vocab: window 0 = 2 tokens 1 new type; window 1 = 2 tokens but
      // only xyzzy is new — the repeated token proves the bitmap (and the
      // monitor wiring) survived the checkpoint restart
      val vocab = spark.read.parquet(outV).collect()
        .map(r => (r.getAs[Long]("window"), r.getAs[Long]("tokens"),
          r.getAs[Long]("new_types"), r.getAs[Long]("bits_set")))
        .sortBy(_._1)
      assert(vocab.toSeq == Seq(
        (baseMin + 0L, 2L, 1L, 1L), (baseMin + 1L, 2L, 1L, 2L)),
        vocab.mkString(","))
    } finally { persist.stop(); qd.stop(); qv.stop() }
  }
}
