package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.{TarEntries, TfRecords}
import graft.streaming.StreamShardEmit
import graft.streaming.StreamShardEmit.{DocEvent, SampleEvent}

class StreamShardEmitSpec extends SparkSpec {

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  private def bytes(n: Int, fill: Byte = 'x'): Array[Byte] =
    Array.fill[Byte](n)(fill)

  test("budget bound: a >2 GiB budget is rejected up front, not at seal time") {
    val s = spark
    import s.implicits._
    val ds = Seq(DocEvent("a", 0L, bytes(1))).toDS()
    // above the bound the seal-time ByteArrayOutputStream hint would go
    // negative — the guard fails fast in the API call instead
    intercept[IllegalArgumentException](
      StreamShardEmit.batchReplay(ds, budgetBytes = Int.MaxValue.toLong))
    intercept[IllegalArgumentException](
      StreamShardEmit.batchReplay(ds, budgetBytes = 0L))
    // the boundary itself is legal
    assert(StreamShardEmit.batchReplay(ds,
      budgetBytes = Int.MaxValue.toLong - 16L).collect().isEmpty)
  }

  test("greedy seal boundaries; sealed blobs re-parse through the gated reader") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[DocEvent](s)
    // budget 100: each record costs 16 + len
    val q = StreamShardEmit.emit(input.toDS(), budgetBytes = 100L)
      .writeStream.format("memory").queryName("shardemit")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        DocEvent("a", 0L, bytes(30)), // fill 46
        DocEvent("a", 1L, bytes(30)), // fill 92
        DocEvent("a", 2L, bytes(30)), // would be 138 -> seals shard 0
        DocEvent("a", 3L, bytes(200)), // oversize -> seals shard 1, opens 2
        DocEvent("b", 10L, bytes(5)))
      input.addData(DocEvent("a", 4L, bytes(1))) // seals oversize shard 2
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT stream, shard_seq, n_records, n_bytes, first_seq, last_seq, data
          |FROM shardemit ORDER BY stream, shard_seq""".stripMargin).collect()
      val meta = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(meta == Seq(
        ("a", 0L, 2L, 92L, 0L, 1L),      // two 30-byte records
        ("a", 1L, 1L, 46L, 2L, 2L),      // the record that sealed shard 0
        ("a", 2L, 1L, 216L, 3L, 3L)))    // oversize single-record shard
      // every sealed blob is a valid TFRecord container: both crcs walk
      rows.foreach { r =>
        val arr = TfRecords.parse(r.getAs[Array[Byte]]("data"))
        assert(arr.numElements().toLong == r.getLong(2))
        assert((0 until arr.numElements()).forall { i =>
          arr.getStruct(i, 3).getUTF8String(2).toString ==
            md5Hex(bytes(arr.getStruct(i, 3).getLong(1).toInt))
        })
      }
    } finally q.stop()
  }

  test("stream equals batch replay; trailing partial stays open in both") {
    val s = spark
    import s.implicits._
    val events = (0L until 40L).map { i =>
      DocEvent(if (i % 2 == 0) "a" else "b", i, bytes((i % 7).toInt * 11 + 1))
    }
    val input = MemoryStream[DocEvent](s)
    val q = StreamShardEmit.emit(input.toDS(), budgetBytes = 120L)
      .writeStream.format("memory").queryName("shardparity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.take(13): _*)
      q.processAllAvailable()
      input.addData(events.drop(13): _*)
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT stream, shard_seq, n_records, n_bytes, first_seq, last_seq FROM shardparity")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      val batch = StreamShardEmit.batchReplay(events.toDS(), budgetBytes = 120L)
        .collect().map(x => (x.stream, x.shard_seq, x.n_records, x.n_bytes,
          x.first_seq, x.last_seq)).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("restart from checkpoint: the open shard's accumulated records survive") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-seal-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-seal-out").toString
    val input = MemoryStream[DocEvent](s)
    def start() = StreamShardEmit.emit(input.toDS(), budgetBytes = 100L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData(DocEvent("s", 0L, bytes(30)), DocEvent("s", 1L, bytes(30)))
      q1.processAllAvailable()
    } finally q1.stop()
    // the sealer must recover BOTH pre-restart records into shard 0
    input.addData(DocEvent("s", 2L, bytes(30)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("shard_seq"), r.getAs[Long]("n_records"),
          r.getAs[Long]("first_seq"), r.getAs[Long]("last_seq"))).toSeq
      assert(rows == Seq((0L, 2L, 0L, 1L)))
      // and the blob itself contains exactly the two pre-restart records
      val data = spark.read.parquet(out).collect().head.getAs[Array[Byte]]("data")
      assert(TfRecords.parse(data).numElements() == 2)
    } finally q2.stop()
  }

  test("webdataset sealer: parity with batch twin; samples never split; archives valid") {
    val s = spark
    import s.implicits._
    // member payload sizes chosen so shards seal mid-stream: each sample
    // is 2 members = 2 headers + 2 data blocks = 2048 bytes framed
    val events = (0L until 12L).map { i =>
      SampleEvent(if (i % 2 == 0) "a" else "b", i,
        Seq((s"$i.txt", bytes(100, 't')), (s"$i.cls", bytes(10, 'c'))))
    }
    val input = MemoryStream[SampleEvent](s)
    val q = StreamShardEmit.emitWds(input.toDS(), budgetBytes = 5200L)
      .writeStream.format("memory").queryName("wdsseal")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.take(5): _*)
      q.processAllAvailable()
      input.addData(events.drop(5): _*)
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT stream, shard_seq, n_samples, n_members, n_bytes,
          |       first_seq, last_seq FROM wdsseal""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      val batchShards = StreamShardEmit.batchReplayWds(events.toDS(),
        budgetBytes = 5200L)
      val batch = batchShards.collect().map(x => (x.stream, x.shard_seq,
        x.n_samples, x.n_members, x.n_bytes, x.first_seq, x.last_seq)).toSet
      assert(streamed == batch && streamed.nonEmpty)
      // budget 5200 / 2048-byte samples + 1024 close = 2 samples per shard
      assert(batch.forall(_._3 == 2L))
      // every sealed archive walks the validating tar reader completely:
      // sample members stay adjacent (pairing intact), sizes exact
      val walked = batchShards.collect().map { sh =>
        val arr = TarEntries.parse(sh.data)
        (sh.stream, sh.shard_seq,
          (0 until arr.numElements()).map(i =>
            arr.getStruct(i, 5).getUTF8String(0).toString))
      }
      walked.foreach { case (_, _, ns) =>
        assert(ns.length == 4) // 2 samples x 2 members
        // members of one sample adjacent: i.txt immediately before i.cls
        ns.grouped(2).foreach { pair =>
          assert(pair(0).endsWith(".txt") && pair(1).endsWith(".cls"))
          assert(pair(0).dropRight(4) == pair(1).dropRight(4))
        }
      }
    } finally q.stop()
  }

  test("an oversize sample forms its own single-sample shard, never dropped or split") {
    val s = spark
    import s.implicits._
    val events = Seq(
      SampleEvent("a", 0L, Seq(("0.txt", bytes(10)))),        // 1024 framed
      SampleEvent("a", 1L, Seq(("1.txt", bytes(9000)))),      // oversize
      SampleEvent("a", 2L, Seq(("2.txt", bytes(10)))),        // seals the oversize
      SampleEvent("a", 3L, Seq(("3.txt", bytes(10)))))
    val out = StreamShardEmit.batchReplayWds(events.toDS(), budgetBytes = 4096L)
      .collect().sortBy(_.shard_seq)
    // shard 0 = sample 0 (sealed when oversize sample 1 arrives),
    // shard 1 = the oversize sample alone (sealed when sample 2 arrives);
    // samples 2,3 stay open
    assert(out.map(x => (x.shard_seq, x.n_samples, x.first_seq, x.last_seq)).toSeq ==
      Seq((0L, 1L, 0L, 0L), (1L, 1L, 1L, 1L)))
    assert(out(1).n_bytes > 4096L)
    val arr = TarEntries.parse(out(1).data)
    assert(arr.numElements() == 1)
    assert(arr.getStruct(0, 5).getLong(2) == 9000L)
  }

  // With ProcessingTimeTimeout armed, the micro-batch engine schedules
  // timeout-only batches on its own (shouldRunAnotherBatch is always
  // true), so processAllAvailable never latches "no new data" — these
  // tests PACE the trigger and POLL the sink instead.
  private def await(what: String, timeoutMs: Long = 60000L)(pred: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!pred && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(pred, s"timed out waiting for: $what")
  }

  test("idle keepalive flushes the trailing open shard with the flushed marker") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[DocEvent](s)
    val q = StreamShardEmit.emit(input.toDS(), budgetBytes = 1000L,
      idleFlushMs = 200L)
      .writeStream.format("memory").queryName("idleflush")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(DocEvent("s", 0L, bytes(30)), DocEvent("s", 1L, bytes(30)))
      // the budget (1000) is far away — only the keepalive can seal this
      await("idle flush of the open shard") {
        spark.sql("SELECT * FROM idleflush WHERE flushed").count() == 1
      }
      val flushed = spark.sql(
        """SELECT stream, shard_seq, n_records, first_seq, last_seq, flushed
          |FROM idleflush""".stripMargin).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toSet
      assert(flushed == Set(("s", 0L, 2L, 0L, 1L, true)))
      // later records open a FRESH shard after the flushed one, and the
      // budget path still seals with flushed = false
      input.addData(Seq.tabulate(40)(i => DocEvent("s", 10L + i, bytes(30))): _*)
      await("budget seal after the flush") {
        spark.sql(
          "SELECT * FROM idleflush WHERE stream = 's' AND NOT flushed").count() >= 1
      }
      val next = spark.sql(
        "SELECT shard_seq FROM idleflush WHERE stream = 's' AND NOT flushed")
        .collect().map(_.getLong(0))
      assert(next.min == 1L)
    } finally q.stop()
  }

  test("idle keepalive seals across checkpoint restart") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-flush-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-flush-out").toString
    val input = MemoryStream[DocEvent](s)
    def start() = StreamShardEmit.emit(input.toDS(), budgetBytes = 1000L,
      idleFlushMs = 200L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .outputMode(OutputMode.Append()).start()
    def sealedSet() =
      // the sink dir has no readable schema until the first file lands
      try spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("shard_seq"), r.getAs[Long]("n_records"),
          r.getAs[Boolean]("flushed"))).toSet
      catch { case _: org.apache.spark.sql.AnalysisException =>
        Set.empty[(Long, Long, Boolean)] }
    val q1 = start()
    try {
      input.addData(DocEvent("s", 0L, bytes(30)), DocEvent("s", 1L, bytes(30)))
      await("pre-restart idle flush")(sealedSet() == Set((0L, 2L, true)))
    } finally q1.stop()
    // post-flush state (shardSeq advanced past the flushed shard) must
    // survive the restart: the next record opens shard 1, and the
    // keepalive must seal IT too in the restarted query
    input.addData(DocEvent("s", 2L, bytes(30)))
    val q2 = start()
    try {
      await("post-restart idle flush")(
        sealedSet() == Set((0L, 2L, true), (1L, 1L, true)))
    } finally q2.stop()
  }

  test("streamed manifest equals batch manifest over the same sealed shards") {
    val s = spark
    import s.implicits._
    val events = (0L until 30L).map(i =>
      DocEvent(if (i % 3 == 0) "a" else "b", i, bytes((i % 5).toInt * 13 + 1)))
    val input = MemoryStream[DocEvent](s)
    val q = StreamShardEmit.sealedManifest(
        StreamShardEmit.emit(input.toDS(), budgetBytes = 150L))
      .writeStream.format("memory").queryName("livemanifest")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.take(11): _*)
      q.processAllAvailable()
      input.addData(events.drop(11): _*)
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT stream, shard_seq, n_records, n_bytes, flushed, content_digest
          |FROM livemanifest""".stripMargin).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getString(5))).toSet
      val batch = StreamShardEmit.sealedManifest(
        StreamShardEmit.batchReplay(events.toDS(), budgetBytes = 150L))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getString(5))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("live file landing: manifest-described on-disk set equals the seal chain") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-live-land").toString
    val events = (0L until 24L).map(i =>
      DocEvent(if (i % 2 == 0) "alpha" else "beta.2", i, bytes((i % 4).toInt * 17 + 1)))
    val input = MemoryStream[DocEvent](s)
    val q = StreamShardEmit.emit(input.toDS(), budgetBytes = 120L)
      .writeStream
      .foreachBatch(StreamShardEmit.sealedFileSink(dir))
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.take(9): _*)
      q.processAllAvailable()
      input.addData(events.drop(9): _*)
      q.processAllAvailable()
    } finally q.stop()
    // on-disk described set == the batch twin, digest for digest
    val want = StreamShardEmit.sealedManifest(
      StreamShardEmit.batchReplay(events.toDS(), budgetBytes = 120L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(5))).toSet
    val got = StreamShardEmit.readSealedFiles(spark, dir)
      .select("stream", "shard_seq", "n_records", "content_digest")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got == want && got.nonEmpty)
    // the on-disk BYTES re-parse through the gated reader
    StreamShardEmit.readSealedFiles(spark, dir).collect().foreach { r =>
      assert(TfRecords.parse(r.getAs[Array[Byte]]("data"))
        .numElements().toLong == r.getAs[Long]("n_records"))
    }
    // an undescribed file (crashed batch debris) is invisible to readers
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "ghost-000000099.tfrecord"),
      Array[Byte](1, 2, 3))
    assert(StreamShardEmit.readSealedFiles(spark, dir)
      .where("stream = 'ghost'").count() == 0)
  }

  test("landing a replayed micro-batch is idempotent") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-replay-land").toString
    val sealedShards = StreamShardEmit.batchReplay(
      (0L until 10L).map(i => DocEvent("s", i, bytes(40))).toDS(),
      budgetBytes = 120L)
    StreamShardEmit.landSealedBatch(sealedShards, dir, batchId = 7L)
    val first = StreamShardEmit.readSealedFiles(spark, dir).collect()
      .map(r => (r.getAs[String]("stream"), r.getAs[Long]("shard_seq"),
        md5Hex(r.getAs[Array[Byte]]("data")))).toSet
    // the replay rewrites identical files and re-describes the same rows
    StreamShardEmit.landSealedBatch(sealedShards, dir, batchId = 7L)
    val second = StreamShardEmit.readSealedFiles(spark, dir).collect()
      .map(r => (r.getAs[String]("stream"), r.getAs[Long]("shard_seq"),
        md5Hex(r.getAs[Array[Byte]]("data")))).toSet
    assert(second == first && first.nonEmpty)
    // one row per shard, not one per landing
    assert(StreamShardEmit.readSealedFiles(spark, dir).count() ==
      first.size.toLong)
  }

  test("wds streamed manifest equals batch manifest over the same sealed archives") {
    val s = spark
    import s.implicits._
    val events = (0L until 24L).map(i =>
      SampleEvent(if (i % 3 == 0) "a" else "b", i,
        Seq((s"$i.txt", bytes((i % 5).toInt * 13 + 1)))))
    val input = MemoryStream[SampleEvent](s)
    val q = StreamShardEmit.sealedWdsManifest(
        StreamShardEmit.emitWds(input.toDS(), budgetBytes = 4096L))
      .writeStream.format("memory").queryName("livewdsmanifest")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.take(9): _*)
      q.processAllAvailable()
      input.addData(events.drop(9): _*)
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[String]("stream"), r.getAs[Long]("shard_seq"),
          r.getAs[Long]("n_samples"), r.getAs[Long]("n_members"),
          r.getAs[Long]("n_bytes"), r.getAs[Boolean]("flushed"),
          r.getAs[String]("content_digest"))).toSet
      val streamed = rows(spark.table("livewdsmanifest"))
      val batch = rows(StreamShardEmit.sealedWdsManifest(
        StreamShardEmit.batchReplayWds(events.toDS(), budgetBytes = 4096L)))
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("wds live file landing: manifest-described on-disk tars equal the seal chain") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-land").toString
    val events = (0L until 20L).map(i =>
      SampleEvent(if (i % 2 == 0) "alpha" else "beta.2", i,
        Seq((s"$i.txt", bytes((i % 4).toInt * 17 + 1)),
          (s"$i.src", bytes(5)))))
    val input = MemoryStream[SampleEvent](s)
    val q = StreamShardEmit.emitWds(input.toDS(), budgetBytes = 4096L)
      .writeStream
      .foreachBatch(StreamShardEmit.sealedWdsFileSink(dir))
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.take(7): _*)
      q.processAllAvailable()
      input.addData(events.drop(7): _*)
      q.processAllAvailable()
    } finally q.stop()
    // on-disk described set == the batch twin, digest for digest
    val want = StreamShardEmit.sealedWdsManifest(
      StreamShardEmit.batchReplayWds(events.toDS(), budgetBytes = 4096L))
      .collect().map(r => (r.getAs[String]("stream"),
        r.getAs[Long]("shard_seq"), r.getAs[Long]("n_samples"),
        r.getAs[String]("content_digest"))).toSet
    val got = StreamShardEmit.readSealedWdsFiles(spark, dir)
      .select("stream", "shard_seq", "n_samples", "content_digest")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got == want && got.nonEmpty)
    // the on-disk BYTES re-walk through the gated tar reader, and a
    // replayed landing is idempotent
    val sealedShards = StreamShardEmit.batchReplayWds(events.toDS(),
      budgetBytes = 4096L)
    StreamShardEmit.landSealedWdsBatch(sealedShards, dir, batchId = 0L)
    StreamShardEmit.readSealedWdsFiles(spark, dir).collect().foreach { r =>
      assert(TarEntries.parse(r.getAs[Array[Byte]]("data"))
        .numElements().toLong == r.getAs[Long]("n_members"))
    }
    assert(StreamShardEmit.readSealedWdsFiles(spark, dir).count() ==
      got.size.toLong)
    // an undescribed file (crashed batch debris) is invisible to readers
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "ghost-000000099.tar"),
      Array[Byte](1, 2, 3))
    assert(StreamShardEmit.readSealedWdsFiles(spark, dir)
      .where("stream = 'ghost'").count() == 0)
  }

  test("webdataset keepalive flushes the trailing open archive too") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[SampleEvent](s)
    val q = StreamShardEmit.emitWds(input.toDS(), budgetBytes = 1L << 20,
      idleFlushMs = 200L)
      .writeStream.format("memory").queryName("wdsflush")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        SampleEvent("s", 0L, Seq(("0.txt", bytes(10)))),
        SampleEvent("s", 1L, Seq(("1.txt", bytes(10)))))
      await("wds idle flush") {
        spark.sql("SELECT * FROM wdsflush WHERE flushed").count() == 1
      }
      val r = spark.sql(
        "SELECT stream, shard_seq, n_samples, n_members, flushed FROM wdsflush")
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getBoolean(4))).toSeq
      assert(r == Seq(("s", 0L, 2L, 2L, true)))
      // the flushed archive is a complete, closed tar
      val data = spark.sql("SELECT data FROM wdsflush").collect()
        .head.getAs[Array[Byte]]("data")
      assert(TarEntries.parse(data).numElements() == 2)
    } finally q.stop()
  }
}
