package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.multimodal.ShardWriter

/** The file sink's crash-safety contract: `_SUCCESS` last, temp+rename
  * per blob, stale files cleaned on rewrite, reads refused without the
  * marker — the MessageStore discipline applied to shard output. */
class ShardFilesSpec extends SparkSpec {

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def emit(rows: Seq[(Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    ShardWriter.emitTfRecordShards(
      rows.map { case (sh, o, t) => (sh, o, t.getBytes("UTF-8")) }
        .toDF("shard", "order", "payload"))
  }

  test("write lands files + manifest + _SUCCESS; read round-trips the bytes") {
    val dir = tmpDir("graft-files-rt")
    val shards = emit(Seq((0L, 0L, "alpha"), (0L, 1L, "beta"), (1L, 0L, "gamma")))
    val returned = ShardWriter.writeTfRecordShardFiles(shards, dir)
    assert(Files.exists(Paths.get(dir, "_SUCCESS")))
    assert(Files.exists(Paths.get(dir, "shard-00000.tfrecord")))
    assert(Files.exists(Paths.get(dir, "shard-00001.tfrecord")))
    // on-disk bytes ARE the emitted blobs
    val want = shards.collect()
      .map(r => r.getAs[Long]("shard") -> md5Hex(r.getAs[Array[Byte]]("data")))
      .toMap
    val got = ShardWriter.readShardFiles(spark, dir, "tfrecord").collect()
      .map(r => r.getAs[Long]("shard") -> md5Hex(r.getAs[Array[Byte]]("data")))
      .toMap
    assert(got == want)
    // the persisted manifest is the content manifest, and is what the
    // writer returned
    val stored = ShardWriter.readShardManifest(spark, dir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_records"),
        r.getAs[String]("content_digest"))).toSet
    val fresh = ShardWriter.tfRecordManifest(shards).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_records"),
        r.getAs[String]("content_digest"))).toSet
    assert(stored == fresh)
    assert(returned.collect().map(_.getAs[Long]("shard")).toSet == Set(0L, 1L))
  }

  test("a directory without _SUCCESS is refused — crashed writes are not data") {
    val dir = tmpDir("graft-files-crash")
    // simulate a crash mid-write: a blob file exists, the marker doesn't
    Files.write(Paths.get(dir, "shard-00000.tfrecord"), Array[Byte](1, 2, 3))
    val e1 = intercept[IllegalArgumentException](
      ShardWriter.readShardFiles(spark, dir, "tfrecord"))
    assert(e1.getMessage.contains("_SUCCESS"))
    val e2 = intercept[IllegalArgumentException](
      ShardWriter.readShardManifest(spark, dir))
    assert(e2.getMessage.contains("_SUCCESS"))
  }

  test("rewrite invalidates first and cleans stale shard files") {
    val dir = tmpDir("graft-files-rewrite")
    ShardWriter.writeTfRecordShardFiles(
      emit(Seq((0L, 0L, "a"), (1L, 0L, "b"), (7L, 0L, "stale"))), dir)
    assert(Files.exists(Paths.get(dir, "shard-00007.tfrecord")))
    // second write has FEWER shards: the v1 leftover must not survive to
    // masquerade as current data
    ShardWriter.writeTfRecordShardFiles(
      emit(Seq((0L, 0L, "a2"), (1L, 0L, "b2"))), dir)
    assert(!Files.exists(Paths.get(dir, "shard-00007.tfrecord")))
    assert(ShardWriter.readShardFiles(spark, dir, "tfrecord")
      .collect().map(_.getAs[Long]("shard")).toSet == Set(0L, 1L))
  }

  test("webdataset twin: tar files land and re-parse through the tar reader") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-files-wds")
    val samples = Seq(
      (0L, 0L, Seq(("0.txt", "zero".getBytes("UTF-8")))),
      (1L, 0L, Seq(("1.txt", "one".getBytes("UTF-8")),
        ("1.cls", "x".getBytes("UTF-8")))))
      .toDF("shard", "order", "members")
      .select(col("shard"), col("order"),
        transform(col("members"),
          m => struct(m.getField("_1").as("name"),
            m.getField("_2").as("data"))).as("members"))
    ShardWriter.writeWebDatasetShardFiles(
      ShardWriter.emitWebDatasetShards(samples), dir)
    val names = ShardWriter.readShardFiles(spark, dir, "tar")
      .select(col("shard"),
        explode(graft.functions.TarEntries.tar_entries(col("data")))
          .as("e"))
      .select(col("shard"), col("e.name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(names == Set((0L, "0.txt"), (1L, "1.txt"), (1L, "1.cls")))
    assert(ShardWriter.readShardManifest(spark, dir)
      .collect().map(_.getAs[Long]("n_members")).sum == 3L)
  }

  test("incremental re-emit: unchanged blobs carry over, only flagged shards rebuild") {
    val s = spark
    import s.implicits._
    def records(edit: Boolean) = (0L until 40L).map { i =>
      val text = if (edit && i % 10 == 3) s"doc $i CHANGED" else s"doc $i"
      (i % 8, i, text.getBytes("UTF-8"))
    }.toDF("shard", "order", "payload")
    val prev = ShardWriter.emitTfRecordShards(records(edit = false))
      .localCheckpoint(true)
    val curr = records(edit = true)
    val work = ShardWriter.shardDiff(
      ShardWriter.tfRecordManifest(prev),
      ShardWriter.tfRecordManifest(ShardWriter.emitTfRecordShards(curr)))
    // edits hit i = 3, 13, 23, 33 -> shards (i % 8) = {3, 5, 7, 1}
    val flagged = work.filter(col("status") =!= "unchanged")
      .collect().map(_.getAs[Long]("shard")).toSet
    assert(flagged == Set(3L, 5L, 7L, 1L))
    val combined = ShardWriter.reemitChanged(prev, curr, work)
    // hash-for-hash equal to the full re-emit
    def digests(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("shard") ->
        md5Hex(r.getAs[Array[Byte]]("data"))).toMap
    assert(digests(combined) ==
      digests(ShardWriter.emitTfRecordShards(curr)))
    // and the carried blobs are REFERENCE-equal to prev's bytes (same
    // digest map restricted to unchanged shards)
    val prevD = digests(prev)
    val combD = digests(combined)
    (0L until 8L).filterNot(flagged).foreach(sh =>
      assert(combD(sh) == prevD(sh)))
  }

  test("recordManifest equals the framed manifest without moving payloads") {
    val s = spark
    import s.implicits._
    val rows = (0L until 120L).map { i =>
      val payload: Array[Byte] =
        if (i % 17 == 0) null
        else if (i % 11 == 0) Array.emptyByteArray
        else s"payload $i ${"x" * (i % 23).toInt}".getBytes("UTF-8")
      (i % 9, i, payload)
    }.toDF("shard", "order", "payload")
    val framed = ShardWriter.tfRecordManifest(
      ShardWriter.emitTfRecordShards(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val direct = ShardWriter.recordManifest(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(direct == framed && direct.nonEmpty)
  }

  test("sync rewrites only changed files; unchanged files are untouched on disk") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-files-sync")
    def corpus(edit: Boolean) = (0L until 40L).map { i =>
      val text =
        if (edit && i == 13L) s"doc $i EDITED"     // changes shard 13 % 8 = 5
        else s"doc $i"
      (i % 8, i, text.getBytes("UTF-8"))
    }.filterNot { case (_, i, _) => edit && i == 7L } // removes from shard 7
      .toDF("shard", "order", "payload")
    // v1: bootstrap through the sync API itself (no marker -> full write)
    val boot = ShardWriter.syncTfRecordShardFiles(corpus(edit = false), dir)
    assert(boot.collect().forall(_.getAs[Long]("rewritten") == 1L))
    val mtime1 = (0L until 8L).map(sh => sh ->
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, f"shard-$sh%05d.tfrecord")).toMillis).toMap
    Thread.sleep(1100) // mtime granularity
    // v2: one doc edited (shard 5), one doc removed (shard 7 shrinks)
    val sync = ShardWriter.syncTfRecordShardFiles(corpus(edit = true), dir)
      .collect().map(r => r.getAs[Long]("shard") ->
        r.getAs[Long]("rewritten")).toMap
    assert(sync(5L) == 1L && sync(7L) == 1L)
    assert((0L until 8L).filterNot(Set(5L, 7L)).forall(sync(_) == 0L))
    // untouched shards kept their files byte- AND mtime-identical
    (0L until 8L).filterNot(Set(5L, 7L)).foreach { sh =>
      val t = java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, f"shard-$sh%05d.tfrecord")).toMillis
      assert(t == mtime1(sh), s"shard $sh was rewritten")
    }
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, "shard-00005.tfrecord")).toMillis
      > mtime1(5L))
    // the synced directory equals a FULL write of v2, digest for digest
    val full = tmpDir("graft-files-sync-full")
    ShardWriter.writeTfRecordShardFiles(
      ShardWriter.emitTfRecordShards(corpus(edit = true)), full)
    def state(d: String) = ShardWriter.readShardFiles(spark, d, "tfrecord")
      .collect().map(r => r.getAs[Long]("shard") ->
        md5Hex(r.getAs[Array[Byte]]("data"))).toMap
    assert(state(dir) == state(full))
    // and the stored manifest describes exactly the new corpus
    val man = ShardWriter.readShardManifest(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("shard")),
        r.getAs[Long]("n_records"), r.getAs[String]("content_digest"))).toSet
    val want = ShardWriter.recordManifest(corpus(edit = true)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(man == want)
  }

  test("sync deletes files for removed shards") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-files-sync-rm")
    val v1 = Seq((0L, 0L, "a"), (1L, 1L, "b"), (9L, 2L, "gone"))
      .map { case (sh, o, t) => (sh, o, t.getBytes("UTF-8")) }
      .toDF("shard", "order", "payload")
    ShardWriter.syncTfRecordShardFiles(v1, dir)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "shard-00009.tfrecord")))
    val v2 = Seq((0L, 0L, "a"), (1L, 1L, "b"))
      .map { case (sh, o, t) => (sh, o, t.getBytes("UTF-8")) }
      .toDF("shard", "order", "payload")
    val out = ShardWriter.syncTfRecordShardFiles(v2, dir)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "shard-00009.tfrecord")))
    assert(out.collect().map(_.getAs[Long]("shard")).toSet == Set(0L, 1L))
    assert(ShardWriter.readShardFiles(spark, dir, "tfrecord")
      .collect().map(_.getAs[Long]("shard")).toSet == Set(0L, 1L))
  }

  test("an undescribed shard file is invisible to readers, even across a sync") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-files-foreign")
    def corpus(v2: Boolean) =
      Seq((0L, 0L, "a"), (1L, 1L, if (v2) "b2" else "b"))
        .map { case (sh, o, t) => (sh, o, t.getBytes("UTF-8")) }
        .toDF("shard", "order", "payload")
    ShardWriter.syncTfRecordShardFiles(corpus(v2 = false), dir)
    // a foreign writer drops an undescribed file into the marked dir
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-99999.tfrecord"),
      Array[Byte](1, 2, 3))
    assert(ShardWriter.readShardFiles(spark, dir, "tfrecord")
      .collect().map(_.getAs[Long]("shard")).toSet == Set(0L, 1L))
    // the incremental sync neither rewrites nor deletes it (it is in
    // neither manifest) — readers must STILL not see it
    ShardWriter.syncTfRecordShardFiles(corpus(v2 = true), dir)
    assert(ShardWriter.readShardFiles(spark, dir, "tfrecord")
      .collect().map(_.getAs[Long]("shard")).toSet == Set(0L, 1L))
  }

  test("sampleManifest equals the framed tar manifest without moving payloads") {
    val s = spark
    import s.implicits._
    val rows = (0L until 60L).map { i =>
      val members: Seq[(String, Array[Byte])] =
        if (i % 19 == 0) Seq.empty
        else if (i % 13 == 0) Seq((null, "x".getBytes("UTF-8")),
          (s"$i.bin", null))
        else Seq((s"$i.txt", s"text $i".getBytes("UTF-8")),
          (s"$i.src", ("s" * (i % 9).toInt).getBytes("UTF-8")))
      (i % 7, i, members)
    }.toDF("shard", "order", "members")
      .select(col("shard"), col("order"),
        transform(col("members"),
          m => struct(m.getField("_1").as("name"),
            m.getField("_2").as("data"))).as("members"))
    val framed = ShardWriter.tarManifest(
      ShardWriter.emitWebDatasetShards(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    val direct = ShardWriter.sampleManifest(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(direct == framed && direct.nonEmpty)
  }

  test("webdataset sync rewrites only changed tar files") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-wds-sync")
    def corpus(edit: Boolean) = (0L until 24L).map { i =>
      val text = if (edit && i == 9L) s"doc $i EDITED" else s"doc $i"
      (i % 6, i, Seq((s"$i.txt", text.getBytes("UTF-8"))))
    }.toDF("shard", "order", "members")
      .select(col("shard"), col("order"),
        transform(col("members"),
          m => struct(m.getField("_1").as("name"),
            m.getField("_2").as("data"))).as("members"))
    ShardWriter.syncWebDatasetShardFiles(corpus(edit = false), dir)
    val mtime1 = (0L until 6L).map(sh => sh ->
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, f"shard-$sh%05d.tar")).toMillis).toMap
    Thread.sleep(1100)
    // i = 9 -> shard 3 changes; everything else untouched
    val sync = ShardWriter.syncWebDatasetShardFiles(corpus(edit = true), dir)
      .collect().map(r => r.getAs[Long]("shard") ->
        r.getAs[Long]("rewritten")).toMap
    assert(sync(3L) == 1L)
    assert((0L until 6L).filterNot(_ == 3L).forall(sync(_) == 0L))
    (0L until 6L).filterNot(_ == 3L).foreach { sh =>
      assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, f"shard-$sh%05d.tar")).toMillis
        == mtime1(sh), s"shard $sh was rewritten")
    }
    // synced dir equals a full write, digest for digest
    val full = tmpDir("graft-wds-sync-full")
    ShardWriter.writeWebDatasetShardFiles(
      ShardWriter.emitWebDatasetShards(corpus(edit = true)), full)
    def state(d: String) = ShardWriter.readShardFiles(spark, d, "tar")
      .collect().map(r => r.getAs[Long]("shard") ->
        md5Hex(r.getAs[Array[Byte]]("data"))).toMap
    assert(state(dir) == state(full))
  }
}
