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
}
