package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.TfRecords
import graft.streaming.StreamShardEmit
import graft.streaming.StreamShardEmit.DocEvent

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
}
