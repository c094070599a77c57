package graft

import org.apache.spark.sql.functions._

import graft.operators.BrokerQueries
import graft.operators.BrokerQueries.MsgRef

/** Port of the reference's operator-semantics corpus
  * (test/integration/storage/Storage.test.ts:95-391, via FIXTURES.md §4).
  * Every expected array is the reference's own, asserted in order.
  */
class BrokerQueriesSpec extends SparkSpec {

  private val sid = "stream-id"

  test("requestLast: N most recent, ascending (Storage.test.ts:154-176)") {
    val sd = streamDataOf(
      msg(sid, 10, 0, 0), msg(sid, 10, 1000, 0), msg(sid, 10, 2000, 0),
      msg(sid, 10, 3000, 0), msg(sid, 10, 3000, 3), msg(sid, 10, 3000, 2, "publisher2"),
      msg(sid, 10, 3000, 1), msg(sid, 10, 4000, 0),
      msg(sid, 666, 8000, 0), msg(s"$sid-wrong", 10, 8000, 0))
    val got = keysOf(BrokerQueries.requestLast(sd, sid, 10, 3))
    assert(got == Seq(
      (3000L, 2, "publisher2", "1"), (3000L, 3, "publisher", "1"), (4000L, 0, "publisher", "1")))
  }

  test("requestLast: clamp to MAX_RESEND_LAST and empty results (Storage.ts:102-105, test:95-121)") {
    val sd = streamDataOf(msg(sid, 10, 1000, 0))
    assert(BrokerQueries.requestLast(sd, sid, 10, 100000).count() == 1)
    assert(BrokerQueries.requestLast(sd, "unknown", 10, 3).count() == 0)
    assert(BrokerQueries.requestLast(sd, sid, 99, 3).count() == 0)
  }

  test("requestLastGrouped: per-part last-N matches per-part requestLast") {
    val sd = streamDataOf(
      msg(sid, 10, 0, 0), msg(sid, 10, 1000, 0), msg(sid, 10, 2000, 0),
      msg(sid, 10, 3000, 0), msg(sid, 10, 3000, 1),
      msg(sid, 666, 8000, 0), msg(s"$sid-b", 10, 500, 0))
    val grouped = BrokerQueries.requestLastGrouped(sd, 2)
    assert(grouped.count() == 4) // 2 + 1 + 1 across the three parts
    val part10 = keysOf(grouped
      .filter(col("stream_id") === sid && col("stream_partition") === 10)
      .orderBy(col("ts"), col("sequence_no")))
    assert(part10 == keysOf(BrokerQueries.requestLast(sd, sid, 10, 2)))
  }

  test("requestFrom: happy path (Storage.test.ts:178-204)") {
    val sd = streamDataOf(
      msg(sid, 10, 0, 0), msg(sid, 10, 1000, 0), msg(sid, 10, 2000, 0),
      msg(sid, 10, 3000, 0), msg(sid, 10, 3000, 3), msg(sid, 10, 3000, 2, "publisher", "2"),
      msg(sid, 10, 3000, 1), msg(sid, 10, 4000, 0),
      msg(sid, 666, 8000, 0), msg(s"$sid-wrong", 10, 8000, 0))
    val got = keysOf(BrokerQueries.requestFrom(sd, sid, 10, MsgRef(3000, 0)))
    assert(got == Seq(
      (3000L, 0, "publisher", "1"), (3000L, 1, "publisher", "1"), (3000L, 2, "publisher", "2"),
      (3000L, 3, "publisher", "1"), (4000L, 0, "publisher", "1")))
  }

  test("requestFrom: with sequenceNo, publisher and msgChainId (Storage.test.ts:206-229)") {
    val sd = streamDataOf(
      msg(sid, 10, 0, 0, "publisher1"), msg(sid, 10, 1000, 0, "publisher2"),
      msg(sid, 10, 2000, 0, "publisher3"), msg(sid, 10, 3000, 0, "publisher1"),
      msg(sid, 10, 3000, 3, "publisher1"), msg(sid, 10, 3000, 2, "publisher2"),
      msg(sid, 10, 3000, 1, "publisher1"), msg(sid, 10, 3000, 1, "publisher1", "2"),
      msg(sid, 10, 4000, 0, "publisher3"), msg(sid, 10, 8000, 0, "publisher1"),
      msg(s"$sid-wrong", 10, 8000, 0, "publisher1", "1"))
    val got = keysOf(BrokerQueries.requestFrom(sd, sid, 10, MsgRef(3000, 1),
      publisher = Some("publisher1"), msgChain = Some("1")))
    assert(got == Seq(
      (3000L, 1, "publisher1", "1"), (3000L, 3, "publisher1", "1"), (8000L, 0, "publisher1", "1")))
  }

  test("requestRange: happy path (Storage.test.ts:232-258)") {
    val sd = streamDataOf(
      msg(sid, 10, 0, 0), msg(sid, 10, 1000, 0), msg(sid, 10, 2000, 0),
      msg(sid, 10, 2500, 0), msg(sid, 10, 2500, 2, "publisher2"), msg(sid, 10, 2500, 1),
      msg(sid, 10, 3000, 0), msg(sid, 666, 2500, 0), msg(sid, 10, 4000, 0),
      msg(s"$sid-wrong", 10, 3000, 0))
    val got = keysOf(BrokerQueries.requestRange(sd, sid, 10, MsgRef(1500, 0), MsgRef(3500, 0)))
    assert(got == Seq(
      (2000L, 0, "publisher", "1"), (2500L, 0, "publisher", "1"), (2500L, 1, "publisher", "1"),
      (2500L, 2, "publisher2", "1"), (3000L, 0, "publisher", "1")))
  }

  test("requestRange: only one message (Storage.test.ts:260-266)") {
    val sd = streamDataOf(msg(sid, 10, 2000, 0))
    assert(keysOf(BrokerQueries.requestRange(sd, sid, 10, MsgRef(1500, 0), MsgRef(3500, 0)))
      == Seq((2000L, 0, "publisher", "1")))
  }

  test("requestRange: with sequenceNo bounds, publisher and msgChainId (Storage.test.ts:268-292)") {
    val sd = streamDataOf(
      msg(sid, 10, 0, 0, "publisher1"), msg(sid, 10, 1500, 0, "publisher1"),
      msg(sid, 10, 2000, 0, "publisher1"), msg(sid, 10, 2500, 0, "publisher3"),
      msg(sid, 10, 3000, 0, "publisher1"), msg(sid, 10, 3000, 0, "publisher1", "2"),
      msg(sid, 10, 3000, 3, "publisher1"), msg(sid, 10, 3000, 2, "publisher1"),
      msg(sid, 10, 3000, 1, "publisher1"), msg(sid, 10, 8000, 0, "publisher1"),
      msg(s"$sid-wrong", 10, 8000, 0, "publisher1"))
    val got = keysOf(BrokerQueries.requestRange(sd, sid, 10, MsgRef(1500, 3), MsgRef(3000, 2),
      publisher = Some("publisher1"), msgChain = Some("1")))
    assert(got == Seq(
      (2000L, 0, "publisher1", "1"), (3000L, 0, "publisher1", "1"),
      (3000L, 1, "publisher1", "1"), (3000L, 2, "publisher1", "1")))
  }

  test("multiple buckets: full range returns all, disjoint ranges return [] (Storage.test.ts:295-313)") {
    // 60 messages spanning 123000000..456000000 like storeMockMessages
    val n = 60
    val msgs = (0 until n).map { i =>
      val ts = 123000000L + (456000000L - 123000000L) / (n - 1) * i
      msg(sid, 777, ts, 0, s"publisher$i")
    }
    val sd = streamDataOf(msgs: _*)
    assert(BrokerQueries.requestRange(sd, sid, 777, MsgRef(100000000L, 0), MsgRef(555000000L, 0)).count() == n)
    assert(BrokerQueries.requestRange(sd, sid, 777, MsgRef(460000000L, 0), MsgRef(470000000L, 0)).count() == 0)
    assert(BrokerQueries.requestRange(sd, sid, 777, MsgRef(100000000L, 0), MsgRef(110000000L, 0)).count() == 0)
  }

  test("metadata: first/last ts, count, bytes (Storage.test.ts:334-391)") {
    val sd = streamDataOf(
      msg(sid, 10, 2000, 3), msg(sid, 10, 3000, 2, "publisher2"), msg(sid, 10, 4000, 0))
    val row = BrokerQueries.metadata(sd)
      .filter(col("stream_id") === sid && col("stream_partition") === 10)
      .collect()(0)
    assert(row.getAs[Long]("message_count") == 3)
    assert(row.getAs[Long]("total_bytes") > 0)
    assert(row.getAs[java.time.LocalDateTime]("first_ts") == ldt(2000))
    assert(row.getAs[java.time.LocalDateTime]("last_ts") == ldt(4000))
  }

  test("retention: bucket expires only when MAX(ts) is older than cutoff (DeleteExpiredCmd.ts:135-161)") {
    val h = 3600_000L
    val sd = streamDataOf(
      msg(sid, 0, 0 * h, 0),              // bucket hour 0, max ts < cutoff -> expired
      msg(sid, 0, 1 * h, 0),              // bucket hour 1 ...
      msg(sid, 0, 1 * h + 30 * 60_000, 0), // ... max ts still < cutoff -> expired
      msg(sid, 0, 2 * h, 0),              // bucket hour 2: starts before cutoff
      msg(sid, 0, 2 * h + 45 * 60_000, 0)) // but max ts after cutoff -> retained
    val cutoff = MsgRef(2 * h + 20 * 60_000, 0)
    val expired = BrokerQueries.expiredBuckets(sd, cutoff).collect()
      .map(_.getAs[java.time.LocalDateTime]("bucket_ts")).toSet
    assert(expired == Set(ldt(0), ldt(h)))
    val retained = BrokerQueries.retainUnexpired(sd, cutoff)
    assert(keysOf(retained.orderBy(col("ts"))).map(_._1) == Seq(2 * h, 2 * h + 45 * 60_000))
  }
}
