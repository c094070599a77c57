package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{GzipMembers, HttpHead, WarcRecords}

/** Live crawl-container monitor: per source and tumbling window, what the
  * arriving `.warc.gz` blobs actually contain — gzip members recovered,
  * WARC records framed, payload bytes, HTTP status mix, and the
  * unknown-payload count. The streaming composition of the crawl stack
  * ([[graft.functions.GzipMembers]] → [[graft.functions.WarcRecords]] →
  * [[graft.functions.HttpHead]]): a crawler that starts shipping
  * truncated members, corrupt CRCs, or non-HTTP payloads moves
  * `n_members`-per-blob or `n_unknown_payload` within one window — long
  * before a nightly batch job would fail. The crawl twin of
  * [[StreamMediaStats]].
  *
  * Every count comes from the SAME stop-at-malformed parsers the batch
  * gates run (q_warc_gz / q_warc_http / q_warc_malformed), so streamed
  * counts are replayable by a batch pass over identical bytes — parity is
  * spec-pinned (the StreamParitySpec discipline), and a corrupted blob
  * contributes exactly its recoverable prefix, never an exception.
  *
  * At-arrival contract ([[StreamMediaStats]]/[[StreamDrift]] semantics):
  * rows process in minute order within each micro-batch; a late row folds
  * into the OPEN window rather than re-opening a closed report; a window
  * emits when the first row of a later window arrives. State per source
  * is eight counters and a window id — O(1) forever; blob bytes are never
  * retained in state. */
object StreamCrawlStats {

  final case class CrawlEvent(source: String, minute: Long, data: Array[Byte])

  final case class CrawlState(openWindow: Long, blobs: Long, members: Long,
      records: Long, bytes: Long, http2xx: Long, httpOther: Long,
      unknown: Long)

  final case class CrawlReport(source: String, window: Long, n_blobs: Long,
      n_members: Long, n_records: Long, n_payload_bytes: Long,
      n_http_2xx: Long, n_http_other: Long, n_unknown_payload: Long)

  /** One blob through the full stack: (members, records, payloadBytes,
    * http2xx, httpOther, unknownPayload). Bounded walks throughout —
    * malformed input yields the recoverable prefix, never a throw. */
  def audit(data: Array[Byte]): (Long, Long, Long, Long, Long, Long) = {
    val ms = GzipMembers.parse(data)
    var members = 0L
    var records = 0L
    var bytes = 0L
    var h2 = 0L
    var other = 0L
    var unk = 0L
    var i = 0
    while (i < ms.numElements()) {
      members += 1L
      val payloads = WarcRecords.parsePayloads(ms.getBinary(i))
      var j = 0
      while (j < payloads.numElements()) {
        records += 1L
        val p = payloads.getBinary(j)
        bytes += p.length.toLong
        val status = HttpHead.parse(p).getInt(0)
        if (status >= 200 && status < 300) h2 += 1L
        else if (status >= 0) other += 1L
        else unk += 1L
        j += 1
      }
      i += 1
    }
    (members, records, bytes, h2, other, unk)
  }

  private def emptyAt(w: Long) = CrawlState(w, 0L, 0L, 0L, 0L, 0L, 0L, 0L)

  private def fold(st: CrawlState, data: Array[Byte]): CrawlState = {
    val (m, r, b, h2, other, unk) = audit(data)
    CrawlState(st.openWindow, st.blobs + 1L, st.members + m,
      st.records + r, st.bytes + b, st.http2xx + h2,
      st.httpOther + other, st.unknown + unk)
  }

  private def report(source: String, st: CrawlState): CrawlReport =
    CrawlReport(source, st.openWindow, st.blobs, st.members, st.records,
      st.bytes, st.http2xx, st.httpOther, st.unknown)

  def monitor(events: Dataset[CrawlEvent],
      windowMinutes: Long = 1L): Dataset[CrawlReport] = {
    require(windowMinutes >= 1, s"windowMinutes must be >= 1: $windowMinutes")
    import events.sparkSession.implicits._
    val step: (String, Iterator[CrawlEvent], GroupState[CrawlState]) => Iterator[CrawlReport] = {
      case (source, rows, state) =>
        var st = state.getOption.getOrElse(emptyAt(Long.MinValue))
        val out = scala.collection.mutable.ArrayBuffer.empty[CrawlReport]
        rows.toSeq.sortBy(_.minute).foreach { r =>
          val w0 = java.lang.Math.floorDiv(r.minute, windowMinutes)
          val w = math.max(w0, st.openWindow)
          if (st.openWindow == Long.MinValue) st = st.copy(openWindow = w)
          else if (w > st.openWindow) {
            out += report(source, st)
            st = emptyAt(w)
          }
          st = fold(st, r.data)
        }
        state.update(st)
        out.iterator
    }
    events.groupByKey(_.source)
      .flatMapGroupsWithState[CrawlState, CrawlReport](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Batch replay of the same statistic — the parity oracle: group the
    * same events by (source, window) and fold each blob through the
    * identical audit. */
  def batchReplay(events: Dataset[CrawlEvent],
      windowMinutes: Long = 1L): Dataset[CrawlReport] = {
    import events.sparkSession.implicits._
    events.map(e => (e.source,
        java.lang.Math.floorDiv(e.minute, windowMinutes), e.data))
      .groupByKey(t => (t._1, t._2))
      .mapGroups { (key: (String, Long), rows: Iterator[(String, Long, Array[Byte])]) =>
        val (s, w) = key
        var st = emptyAt(w)
        rows.foreach(r => st = fold(st, r._3))
        report(s, st)
      }
  }
}
