package graft.serve

import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.BrokerQueries
import graft.operators.BrokerQueries.MsgRef

/** The serving layer's resend + live-subscription contract (SURVEY §3.2,
  * R1/R5/R6) — the reference's WebSocket RequestHandler envelope
  * (`src/websocket/RequestHandler.ts:137-215`) over DataFrame plans:
  *
  *  - a resend answers with `resending` → one `unicast` per message →
  *    `resent`, or a single `no_resend` when empty
  *    (`RequestHandler.ts:151-215`);
  *  - delivery is pull-based over `toLocalIterator` — one partition of
  *    result rows in driver memory at a time, the engine-side analog of the
  *    reference's pause/resume backpressure (R6, `Connection.ts:70-80`);
  *  - live fan-out (R1) routes each ingested micro-batch to the
  *    subscriptions of its stream-part (`WebsocketServer.ts:327-345`);
  *    resend-while-live = envelope first, then the live queue (R5).
  */
object Resend {

  sealed trait Frame { def kind: String }
  final case class Resending() extends Frame { val kind = "resending" }
  final case class Unicast(msg: String) extends Frame { val kind = "unicast" }
  final case class Resent() extends Frame { val kind = "resent" }
  final case class NoResend() extends Frame { val kind = "no_resend" }

  /** Wrap a formatted result plan in the resend envelope, lazily: the first
    * row decides resending-vs-no_resend, rows stream as unicasts. */
  def envelope(formatted: DataFrame): Iterator[Frame] = {
    val rows: Iterator[Row] = formatted.toLocalIterator().asScala
    if (!rows.hasNext) Iterator(NoResend())
    else Iterator(Resending()) ++ rows.map(r => Unicast(r.getString(0))) ++
      Iterator(Resent())
  }

  /** The three resend shapes, pre-formatted (`format`: object|protocol|raw). */
  def last(streamData: DataFrame, streamId: String, partition: Int, n: Int,
      format: String = "object"): Iterator[Frame] =
    envelope(Formats.format(
      BrokerQueries.requestLast(streamData, streamId, partition, n), format))

  def from(streamData: DataFrame, streamId: String, partition: Int, ref: MsgRef,
      format: String = "object"): Iterator[Frame] =
    envelope(Formats.format(
      BrokerQueries.requestFrom(streamData, streamId, partition, ref), format))

  def range(streamData: DataFrame, streamId: String, partition: Int,
      fromRef: MsgRef, toRef: MsgRef, format: String = "object"): Iterator[Frame] =
    envelope(Formats.format(
      BrokerQueries.requestRange(streamData, streamId, partition, fromRef, toRef), format))
}

/** Live-subscription registry (R1): bounded queues per subscriber, routed
  * by stream-part key. Plugs into `IngestPipeline.start(onBatch = registry
  * .dispatch)`; `resendThenLive` serves the R5 contract. */
final class SubscriptionRegistry(queueCapacity: Int = 10000) {

  final case class Subscription(streamId: String, partition: Int,
      queue: LinkedBlockingQueue[String])

  private val subs = new ConcurrentHashMap[String, Subscription]()

  private def key(streamId: String, partition: Int) = s"$streamId::$partition"

  def subscribe(subscriberId: String, streamId: String, partition: Int): Subscription = {
    val s = Subscription(streamId, partition, new LinkedBlockingQueue[String](queueCapacity))
    subs.put(subscriberId, s)
    s
  }

  def unsubscribe(subscriberId: String): Unit = subs.remove(subscriberId)

  /** Route a prepared micro-batch to matching subscriptions. The batch is
    * collected once per distinct stream-part present in it (micro-batches
    * are small by construction); a full queue drops oldest-first, the
    * bounded-buffer behavior of the reference's backpressure close
    * (`Connection.ts:17-18` + `RequestHandler.ts:356-363`). */
  def dispatch(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val active = subs.values().asScala.toSeq
    if (active.isEmpty) return
    val wanted = active.map(s => key(s.streamId, s.partition)).toSet
    // one distributed format+filter pass; only subscribed stream-parts are
    // collected, grouped driver-side by exact routing key
    val routed = batch
      .filter(concat_ws("::", col("stream_id"), col("stream_partition"))
        .isInCollection(wanted))
      .select(col("stream_id"), col("stream_partition"), Formats.objectJson.as("msg"))
      .collect()
      .groupBy(r => key(r.getString(0), r.getInt(1)))
    active.foreach { s =>
      routed.getOrElse(key(s.streamId, s.partition), Array.empty).foreach { r =>
        val msg = r.getString(2)
        if (!s.queue.offer(msg)) { s.queue.poll(); s.queue.offer(msg) }
      }
    }
  }

  /** R5 — historical resend frames first, then the live queue's drain
    * iterator (caller polls the queue for subsequent batches). */
  def resendThenLive(
      streamData: DataFrame, subscriberId: String,
      streamId: String, partition: Int, lastN: Int): Iterator[Resend.Frame] = {
    val sub = subscribe(subscriberId, streamId, partition)
    Resend.last(streamData, streamId, partition, lastN) ++
      Iterator.continually(sub.queue.poll())
        .takeWhile(_ != null)
        .map(Resend.Unicast.apply)
  }
}
