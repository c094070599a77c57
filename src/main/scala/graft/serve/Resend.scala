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
      format: String = "object", version: Option[Int] = None): Iterator[Frame] =
    envelope(Formats.format(
      BrokerQueries.requestLast(streamData, streamId, partition, n), format, version))

  def from(streamData: DataFrame, streamId: String, partition: Int, ref: MsgRef,
      format: String = "object", version: Option[Int] = None,
      publisher: Option[String] = None): Iterator[Frame] =
    envelope(Formats.format(
      BrokerQueries.requestFrom(streamData, streamId, partition, ref, publisher),
      format, version))

  def range(streamData: DataFrame, streamId: String, partition: Int,
      fromRef: MsgRef, toRef: MsgRef, format: String = "object",
      version: Option[Int] = None, publisher: Option[String] = None,
      msgChain: Option[String] = None): Iterator[Frame] =
    envelope(Formats.format(
      BrokerQueries.requestRange(streamData, streamId, partition, fromRef, toRef,
        publisher, msgChain),
      format, version))
}

/** Live-subscription registry (R1): bounded queues per (subscriber,
  * stream-part), routed by stream-part key — one subscriber may hold many
  * concurrent subscriptions, like one reference connection subscribing to
  * many stream-parts (`WebsocketServer.ts:327-345`). Plugs into
  * `IngestPipeline.start(onBatch = registry.dispatch)`; `resendThenLive`
  * serves the R5 contract.
  *
  * Dispatch runs the routing/format pass distributed (filter + both wire
  * shapes rendered in-plan), then delivers driver-side through
  * `toLocalIterator` — one result partition in driver memory at a time,
  * never a full `collect()`. Delivery must be driver-side because the
  * subscription queues live in the JVM that called `subscribe` (the
  * driver): an executor-side `foreachPartition` would resolve an empty
  * process-local registry on any multi-executor cluster and silently drop
  * every message. The delivered stream is small by construction — already
  * filtered to subscribed stream-parts — so the driver hop is bounded by
  * subscriber demand, not batch size. */
final class SubscriptionRegistry(queueCapacity: Int = 10000) extends AutoCloseable {

  final case class Subscription(subscriberId: String, streamId: String, partition: Int,
      queue: LinkedBlockingQueue[String], format: String = "object") {
    // validated at construction so a directly-built Subscription can't
    // reach offer()'s dispatch with a name that silently serves `object`
    require(Set("object", "protocol", "raw")(format),
      s"Unknown format '$format' (supported: object, protocol, raw)")
  }

  private val subs = new ConcurrentHashMap[(String, String, Int), Subscription]()

  private def key(streamId: String, partition: Int) = s"$streamId::$partition"

  /** Register a subscription; `format` picks the wire shape of delivered
    * messages (`object` | `protocol` | `raw`), like the reference's
    * per-connection payload format. An unknown name is rejected here, at
    * registration — not silently served as `object` on every dispatch. */
  def subscribe(subscriberId: String, streamId: String, partition: Int,
      format: String = "object"): Subscription = {
    val s = Subscription(subscriberId, streamId, partition,
      new LinkedBlockingQueue[String](queueCapacity), format)
    subs.put((subscriberId, streamId, partition), s)
    s
  }

  /** Drop one subscription of the subscriber (others stay live). */
  def unsubscribe(subscriberId: String, streamId: String, partition: Int): Unit =
    subs.remove((subscriberId, streamId, partition))

  /** Drop ALL the subscriber's subscriptions (connection close). */
  def unsubscribe(subscriberId: String): Unit =
    subs.keySet().asScala.filter(_._1 == subscriberId).foreach(subs.remove)

  /** Offer a message to every subscription of its stream-part, each in its
    * own format; a full queue drops oldest-first, the bounded-buffer
    * behavior of the reference's backpressure close (`Connection.ts:17-18`
    * + `RequestHandler.ts:356-363`). Called from the driver-side dispatch
    * loop ([[dispatch]] pulls formatted rows via `toLocalIterator`). */
  private[serve] def offer(streamId: String, partition: Int,
      objectMsg: String, protocolMsg: String): Unit =
    subs.values().asScala.foreach { s =>
      if (s.streamId == streamId && s.partition == partition) {
        val msg = s.format match {
          case "protocol" | "raw" => protocolMsg
          case _                  => objectMsg
        }
        if (!s.queue.offer(msg)) { s.queue.poll(); s.queue.offer(msg) }
      }
    }

  /** Route a prepared micro-batch to matching subscriptions: one
    * distributed filter+format pass (both wire shapes rendered in-plan —
    * two narrow string concats per row), then a driver-side pull over
    * `toLocalIterator` into the queues. The queues only exist in this JVM,
    * so delivery happens here; the distributed plan has already shrunk the
    * batch to subscribed stream-parts. */
  def dispatch(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val wanted = subs.values().asScala
      .map(s => key(s.streamId, s.partition)).toSet
    if (wanted.isEmpty) return
    batch
      .filter(graft.functions.Scalars
        .streamPartKey(col("stream_id"), col("stream_partition"))
        .isInCollection(wanted))
      .select(col("stream_id"), col("stream_partition"),
        Formats.objectJson.as("msg_object"), Formats.protocolJson.as("msg_protocol"))
      .toLocalIterator().asScala
      .foreach(r => offer(r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
  }

  /** R5 — historical resend frames first, then the live queue's drain
    * iterator (caller polls the queue for subsequent batches). */
  def resendThenLive(
      streamData: DataFrame, subscriberId: String,
      streamId: String, partition: Int, lastN: Int,
      format: String = "object"): Iterator[Resend.Frame] = {
    val sub = subscribe(subscriberId, streamId, partition, format)
    Resend.last(streamData, streamId, partition, lastN, format) ++
      Iterator.continually(sub.queue.poll())
        .takeWhile(_ != null)
        .map(Resend.Unicast.apply)
  }

  /** Drop all subscriptions (engine shutdown). */
  override def close(): Unit = subs.clear()
}
