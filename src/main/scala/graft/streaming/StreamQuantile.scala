package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.KllSketch

/** Streaming quantile monitoring — the live counterpart of the batch
  * [[graft.functions.QuantileSketchAgg]] (q_quantile_sketch): per group
  * (stream, endpoint, tenant …), fold every observation into a mergeable
  * KLL sketch held in keyed state and emit a (count, p50, p90, p99)
  * snapshot after every micro-batch — continuous latency/size percentile
  * dashboards without ever retaining the observations.
  *
  * The batch aggregate and this stream share ONE sketch implementation
  * ([[KllSketch]], deterministic alternating-parity compaction), so a
  * live p99 and a backfill p99 computed over the same prefix agree
  * exactly: micro-batching only partitions the insertion sequence, which
  * is the same sequential fold the batch TypedImperativeAggregate
  * performs per partition. Within a micro-batch, rows fold in `seq`
  * order, making snapshots independent of shuffle arrival order.
  *
  * Scale: state per group is the sketch's O(k·log(n/k)) retained items
  * serialized to bytes (the identical wire form the batch aggregate
  * shuffles), independent of stream length; groups shard across
  * executors by key — the bounded-keyed-state shape of [[StreamAnomaly]]
  * / [[StreamHeavyHitters]], and the serialized state checkpoint-restores
  * across query restarts. */
object StreamQuantile {

  final case class Obs(group: String, seq: Long, value: Double)

  final case class QSnapshot(group: String, n: Long, retained: Int,
      p50: Double, p90: Double, p99: Double)

  def quantiles(obs: Dataset[Obs], k: Int = 200): Dataset[QSnapshot] = {
    require(k >= 8, s"k must be at least 8: $k")
    import obs.sparkSession.implicits._
    val step: (String, Iterator[Obs], GroupState[Array[Byte]]) => Iterator[QSnapshot] = {
      case (group, rows, state) =>
        val sk = state.getOption.map(KllSketch.fromBytes)
          .getOrElse(new KllSketch(k))
        rows.toSeq.sortBy(_.seq).foreach(r => sk.insert(r.value))
        state.update(sk.toBytes)
        Iterator.single(QSnapshot(group, sk.count, sk.retained,
          sk.quantile(0.5), sk.quantile(0.9), sk.quantile(0.99)))
    }
    obs.groupByKey(_.group)
      .flatMapGroupsWithState[Array[Byte], QSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }
}
