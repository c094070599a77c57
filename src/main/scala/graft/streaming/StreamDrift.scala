package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online distribution drift per stream part — the live counterpart of the
  * batch [[graft.operators.Relational.psiDrift]]: the FIRST completed
  * tumbling window of values becomes the part's reference histogram, and
  * every later completed window reports its PSI-style divergence from
  * that reference. The monitor a long-running ingest keeps next to
  * [[StreamCusum]]: CUSUM watches the RATE drift, this watches the VALUE
  * DISTRIBUTION drift (a payload-format change moves the histogram long
  * before it moves the rate).
  *
  * The statistic is the batch operator's exact integer form, summed over
  * bands: `Σ_band (c2·t1 − c1·t2)·(bitlen(c2·t1+1) − bitlen(c1·t2+1))`
  * divided once by `t1·t2` — floor-log2 integer bits, one IEEE division
  * per report, so a backfilled batch run over the same windows reproduces
  * the streamed values exactly. Same per-band int64 bound as the batch
  * form (~3.8e8 rows per window), enforced — and because this form SUMS
  * band numerators where the batch form divides per band, the sum itself
  * accumulates via Math.addExact/multiplyExact: loud, never wrapped.
  *
  * At-arrival contract ([[StreamCusum]] semantics): rows are processed in
  * minute order within each micro-batch; a row whose window precedes the
  * open one folds into the OPEN window rather than re-opening a closed
  * report. A window emits when the first row of a LATER window arrives.
  *
  * State per part: two band-count maps, each bounded by `maxBands`
  * (values clamp into `[0, maxBands)`), plus two window ids — O(maxBands)
  * forever, regardless of throughput. */
object StreamDrift {

  final case class ValueEvent(part: String, minute: Long, valueMicro: Long)

  final case class DriftState(refWindow: Long, ref: Map[Long, Long],
      openWindow: Long, cur: Map[Long, Long])

  final case class DriftReport(part: String, window: Long, n_ref: Long,
      n: Long, psi: Double)

  private def bitlen(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  /** Checkpoint-upgrade shim: the pre-r16 uninitialized sentinel was
    * `-1L`; a state RESTORED from an old checkpoint carrying `-1L`
    * windows with EMPTY counter maps is the uninitialized state, not a
    * real open window `-1` — without this, an upgrade-in-place restart
    * would misfold the first rows after restore and emit one bogus
    * report. A genuine open window `-1` always carries counted rows, so
    * the empty-map guard cannot misfire on live state. */
  private[graft] def normalize(st: DriftState): DriftState =
    if (st.openWindow == -1L && st.cur.isEmpty &&
        st.refWindow == -1L && st.ref.isEmpty)
      DriftState(Long.MinValue, Map.empty, Long.MinValue, Map.empty)
    else st

  private[graft] def psi(ref: Map[Long, Long], cur: Map[Long, Long]): (Long, Long, Double) = {
    val t1 = ref.valuesIterator.sum
    val t2 = cur.valuesIterator.sum
    // the row bound makes each band's PRODUCTS fit int64; the cross-band
    // SUM of delta·Δbits terms can still exceed it (two opposite
    // full-mass bands reach ~63·t1·t2 each), so every accumulation is
    // checked — loud, never wrapped (the chiSquareTokens rule)
    require(t1 <= 380000000L && t2 <= 380000000L,
      "StreamDrift contribution overflows int64 past ~3.8e8 rows per window")
    var num = 0L
    (ref.keySet ++ cur.keySet).foreach { b =>
      val c1 = ref.getOrElse(b, 0L)
      val c2 = cur.getOrElse(b, 0L)
      val delta = Math.subtractExact(
        Math.multiplyExact(c2, t1), Math.multiplyExact(c1, t2))
      num = Math.addExact(num,
        Math.multiplyExact(delta, bitlen(c2 * t1 + 1) - bitlen(c1 * t2 + 1)))
    }
    (t1, t2, num.toDouble / (t1.toDouble * t2.toDouble))
  }

  def detect(values: Dataset[ValueEvent], windowMinutes: Long,
      bandWidth: Long, maxBands: Int = 64): Dataset[DriftReport] = {
    require(windowMinutes >= 1, s"windowMinutes must be >= 1: $windowMinutes")
    require(bandWidth >= 1, s"bandWidth must be >= 1: $bandWidth")
    require(maxBands >= 2, s"maxBands must be >= 2: $maxBands")
    import values.sparkSession.implicits._
    val step: (String, Iterator[ValueEvent], GroupState[DriftState]) => Iterator[DriftReport] = {
      case (part, rows, state) =>
        var st = normalize(state.getOption.getOrElse(
          DriftState(Long.MinValue, Map.empty, Long.MinValue, Map.empty)))
        val out = scala.collection.mutable.ArrayBuffer.empty[DriftReport]
        rows.toSeq.sortBy(_.minute).foreach { r =>
          val w0 = java.lang.Math.floorDiv(r.minute, windowMinutes)
          val w = math.max(w0, st.openWindow)
          if (st.openWindow == Long.MinValue) st = st.copy(openWindow = w)
          else if (w > st.openWindow) {
            if (st.refWindow == Long.MinValue)
              st = DriftState(st.openWindow, st.cur, w, Map.empty)
            else {
              val (t1, t2, p) = psi(st.ref, st.cur)
              out += DriftReport(part, st.openWindow, t1, t2, p)
              st = st.copy(openWindow = w, cur = Map.empty)
            }
          }
          val band = math.min(math.max(
            java.lang.Math.floorDiv(r.valueMicro, bandWidth), 0L),
            (maxBands - 1).toLong)
          st = st.copy(cur = st.cur.updated(band, st.cur.getOrElse(band, 0L) + 1L))
        }
        state.update(st)
        out.iterator
    }
    values.groupByKey(_.part)
      .flatMapGroupsWithState[DriftState, DriftReport](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }
}
