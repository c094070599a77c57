package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online vocabulary-growth monitor per stream part — the live
  * counterpart of the batch richness estimators
  * ([[graft.text.TextAnalysis.chao1Richness]] answers "how much unseen
  * vocabulary REMAINS"; this answers "is the stream still DISCOVERING
  * vocabulary right now"): per tumbling window, how many arriving tokens
  * hash to a never-before-set bit of a per-part membership bitmap. A
  * healthy crawl keeps finding new types; a looping scraper's new-type
  * rate collapses to ~0 — the live freshness/staleness signal next to
  * [[StreamDrift]] (value distribution) and [[StreamCusum]] (rate).
  *
  * Bounded state, deterministically approximate: the seen-set is a FIXED
  * `2^bitsLog2`-bit bitmap addressed by md5 (the engine's only hash
  * family — engine-portable and run-stable, no RNG), so state per part
  * is 2^bitsLog2/8 bytes FOREVER, and "new" errs only toward undercount
  * via hash collisions: with load factor f (bits set), a truly-new token
  * is miscounted as seen with probability f — the monitor reports
  * `bits_set` alongside each window so the reader knows the current
  * collision rate exactly; at the default 2^17 bits the first million
  * distinct types stay under ~8% load. An exact distinct count would
  * need unbounded state — this trades a DISCLOSED undercount for a hard
  * memory bound, the same trade the batch sketches gate openly.
  *
  * At-arrival contract ([[StreamCusum]] semantics): minute order within
  * each micro-batch, a window emits when the first row of a later window
  * arrives, late rows fold into the open window. */
object StreamVocabGrowth {

  final case class TokenEvent(part: String, minute: Long, token: String)

  final case class VocabState(openWindow: Long, bits: Array[Byte],
      bitsSet: Long, winTokens: Long, winNew: Long)

  final case class VocabReport(part: String, window: Long, tokens: Long,
      new_types: Long, bits_set: Long)

  /** Checkpoint-upgrade shim (the [[StreamDrift.normalize]] twin): a
    * restored pre-r16 state carrying the old `-1L` sentinel with zero
    * token/bit counters is uninitialized, not a real open window `-1` —
    * live state always counts the opening row before persisting. */
  private[graft] def normalize(st: VocabState): VocabState =
    if (st.openWindow == -1L && st.winTokens == 0L && st.winNew == 0L &&
        st.bitsSet == 0L)
      st.copy(openWindow = Long.MinValue)
    else st

  private def bitIndex(token: String, bitsLog2: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    ((acc & Long.MaxValue) % (1L << bitsLog2)).toInt
  }

  def detect(tokens: Dataset[TokenEvent], windowMinutes: Long,
      bitsLog2: Int = 17): Dataset[VocabReport] = {
    require(windowMinutes >= 1, s"windowMinutes must be >= 1: $windowMinutes")
    require(bitsLog2 >= 10 && bitsLog2 <= 27,
      s"bitsLog2 must be in [10, 27]: $bitsLog2")
    import tokens.sparkSession.implicits._
    val step: (String, Iterator[TokenEvent], GroupState[VocabState]) => Iterator[VocabReport] = {
      case (part, rows, state) =>
        var st = normalize(state.getOption.getOrElse(
          VocabState(Long.MinValue, new Array[Byte](1 << (bitsLog2 - 3)), 0L, 0L, 0L)))
        val out = scala.collection.mutable.ArrayBuffer.empty[VocabReport]
        rows.toSeq.sortBy(_.minute).foreach { r =>
          val w0 = java.lang.Math.floorDiv(r.minute, windowMinutes)
          val w = math.max(w0, st.openWindow)
          if (st.openWindow == Long.MinValue) st = st.copy(openWindow = w)
          else if (w > st.openWindow) {
            out += VocabReport(part, st.openWindow, st.winTokens,
              st.winNew, st.bitsSet)
            st = st.copy(openWindow = w, winTokens = 0L, winNew = 0L)
          }
          val idx = bitIndex(r.token, bitsLog2)
          val mask = (1 << (idx & 7)).toByte
          val fresh = (st.bits(idx >> 3) & mask) == 0
          if (fresh) {
            st.bits(idx >> 3) = (st.bits(idx >> 3) | mask).toByte
            st = st.copy(bitsSet = st.bitsSet + 1L, winNew = st.winNew + 1L)
          }
          st = st.copy(winTokens = st.winTokens + 1L)
        }
        state.update(st)
        out.iterator
    }
    tokens.groupByKey(_.part)
      .flatMapGroupsWithState[VocabState, VocabReport](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }
}
