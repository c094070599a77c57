package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{ImageHeader, Mp4Header, WavHeader}

/** Live media-ingest monitor: per source and tumbling window, how many
  * arriving binary payloads parse as each container format — and how many
  * parse as NOTHING. The streaming composition of the codec triple
  * ([[graft.functions.ImageHeader]], [[graft.functions.WavHeader]],
  * [[graft.functions.Mp4Header]]): a crawler that silently starts
  * shipping truncated JPEGs or mislabeled payloads moves `n_unknown`
  * within one window, long before any downstream decode job fails — the
  * media twin of [[StreamDrift]]'s payload-distribution watch.
  *
  * Classification is signature dispatch over the SAME bounded parsers the
  * batch gates run (q_image_header / q_audio_header / q_video_header), so
  * streamed counts are replayable by a batch group-by over identical
  * bytes — parity is spec-pinned, the StreamParitySpec discipline.
  *
  * At-arrival contract ([[StreamDrift]]/[[StreamCusum]] semantics): rows
  * process in minute order within each micro-batch; a row whose window
  * precedes the open one folds into the OPEN window rather than
  * re-opening a closed report; a window emits when the first row of a
  * LATER window arrives. State per source: five counters and a window id
  * — O(1) forever, regardless of throughput; payload bytes are never
  * retained in state. */
object StreamMediaStats {

  final case class MediaEvent(source: String, minute: Long, data: Array[Byte])

  final case class MediaState(openWindow: Long,
      png: Long, jpeg: Long, wav: Long, mp4: Long, unknown: Long)

  final case class MediaReport(source: String, window: Long, n_total: Long,
      n_png: Long, n_jpeg: Long, n_wav: Long, n_mp4: Long, n_unknown: Long)

  /** Container classification by actual parse (never by trusted metadata):
    * the image parser first (PNG signature / JPEG SOI), then RIFF/WAVE,
    * then ISO-BMFF. Each parser is signature-gated, so misses cost one
    * prefix check, and a payload that matches no container is `unknown`
    * — the count this monitor exists to watch. */
  def classify(data: Array[Byte]): String = {
    val img = ImageHeader.parse(data).getUTF8String(0).toString
    if (img != "unknown") img
    else if (WavHeader.parse(data).getUTF8String(0).toString != "unknown") "wav"
    else if (Mp4Header.parse(data).getUTF8String(0).toString != "unknown") "mp4"
    else "unknown"
  }

  private def emptyAt(w: Long) = MediaState(w, 0L, 0L, 0L, 0L, 0L)

  /** Checkpoint-upgrade shim (the [[StreamDrift.normalize]] twin): a
    * restored pre-r16 state carrying the old `-1L` sentinel with ZERO
    * counters is uninitialized, not a real open window `-1` — live state
    * always counts at least one row into the open window before
    * persisting, so the zero-counter guard cannot misfire. */
  private[graft] def normalize(st: MediaState): MediaState =
    if (st.openWindow == -1L && st.png == 0L && st.jpeg == 0L &&
        st.wav == 0L && st.mp4 == 0L && st.unknown == 0L)
      emptyAt(Long.MinValue)
    else st

  private def report(source: String, st: MediaState): MediaReport =
    MediaReport(source, st.openWindow,
      st.png + st.jpeg + st.wav + st.mp4 + st.unknown,
      st.png, st.jpeg, st.wav, st.mp4, st.unknown)

  def monitor(events: Dataset[MediaEvent], windowMinutes: Long = 1L): Dataset[MediaReport] = {
    require(windowMinutes >= 1, s"windowMinutes must be >= 1: $windowMinutes")
    import events.sparkSession.implicits._
    val step: (String, Iterator[MediaEvent], GroupState[MediaState]) => Iterator[MediaReport] = {
      case (source, rows, state) =>
        var st = normalize(state.getOption.getOrElse(emptyAt(Long.MinValue)))
        val out = scala.collection.mutable.ArrayBuffer.empty[MediaReport]
        rows.toSeq.sortBy(_.minute).foreach { r =>
          val w0 = java.lang.Math.floorDiv(r.minute, windowMinutes)
          val w = math.max(w0, st.openWindow)
          if (st.openWindow == Long.MinValue) st = st.copy(openWindow = w)
          else if (w > st.openWindow) {
            out += report(source, st)
            st = emptyAt(w)
          }
          classify(r.data) match {
            case "png" => st = st.copy(png = st.png + 1L)
            case "jpeg" => st = st.copy(jpeg = st.jpeg + 1L)
            case "wav" => st = st.copy(wav = st.wav + 1L)
            case "mp4" => st = st.copy(mp4 = st.mp4 + 1L)
            case _ => st = st.copy(unknown = st.unknown + 1L)
          }
        }
        state.update(st)
        out.iterator
    }
    events.groupByKey(_.source)
      .flatMapGroupsWithState[MediaState, MediaReport](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Batch replay of the same statistic — the parity oracle for the
    * stream: group the same events by (source, window) and count each
    * parse class. Used by the spec to pin stream == batch. */
  def batchReplay(events: Dataset[MediaEvent], windowMinutes: Long = 1L): Dataset[MediaReport] = {
    import events.sparkSession.implicits._
    events.map(e => (e.source,
        java.lang.Math.floorDiv(e.minute, windowMinutes), classify(e.data)))
      .groupByKey(t => (t._1, t._2))
      .mapGroups { (key: (String, Long), rows: Iterator[(String, Long, String)]) =>
        val (s, w) = key
        var png = 0L; var jpeg = 0L; var wav = 0L; var mp4 = 0L; var unk = 0L
        rows.foreach {
          _._3 match {
            case "png" => png += 1
            case "jpeg" => jpeg += 1
            case "wav" => wav += 1
            case "mp4" => mp4 += 1
            case _ => unk += 1
          }
        }
        MediaReport(s, w, png + jpeg + wav + mp4 + unk, png, jpeg, wav, mp4, unk)
      }
  }
}
