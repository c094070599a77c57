package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** CONTENT-level dedup of a live media stream — the perceptual twin of
  * [[StreamDedup]]: arriving binary payloads key on what they DECODE to,
  * not what bytes they shipped in, so a re-encoded image (different PNG
  * filters), a re-containered WAV (different padding), or a re-muxed y4m
  * stream (different header parameters) all collapse onto the first
  * arrival within the watermark horizon. The crawl-side guard against
  * mirror sites re-serving identical media under fresh bytes — exactly
  * the duplication the batch perceptual family (q_image_dups,
  * q_audio_dups, q_video_dups) removes at rest, moved to ingest time.
  *
  * Keys are the SAME per-row fingerprint arithmetic the gated batch
  * operators run ([[Multimodal.videoFpRow]] / [[Multimodal.audioFpRow]] /
  * [[Multimodal.imageDHashRow]] — single-sourced, so stream and batch can
  * never disagree about what "same content" means), dispatched by actual
  * decode with each decoder signature-gated (a miss costs one magic
  * check). A payload NO codec decodes keys on its exact bytes' md5:
  * undecodable content cannot collapse perceptually, but byte-identical
  * junk still dedups instead of flooding downstream.
  *
  * State discipline is [[StreamDedup]]'s: one entry per distinct key
  * inside the horizon via `dropDuplicatesWithinWatermark`, evicted by the
  * watermark — state bounded by (arrival rate × horizon), never by
  * corpus history, and payload bytes are never retained in state. */
object StreamMediaDedup {

  /** One arriving media payload. */
  final case class MediaDoc(media_id: Long, ts: java.sql.Timestamp,
      data: Array[Byte])

  /** Modality-prefixed perceptual key: `v:`/`a:`/`i:` carry the decoded
    * 64-bit fingerprint halves (prefixes keep modality hash spaces
    * disjoint — a video fingerprint can never collide with an image
    * dHash of equal bits), `b:` the byte-exact md5 fallback. */
  private[graft] def perceptualKey(data: Array[Byte]): String = {
    val (vch, _, _, vhi, vlo) = Multimodal.videoFpRow(data)
    if (vch != -1L) s"v:$vhi:$vlo"
    else {
      val (ach, _, _, ahi, alo) = Multimodal.audioFpRow(data)
      if (ach != -1L) s"a:$ahi:$alo"
      else {
        val (_, _, ich, ihi, ilo) = Multimodal.imageDHashRow(data)
        if (ich != -1L) s"i:$ihi:$ilo"
        else "b:" + java.security.MessageDigest.getInstance("MD5")
          .digest(data).map("%02x".format(_)).mkString
      }
    }
  }

  /** Deduplicate a media stream on decoded content within `horizon`. The
    * first arrival of each distinct content survives with its columns
    * plus the `content_hash` it keyed on. Batch replay of the same rows
    * through the same keys yields the same survivors (parity
    * spec-pinned). */
  def dedupMediaStream(media: Dataset[MediaDoc],
      horizon: String = "1 hour"): DataFrame = {
    import media.sparkSession.implicits._
    val keyed = media
      .map(m => (m.media_id, m.ts, m.data, perceptualKey(m.data)))
      .toDF("media_id", "ts", "data", "perceptual_key")
    StreamDedup.dedupStreamBy(keyed, col("perceptual_key"),
      horizon = horizon, tsCol = "ts")
  }
}
