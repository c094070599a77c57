package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video carried
  * as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partitioning, the
  * `mapPartitions` batch shape (decode amortized per-partition, not
  * per-row), typed outputs — while the codec itself is STUBBED with a
  * deterministic fake (`StubCodec`): this container has no image/audio
  * libraries, and the stub's byte-level features keep every stage testable
  * and engine-reproducible. Swapping in a real codec means implementing
  * the [[Multimodal.MediaCodec]] trait and passing it to the stages —
  * nothing else changes.
  *
  * Scale notes: media rows are large (MBs); the table partitions on
  * `media_id` hash so decode work spreads evenly, metadata-only queries
  * prune `data` via column pruning (never read the bytes), and
  * feature-extraction output (small fixed-width vectors) is written
  * separately from the heavy binary table so downstream ANN never rescans
  * media bytes.
  */
object Multimodal {

  /** Typed media row: opaque payload + modality metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,           // image | audio | video
      format: String,         // e.g. png/jpeg/wav — metadata, not trusted
      data: Array[Byte],
      width: Int,             // -1 when not applicable
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  /** The codec SEAM: every decode-shaped stage (features, frames, resize)
    * goes through this interface, so swapping in a real image/audio codec
    * is one new implementation — none of the Spark plumbing (schema,
    * partitioning, batch shape) changes. Serializable because instances
    * are captured by executor-side closures. MultimodalSpec proves the
    * seam by running the pipeline under a second, unrelated codec. */
  trait MediaCodec extends Serializable {
    def featureDim: Int
    def decodeFeatures(data: Array[Byte]): Array[Float]
    def sampleFrames(data: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]]
    def resize(data: Array[Byte], targetBytes: Int): Array[Byte]
  }

  /** ====== STUB CODEC — deterministic fake, replace with real decode ======
    * A real implementation would decode `data` with an image/audio library
    * and emit pixel/sample tensors. The stub derives a 16-dim byte-histogram
    * feature (counts of each high nibble, L1-normalized) — deterministic,
    * cheap, and shaped exactly like a real embedding hand-off. */
  object StubCodec extends MediaCodec {
    val FeatureDim = 16
    override def featureDim: Int = FeatureDim

    def decodeFeatures(data: Array[Byte]): Array[Float] = {
      val counts = new Array[Float](FeatureDim)
      var i = 0
      while (i < data.length) {
        counts((data(i) & 0xf0) >>> 4) += 1f
        i += 1
      }
      val n = math.max(data.length, 1).toFloat
      counts.map(_ / n)
    }

    /** "Frame sampling": every `stride`-th fixed-size byte window — the
      * plumbing twin of video frame extraction. */
    def sampleFrames(data: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] =
      data.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, idx) if idx % stride == 0 => chunk }
        .toSeq

    /** "Resize": reduce the payload to exactly `targetBytes` by uniform
      * byte sampling — the plumbing twin of image downscaling (fixed-size
      * output regardless of input size; deterministic index arithmetic
      * stands in for pixel interpolation). Inputs smaller than the target
      * pass through unchanged, like a no-upscale resize policy. */
    def resize(data: Array[Byte], targetBytes: Int): Array[Byte] =
      if (data.length <= targetBytes) data
      else Array.tabulate(targetBytes)(i =>
        data((i.toLong * data.length / targetBytes).toInt))
  }
  // ======================= end stub codec =============================

  /** Fake media table derived from `documents` — UTF-8 bytes stand in for
    * encoded media so the whole pipeline runs on the harness data. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
      when(col("doc_id") % 2 === 0, lit("png")).otherwise(lit("wav")).as("format"),
      encode(col("text"), "UTF-8").as("data"),
      when(col("doc_id") % 2 === 0, (col("n_chars") % 1024).cast("int")).otherwise(lit(-1)).as("width"),
      when(col("doc_id") % 2 === 0, (col("n_chars") % 768).cast("int")).otherwise(lit(-1)).as("height"),
      when(col("doc_id") % 2 === 1, lit(16000)).otherwise(lit(-1)).as("sample_rate"),
      when(col("doc_id") % 2 === 1, col("n_chars") * 10).otherwise(lit(-1L)).as("duration_ms"))

  /** Feature extraction over partition-sized batches: one codec context per
    * partition (the real-codec cost model), small typed rows out. */
  def extractFeatures(media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: initialize decoder/session once per partition here
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.data.length.toLong,
          codec.decodeFeatures(r.data))
      }
    }
  }

  /** Resize stage: bound every payload to `targetBytes` (no upscaling) —
    * the heavy-media normalization pass that runs BEFORE feature
    * extraction at scale, so downstream stages shuffle bounded rows. The
    * metadata columns ride along; `width`/`height` are rescaled in
    * proportion like a real resize would. */
  def resize(media: Dataset[MediaRow], targetBytes: Int = 4096,
      codec: MediaCodec = StubCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.data.length <= targetBytes) r
        else {
          val scale = targetBytes.toDouble / r.data.length
          r.copy(
            data = codec.resize(r.data, targetBytes),
            width = if (r.width >= 0) math.max(1, (r.width * scale).toInt) else r.width,
            height = if (r.height >= 0) math.max(1, (r.height * scale).toInt) else r.height)
        }
      }
    }
  }

  /** Frame-sample stage: media → (media_id, frame_idx, frame bytes). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256, stride: Int = 4,
      codec: MediaCodec = StubCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      codec.sampleFrames(r.data, frameBytes, stride).zipWithIndex.map {
        case (frame, i) => (r.media_id, i, frame)
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  def asMedia(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.as[MediaRow]
  }

  /** Metadata-only summary — must never read `data` (column pruning): byte
    * size from metadata-carrying octet_length projection, frame count by
    * arithmetic, grouped per modality. */
  def metaSummary(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    val nBytes = octet_length(col("data")).cast("long")
    // frames = ceil(nBytes/frameBytes) windows, every stride-th kept
    val windows = ceil(nBytes.cast("double") / lit(frameBytes)).cast("long")
    val frames = ceil(windows.cast("double") / lit(stride)).cast("long")
    media.select(col("media_id"), col("kind"), col("format"),
      nBytes.as("n_bytes"), frames.as("n_frames"))
  }
}
