package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ====== real image-bytes fixture + the production header codec ======

  /** Shared gate/oracle constants for the synthetic image corpus — the
    * DuckDB oracle re-derives width/height/depth/... from these SAME
    * moduli, so the q_image_* gates verify that the byte BUILDER and the
    * byte PARSER ([[graft.functions.ImageHeader]]) agree through a real
    * binary round trip, against an independent arithmetic oracle. */
  val ImgWidthMod = 1000
  val ImgHeightMod = 800

  /** Deterministic synthetic corpus of REAL image bytes: even doc_ids
    * become structurally-valid PNGs (signature, IHDR with live CRC32s,
    * a tEXt ancillary chunk, IEND), odd doc_ids become JPEG/JFIF streams
    * (SOI, APP0 JFIF, comment, APP1 EXIF carrying orientation in
    * alternating TIFF byte orders, DQT, SOF0, SOS, EOI). Field values
    * derive from doc columns so the oracle can re-derive them without
    * parsing. */
  def imageTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (docId, source, nChars) =>
        val w = (1L + nChars % ImgWidthMod).toInt
        val h = (1L + docId % ImgHeightMod).toInt
        val data =
          if (docId % 2 == 0) {
            val depth = if (docId % 4 == 0) 16 else 8
            val colorType = ((docId / 2) % 3) match {
              case 0 => 0 // greyscale
              case 1 => 2 // truecolor
              case _ => 6 // truecolor + alpha
            }
            synthPng(w, h, depth, colorType)
          } else {
            val components = if (docId % 3 == 0) 1 else 3
            val orientation = (1L + (docId / 2) % 8).toInt
            synthJpeg(w, h, components, orientation,
              bigEndianTiff = docId % 4 == 1)
          }
        (docId, source, data)
      }
      .toDF("media_id", "source", "data")
  }

  /** Shared gate/oracle constants for the PIXEL fixture corpus (the
    * Img*Mod pattern, smaller so the oracle's per-pixel unnest stays
    * metadata-cheap): dims derive as `1 + n_chars % PxWidthMod` ×
    * `1 + doc_id % PxHeightMod`, and the pixel at (x, y, channel c) is
    * `(doc_id + 3x + 7y + 11c) % PxValMod` — mod 251 (prime) so values
    * never align with the byte lattice. */
  val PxWidthMod = 16
  val PxHeightMod = 12
  val PxValMod = 251

  /** Deterministic synthetic corpus of FULLY DECODABLE PNGs — the pixel
    * upgrade of [[imageTable]] (which stops at headers): every doc
    * becomes a real non-interlaced 8-bit PNG (even doc_ids grayscale,
    * odd truecolor) whose deflated IDAT carries the formula pixels
    * above, each scanline filtered with type `y % 5` so ALL FIVE PNG
    * filters are live in every multi-row image. The oracle re-derives
    * pixel statistics from the formula — never from bytes — so the
    * encoder/decoder pair cannot agree its way past the gate. */
  def imagePixelTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (docId, source, nChars) =>
        val w = (1L + nChars % PxWidthMod).toInt
        val h = (1L + docId % PxHeightMod).toInt
        val colorType = if (docId % 2 == 0) 0 else 2
        val ch = if (colorType == 0) 1 else 3
        val raw = new Array[Byte](w * h * ch)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < ch) {
              raw((y * w + x) * ch + c) =
                ((docId + 3L * x + 7L * y + 11L * c) % PxValMod).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        (docId, source, PngCodec.encode(w, h, colorType, raw, y => y % 5))
      }
      .toDF("media_id", "source", "data")
  }

  /** Integer-exact pixel audit over REAL PNG bytes — the image twin of
    * [[audioStats]] and the gate surface of [[PngCodec]]: per media row,
    * the decoded dimensions and count/min/max/sum over every unsigned
    * pixel sample (all channels). Rows that don't decode report
    * `channels = -1` with zero stats — present, never dropped, never an
    * exception. Output is metadata-sized, so the corpus scan reduces
    * immediately. */
  def imagePixelStats(images: DataFrame): DataFrame = {
    import images.sparkSession.implicits._
    images.select(col("media_id").cast("long").as("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          PngCodec.decode(data) match {
            case Some(img) if img.raw.nonEmpty =>
              var k = 0
              var sum = 0L
              var mn = 255L
              var mx = 0L
              while (k < img.raw.length) {
                val v = (img.raw(k) & 0xff).toLong
                sum += v
                if (v < mn) mn = v
                if (v > mx) mx = v
                k += 1
              }
              (id, img.width.toLong, img.height.toLong, img.channels.toLong,
                img.raw.length.toLong, mn, mx, sum)
            case _ => (id, 0L, 0L, -1L, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF("media_id", "width", "height", "channels", "n_values",
        "min_v", "max_v", "sum_v")
  }

  /** Seed modulus for the duplicate-image fixture: docs sharing
    * `doc_id % ImgSeedMod` render PIXEL-IDENTICAL images (same dims,
    * same formula) through DIFFERENT container bytes (the per-row
    * filter choice varies by doc_id), so content-level dedup has real
    * clusters to find and byte-level dedup provably cannot find them. */
  val ImgSeedMod = 17

  /** Duplicate-image corpus: ~[[ImgSeedMod]] distinct pixel images, each
    * rendered once per doc with doc-dependent PNG filters — bytewise all
    * different, contentwise clustered. */
  def imageDupTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = docId % ImgSeedMod
        val w = (1L + s % PxWidthMod).toInt
        val h = (1L + s % PxHeightMod).toInt
        val colorType = if (s % 2 == 0) 0 else 2
        val ch = if (colorType == 0) 1 else 3
        val raw = new Array[Byte](w * h * ch)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < ch) {
              raw((y * w + x) * ch + c) =
                ((s + 3L * x + 7L * y + 11L * c) % PxValMod).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        (docId, source,
          PngCodec.encode(w, h, colorType, raw, y => ((y + docId) % 5).toInt))
      }
      .toDF("media_id", "source", "data")
  }

  /** Perceptual image hash over REAL decoded pixels — the multimodal
    * dedup signal the pixel decoder unlocks: difference-hash (dHash) on
    * a 9×8 average-pooled luma grid, where bit `j*8+i` says whether grid
    * cell (i+1, j) is brighter than cell (i, j). Entirely integer-exact
    * and division-free: cells carry (luma sum, pixel count) and the
    * brightness comparison cross-multiplies, so the oracle re-derives
    * every bit from the fixture's pixel formula. Two byte-different
    * encodings of the same pixels hash identically (the content-dedup
    * property; byte-level dedup sees nothing). The 64-bit hash rides as
    * two unsigned 32-bit halves (`dhash_hi`/`dhash_lo`) so neither
    * engine plays two's-complement sign games. Undecodable rows report
    * `channels = -1` with zero hashes — present, never dropped. */
  def imageDHash(images: DataFrame): DataFrame = {
    import images.sparkSession.implicits._
    images.select(col("media_id").cast("long").as("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) =>
        val (w, h, ch, hi, lo) = imageDHashRow(data)
        (id, w, h, ch, hi, lo)
      })
      .toDF("media_id", "width", "height", "channels", "dhash_hi",
        "dhash_lo")
  }

  /** Per-row half of [[imageDHash]] — `(width, height, channels,
    * dhash_hi, dhash_lo)`, `channels = -1` when undecodable — so
    * streaming consumers key on the identical arithmetic. */
  private[graft] def imageDHashRow(
      data: Array[Byte]): (Long, Long, Long, Long, Long) =
    PngCodec.decode(data) match {
      case Some(img) if img.raw.nonEmpty =>
        val w = img.width
        val h = img.height
        val ch = img.channels
        val cell = Array.ofDim[Long](8, 9)
        val area = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val j = y * 8 / h
          var x = 0
          while (x < w) {
            val i = x * 9 / w
            var l = 0L
            var c = 0
            while (c < ch) {
              l += (img.raw((y * w + x) * ch + c) & 0xff).toLong
              c += 1
            }
            cell(j)(i) += l
            area(j)(i) += 1L
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            // empty cells (w < 9 or h < 8) have area 0: both sides
            // of the cross-multiplied compare collapse to 0 > 0 —
            // bit 0, same as the oracle's absent-row default
            if (cell(j)(i + 1) * area(j)(i) > cell(j)(i) * area(j)(i + 1))
              hash |= 1L << (j * 8 + i)
            i += 1
          }
          j += 1
        }
        (w.toLong, h.toLong, ch.toLong, hash >>> 32, hash & 0xffffffffL)
      case _ => (0L, 0L, -1L, 0L, 0L)
    }

  /** Near-dup variant of [[imageDupTable]]: docs with `doc_id % 3 == 0`
    * brighten the left half of their top scanline by +5 per channel — a
    * LOCALIZED pixel edit that moves a few pooled comparisons, so each
    * seed yields an (original, perturbed) hash pair a near-dup pass
    * must relate and an exact-dup pass must keep apart. Perturbation is
    * formula-level (the oracle replays it); container bytes still vary
    * per doc. */
  def imageNearDupTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = docId % ImgSeedMod
        val pert = docId % 3 == 0
        val w = (1L + s % PxWidthMod).toInt
        val h = (1L + s % PxHeightMod).toInt
        val colorType = if (s % 2 == 0) 0 else 2
        val ch = if (colorType == 0) 1 else 3
        val raw = new Array[Byte](w * h * ch)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val bump = if (pert && y == 0 && x < w / 2) 5L else 0L
            var c = 0
            while (c < ch) {
              raw((y * w + x) * ch + c) =
                ((s + 3L * x + 7L * y + 11L * c) % PxValMod + bump).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        (docId, source,
          PngCodec.encode(w, h, colorType, raw, y => ((y + docId) % 5).toInt))
      }
      .toDF("media_id", "source", "data")
  }

  /** NEAR-duplicate pairs between DISTINCT perceptual hashes — the LSH
    * scale path: dedup to hash NODES first ([[imageDupClusters]] grain,
    * so a billion-repeat image is one node), band each 64-bit hash into
    * four 16-bit bands, candidate node pairs share at least one band,
    * and the exact Hamming distance (codegen `bit_count` over xor)
    * filters to `maxHamming`. Standard banding recall: a pair differing
    * in all four bands is invisible regardless of distance — with 4
    * bands the guarantee holds through distance 3 and degrades
    * gracefully after (both engines replay the identical banding, so
    * the gate is exact about what the index CAN see). Pair volume is
    * bounded by DISTINCT-hash band collisions, never by corpus size. */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 8): DataFrame =
    bandedHammingPairs(
      hashes.filter(col("channels") =!= -1L)
        .groupBy(col("dhash_hi"), col("dhash_lo"))
        .agg(count(lit(1)).as("n_images")),
      hi = "dhash_hi", lo = "dhash_lo", cnt = "n_images",
      maxHamming = maxHamming)

  /** Audio twin of [[imageNearDupPairs]]: the same banded-LSH machinery
    * over DISTINCT perceptual fingerprints ([[audioFingerprint]] output)
    * — near-duplicate renderings of the same audio content (a few
    * perturbed sample windows, the fixture's knob) land within a small
    * Hamming distance and share a band; pair volume is bounded by
    * distinct-fingerprint band collisions, never corpus size. */
  def audioNearDupPairs(fps: DataFrame, maxHamming: Int = 8): DataFrame =
    bandedHammingPairs(
      fps.filter(col("channels") =!= -1L)
        .groupBy(col("fp_hi"), col("fp_lo"))
        .agg(count(lit(1)).as("n_media")),
      hi = "fp_hi", lo = "fp_lo", cnt = "n_media", maxHamming = maxHamming)

  /** ONE banded-Hamming LSH join for every 64-bit perceptual hash
    * family (image dHash, audio fingerprints): nodes carry the hash as
    * two unsigned 32-bit halves (`hi`/`lo`) plus a member count; each
    * half splits into two exact 16-bit bit-slice bands
    * (`shiftrightunsigned` — Column `/` is DOUBLE division, which drops
    * low bits of wide values at carry boundaries and would silently
    * nick the distance-3 banding guarantee), candidate pairs share at
    * least one band, and codegen `bit_count` over xor applies the exact
    * Hamming cutoff. Output columns are `<hi>_a, <lo>_a, n_a, <hi>_b,
    * <lo>_b, n_b, hamming`. */
  private def bandedHammingPairs(nodes: DataFrame, hi: String, lo: String,
      cnt: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, s"maxHamming: $maxHamming")
    val bands = nodes.select(col(hi), col(lo), col(cnt),
      posexplode(array(
        col(lo).bitwiseAND(lit(65535L)),
        shiftrightunsigned(col(lo), 16).bitwiseAND(lit(65535L)),
        col(hi).bitwiseAND(lit(65535L)),
        shiftrightunsigned(col(hi), 16).bitwiseAND(lit(65535L))))
        .as(Seq("band_idx", "band_val")))
    val a = bands.select(col(hi).as(s"${hi}_a"), col(lo).as(s"${lo}_a"),
      col(cnt).as("n_a"), col("band_idx"), col("band_val"))
    val b = bands.select(col(hi).as(s"${hi}_b"), col(lo).as(s"${lo}_b"),
      col(cnt).as("n_b"), col("band_idx"), col("band_val"))
    val hamming = bit_count(col(s"${hi}_a").bitwiseXOR(col(s"${hi}_b")))
      .cast("long") +
      bit_count(col(s"${lo}_a").bitwiseXOR(col(s"${lo}_b"))).cast("long")
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col(s"${hi}_a") < col(s"${hi}_b") ||
        (col(s"${hi}_a") === col(s"${hi}_b") &&
          col(s"${lo}_a") < col(s"${lo}_b")))
      .select(col(s"${hi}_a"), col(s"${lo}_a"), col("n_a"),
        col(s"${hi}_b"), col(s"${lo}_b"), col("n_b"))
      .distinct()
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming.toLong)
  }

  /** Exact-duplicate image clusters by perceptual hash: one hash-keyed
    * aggregation (map-side combinable) over [[imageDHash]] output —
    * never a pairwise join, so a corpus where one image repeats a
    * billion times costs one shuffled row, not a quadratic pair list. */
  def imageDupClusters(hashes: DataFrame): DataFrame =
    hashes.filter(col("channels") =!= -1L)
      .groupBy(col("dhash_hi"), col("dhash_lo"))
      .agg(count(lit(1)).as("n_images"),
        min(col("media_id")).as("min_media"),
        max(col("media_id")).as("max_media"))

  private def crc32(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32
    c.update(bytes)
    c.getValue.toInt
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngChunk(chunkType: String, payload: Array[Byte]): Array[Byte] = {
    val body = chunkType.getBytes("US-ASCII") ++ payload
    be32(payload.length) ++ body ++ be32(crc32(body))
  }

  /** A structurally valid PNG container: real signature, IHDR with real
    * CRC32s, one ancillary tEXt chunk, IEND. (No pixel data — header
    * extraction never reads past IHDR.) */
  def synthPng(width: Int, height: Int, bitDepth: Int, colorType: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = pngChunk("IHDR",
      be32(width) ++ be32(height) ++
        Array(bitDepth.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte))
    val text = pngChunk("tEXt", "Software\u0000graft".getBytes("US-ASCII"))
    val iend = pngChunk("IEND", Array.emptyByteArray)
    sig ++ ihdr ++ text ++ iend
  }

  /** A JPEG/JFIF byte stream whose header region exercises the whole
    * marker walk: APP0 (JFIF), COM, APP1 (EXIF TIFF with a Make entry
    * BEFORE the orientation entry so the IFD loop really walks, in the
    * requested byte order), DQT, SOF0 with per-component specs, SOS, a
    * few entropy bytes, EOI. */
  def synthJpeg(width: Int, height: Int, components: Int, orientation: Int,
      bigEndianTiff: Boolean): Array[Byte] = {
    def m(b: Int): Array[Byte] = Array(0xff.toByte, b.toByte)
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      m(marker) ++ be16(payload.length + 2) ++ payload

    val app0 = seg(0xe0,
      "JFIF\u0000".getBytes("US-ASCII") ++
        Array(1.toByte, 1.toByte, 0.toByte) ++ be16(1) ++ be16(1) ++
        Array(0.toByte, 0.toByte))
    val com = seg(0xfe, "graft-fixture".getBytes("US-ASCII"))

    // TIFF: header(8) + IFD0(count 2 + 2 entries + next-offset 4) + "graft\0"
    def t16(v: Int): Array[Byte] = if (bigEndianTiff) be16(v) else be16(v).reverse
    def t32(v: Int): Array[Byte] = if (bigEndianTiff) be32(v) else be32(v).reverse
    val order = if (bigEndianTiff) "MM" else "II"
    val ifdBytes = t16(2) ++
      // tag 0x010F Make, ASCII, count 6, value at offset 8+2+24+4 = 38
      (t16(0x010f) ++ t16(2) ++ t32(6) ++ t32(38)) ++
      // tag 0x0112 Orientation, SHORT, count 1, value inline (first 2 bytes)
      (t16(0x0112) ++ t16(3) ++ t32(1) ++ (t16(orientation) ++ t16(0))) ++
      t32(0)
    val tiff = order.getBytes("US-ASCII") ++ t16(42) ++ t32(8) ++
      ifdBytes ++ "graft\u0000".getBytes("US-ASCII")
    val app1 = seg(0xe1, "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff)

    val dqt = seg(0xdb, 0.toByte +: Array.tabulate[Byte](64)(i => ((i % 63) + 1).toByte))
    val sof0 = seg(0xc0,
      Array(8.toByte) ++ be16(height) ++ be16(width) ++ Array(components.toByte) ++
        Array.tabulate(components)(c =>
          Array((c + 1).toByte, 0x11.toByte, 0.toByte)).flatten)
    val sos = seg(0xda,
      Array(components.toByte) ++
        Array.tabulate(components)(c => Array((c + 1).toByte, 0.toByte)).flatten ++
        Array(0.toByte, 63.toByte, 0.toByte))
    m(0xd8) ++ app0 ++ com ++ app1 ++ dqt ++ sof0 ++ sos ++
      Array(0x12, 0x34, 0x56).map(_.toByte) ++ m(0xd9)
  }

  /** Shared gate/oracle constant for the synthetic WAV corpus (the
    * Img*Mod pattern): frame counts derive as `1 + n_chars % AudFramesMod`
    * on both engines. */
  val AudFramesMod = 500

  /** Deterministic synthetic corpus of REAL RIFF/WAVE bytes — the audio
    * twin of [[imageTable]]: every doc becomes a PCM WAV whose `fmt ` and
    * `data` chunks encode doc-derived values (channels, sample rate,
    * bits, frame count), with an odd-sized LIST chunk in between so the
    * parser's word-alignment pad-byte handling is exercised on every row.
    * The oracle re-derives the same fields arithmetically. */
  def audioTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (docId, source, nChars) =>
        val channels = (1L + (docId / 2) % 2).toInt
        val sampleRate = (docId % 3) match {
          case 0 => 8000
          case 1 => 16000
          case _ => 44100
        }
        val bits = if (docId % 4 >= 2) 8 else 16
        val nFrames = (1L + nChars % AudFramesMod).toInt
        (docId, source, synthWav(channels, sampleRate, bits, nFrames))
      }
      .toDF("media_id", "source", "data")
  }

  /** Integer-exact amplitude audit over REAL PCM bytes — the gate
    * surface of [[WavPcmCodec]]: per media row, the decoded sample count
    * and min/max/sum/abs-sum amplitudes (16-bit signed LE, 8-bit
    * unsigned re-centered by −128). `mapPartitions` keeps the
    * one-codec-context-per-partition cost model of [[extractFeatures]];
    * output is metadata-sized, so the corpus scan reduces immediately.
    * Rows that don't decode (non-PCM, malformed, unsupported width)
    * report `bits_per_sample = -1` with zero stats — present, never
    * dropped, never an exception. */
  def audioStats(audio: DataFrame): DataFrame = {
    import audio.sparkSession.implicits._
    audio.select(col("media_id").cast("long").as("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          WavPcmCodec.locate(data) match {
            case Some(p) if p.nSamples > 0 =>
              var k = 0
              var sum = 0L
              var sumAbs = 0L
              var mn = Long.MaxValue
              var mx = Long.MinValue
              while (k < p.nSamples) {
                val a = WavPcmCodec.sampleAt(data, p, k).toLong
                sum += a
                sumAbs += math.abs(a)
                if (a < mn) mn = a
                if (a > mx) mx = a
                k += 1
              }
              (id, p.bitsPerSample.toLong, p.nSamples.toLong, mn, mx, sum, sumAbs)
            case _ => (id, -1L, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF("media_id", "bits_per_sample", "n_samples", "min_amp",
        "max_amp", "sum_amp", "sum_abs")
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  /** A complete little-endian PCM RIFF/WAVE byte stream: RIFF size, an
    * odd-sized LIST/INFO chunk (forces the pad byte), the 16-byte `fmt `
    * chunk, and a `data` chunk of `nFrames * blockAlign` deterministic
    * sample bytes. `junkLen` pads the LIST payload — SAMPLE-identical
    * files with different container bytes, the audio-dedup fixture's
    * byte-diversity knob. */
  def synthWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Int, junkLen: Int = 0): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nFrames * blockAlign
    wavContainer(channels, sampleRate, bitsPerSample,
      Array.tabulate[Byte](dataSize)(j => ((j * 7 + 3) % 251).toByte),
      junkLen)
  }

  /** A PCM RIFF/WAVE stream around GIVEN amplitudes — the
    * [[synthWav]] container with caller-supplied samples (16-bit signed
    * LE pairs, or 8-bit offset-128 bytes), the audio near-dup fixture's
    * encoder. */
  def synthWavFromAmps(channels: Int, sampleRate: Int, bitsPerSample: Int,
      amps: Array[Int], junkLen: Int = 0): Array[Byte] = {
    val data =
      if (bitsPerSample == 16) {
        val b = new Array[Byte](amps.length * 2)
        var k = 0
        while (k < amps.length) {
          b(2 * k) = (amps(k) & 0xff).toByte
          b(2 * k + 1) = ((amps(k) >> 8) & 0xff).toByte
          k += 1
        }
        b
      } else amps.map(a => (a + 128).toByte)
    wavContainer(channels, sampleRate, bitsPerSample, data, junkLen)
  }

  private def wavContainer(channels: Int, sampleRate: Int,
      bitsPerSample: Int, samples: Array[Byte], junkLen: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = samples.length
    val listPayload = "INFOg".getBytes("US-ASCII") ++
      Array.fill[Byte](junkLen)('j')
    val list = "LIST".getBytes("US-ASCII") ++ le32(listPayload.length) ++
      listPayload ++
      (if ((listPayload.length & 1) == 1) Array(0.toByte)
       else Array.emptyByteArray)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(bitsPerSample)
    val data = "data".getBytes("US-ASCII") ++ le32(dataSize) ++ samples ++
      (if ((dataSize & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
    val body = "WAVE".getBytes("US-ASCII") ++ list ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Seed modulus for the duplicate-audio fixture (the [[ImgSeedMod]]
    * twin): docs sharing `doc_id % AudSeedMod` render SAMPLE-identical
    * WAVs whose container bytes differ (doc-varied LIST padding). */
  val AudSeedMod = 13

  /** Duplicate-audio corpus: ~[[AudSeedMod]] distinct PCM streams, each
    * rendered once per doc with a doc-dependent junk-chunk length —
    * bytewise all different, samplewise clustered. */
  def audioDupTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = docId % AudSeedMod
        val channels = (1L + s % 2).toInt
        val bits = if (s % 4 >= 2) 8 else 16
        val nFrames = (80L + s * 7L).toInt
        (docId, source, synthWav(channels, 8000, bits, nFrames,
          junkLen = (docId % 37).toInt))
      }
      .toDF("media_id", "source", "data")
  }

  /** The audio near-dup fixture's perturbed pooled windows (of the
    * fingerprint's 65): pert docs bitwise-NOT every sample in these —
    * each NOTed window can flip only its two boundary comparisons, so
    * the (original, perturbed) fingerprint distance stays ≤ 8. Shared
    * with the oracle's replay. */
  val AudNearPertWindows: Seq[Int] = Seq(10, 20, 30, 40)

  /** Near-dup variant of [[audioDupTable]] — the [[imageNearDupTable]]
    * twin for audio: docs with `doc_id % 3 == 0` render the SAME seed
    * stream with the samples in [[AudNearPertWindows]] bitwise-NOTed
    * (`a' = -1 - a`, always in range for both sample widths) — a
    * LOCALIZED sample edit that moves a few pooled window-mean
    * comparisons, so each seed yields an (original, perturbed)
    * fingerprint pair a near-dup pass must relate and an exact-dup pass
    * must keep apart. The perturbation is formula-level (the oracle
    * replays it amplitude-for-amplitude); container bytes still vary
    * per doc via the junk padding. */
  def audioNearDupTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val pertWindows = AudNearPertWindows.toSet
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = docId % AudSeedMod
        val channels = (1L + s % 2).toInt
        val bits = if (s % 4 >= 2) 8 else 16
        val nFrames = (80L + s * 7L).toInt
        val n = nFrames * channels
        val pert = docId % 3 == 0
        val amps = Array.tabulate(n) { k =>
          val a =
            if (bits == 16) {
              val v = (2 * k * 7 + 3) % 251 + 256 * (((2 * k + 1) * 7 + 3) % 251)
              if (v >= 32768) v - 65536 else v
            } else (k * 7 + 3) % 251 - 128
          if (pert && pertWindows(((k.toLong * 65L) / n).toInt)) -1 - a
          else a
        }
        (docId, source, synthWavFromAmps(channels, 8000, bits, amps,
          junkLen = (docId % 37).toInt))
      }
      .toDF("media_id", "source", "data")
  }

  /** Perceptual audio fingerprint over REAL decoded PCM — the
    * [[imageDHash]] twin for the audio modality: the sample stream is
    * pooled into 65 equal windows (integer boundaries `k*65/n`) and bit
    * `i` says whether window i+1's MEAN amplitude exceeds window i's —
    * division-free via cross-multiplied (sum, count) pairs, valid for
    * signed amplitudes, so the oracle re-derives every bit from the
    * fixture's synthesis formula. Container layout is invisible: two
    * byte-different files with the same samples fingerprint
    * identically. Undecodable rows report `channels = -1` with zero
    * hashes. */
  def audioFingerprint(audio: DataFrame): DataFrame = {
    import audio.sparkSession.implicits._
    audio.select(col("media_id").cast("long").as("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) =>
        val (ch, bits, n, hi, lo) = audioFpRow(data)
        (id, ch, bits, n, hi, lo)
      })
      .toDF("media_id", "channels", "bits_per_sample", "n_samples",
        "fp_hi", "fp_lo")
  }

  /** Per-row half of [[audioFingerprint]] — `(channels, bits_per_sample,
    * n_samples, fp_hi, fp_lo)`, `channels = -1` when undecodable — so
    * streaming consumers key on the identical arithmetic. */
  private[graft] def audioFpRow(
      data: Array[Byte]): (Long, Long, Long, Long, Long) =
    WavPcmCodec.locate(data) match {
      case Some(p) if p.nSamples > 0 =>
        val n = p.nSamples
        val sum = new Array[Long](65)
        val cnt = new Array[Long](65)
        var k = 0
        while (k < n) {
          val w = (k.toLong * 65L / n).toInt
          sum(w) += WavPcmCodec.sampleAt(data, p, k).toLong
          cnt(w) += 1L
          k += 1
        }
        var hash = 0L
        var i = 0
        while (i < 64) {
          // empty windows (n < 65) compare 0 > 0 — bit 0, matching
          // the oracle's absent-row default
          if (sum(i + 1) * cnt(i) > sum(i) * cnt(i + 1))
            hash |= 1L << i
          i += 1
        }
        (p.channels.toLong, p.bitsPerSample.toLong, n.toLong,
          hash >>> 32, hash & 0xffffffffL)
      case _ => (-1L, 0L, 0L, 0L, 0L)
    }

  /** Exact-duplicate audio clusters by perceptual fingerprint — the
    * [[imageDupClusters]] shape: one hash-keyed map-side-combinable
    * aggregation, never a pairwise join. */
  def audioDupClusters(fps: DataFrame): DataFrame =
    fps.filter(col("channels") =!= -1L)
      .groupBy(col("fp_hi"), col("fp_lo"))
      .agg(count(lit(1)).as("n_media"),
        min(col("media_id")).as("min_media"),
        max(col("media_id")).as("max_media"))

  /** Seed modulus for the duplicate-video fixture (the [[AudSeedMod]]
    * twin): docs sharing `doc_id % VidDupSeedMod` render PIXEL-identical
    * y4m streams whose container bytes differ (doc-varied unknown
    * header parameters). Per seed: mono (even) or 444 (odd), frame dims
    * `(8+s) × (6+s%4)`, `2+s%3` frames — every stream ≥ 96 plane bytes
    * so all 65 fingerprint windows are nonempty. COPRIME with the
    * near-dup fixture's `doc_id % 3` perturbation grain, so every seed's
    * doc population contains BOTH an original and a perturbed rendering
    * (a modulus sharing a factor with 3 would give each seed only one
    * variant and the near-dup gate nothing to relate). */
  val VidDupSeedMod = 10

  /** Duplicate-video corpus: ~[[VidDupSeedMod]] distinct pixel streams,
    * each rendered once per doc with a doc-dependent unknown y4m header
    * parameter (and a FRAME parameter on every 5th doc) — bytewise all
    * different, pixelwise clustered. Plane byte k of the concatenated
    * stream is `(s + 3x + 7y + 11p + 13f) % 251` under the
    * frame-major/plane-major decomposition the oracle replays. */
  def videoDupTable(docs: DataFrame): DataFrame =
    videoDupCorpus(docs, perturb = false)

  /** The video near-dup fixture's perturbed pooled windows (of the
    * fingerprint's 65): pert docs replace every plane byte in these
    * with `250 - v` (range-preserving for the 0..250 formula values) —
    * each perturbed window can flip only its two boundary comparisons,
    * so the (original, perturbed) fingerprint distance stays ≤ 8.
    * Shared with the oracle's replay. */
  val VidNearPertWindows: Seq[Int] = Seq(10, 20, 30, 40)

  /** Near-dup variant of [[videoDupTable]] — the [[audioNearDupTable]]
    * twin for video: docs with `doc_id % 3 == 0` render the SAME seed
    * stream with plane bytes in [[VidNearPertWindows]] inverted
    * (`v' = 250 - v`) — a LOCALIZED pixel edit that moves a few pooled
    * window-mean comparisons, so each seed yields an (original,
    * perturbed) fingerprint pair a near-dup pass must relate and an
    * exact-dup pass must keep apart. Formula-level, oracle-replayed;
    * container bytes still vary per doc. */
  def videoNearDupTable(docs: DataFrame): DataFrame =
    videoDupCorpus(docs, perturb = true)

  /** Per-seed dims shared by every [[VidDupSeedMod]]-keyed video fixture
    * (and their oracle chains): (channels, width, height, frames). */
  private def vidDims(s: Int): (Int, Int, Int, Int) =
    (if (s % 2 == 0) 1 else 3, 8 + s, 6 + s % 4, 2 + s % 3)

  private def videoDupCorpus(docs: DataFrame, perturb: Boolean): DataFrame = {
    import docs.sparkSession.implicits._
    val pertWindows = VidNearPertWindows.toSet
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = (docId % VidDupSeedMod).toInt
        val (ch, w, h, nf) = vidDims(s)
        val cs = if (ch == 1) "mono" else "444"
        val n = ch * w * h * nf
        val pert = perturb && docId % 3 == 0
        val frames = (0 until nf).map { f =>
          val b = new Array[Byte](ch * w * h)
          var p = 0
          while (p < ch) {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val k = ((f * ch + p) * h + y) * w + x
                val v = (s + 3 * x + 7 * y + 11 * p + 13 * f) % PxValMod
                b(k - f * ch * w * h) =
                  (if (pert && pertWindows((k.toLong * 65L / n).toInt)) 250 - v
                   else v).toByte
                x += 1
              }
              y += 1
            }
            p += 1
          }
          b
        }
        (docId, source, Y4mCodec.encode(w, h, cs, frames,
          headerExtra = s" Xg${docId % 37}",
          frameExtra = if (docId % 5 == 0) " Xf" else ""))
      }
      .toDF("media_id", "source", "data")
  }

  /** Perceptual video fingerprint over REAL decoded y4m frames — the
    * [[audioFingerprint]] twin for the video modality: the concatenated
    * plane-byte stream of every frame (frame-major, planes in order) is
    * pooled into 65 equal windows (integer boundaries `k*65/n`) and bit
    * `i` says whether window i+1's MEAN value exceeds window i's —
    * division-free via cross-multiplied (sum, count) pairs, so the
    * oracle re-derives every bit from the fixture's pixel formula.
    * Container layout is invisible: two byte-different y4m files with
    * the same frames fingerprint identically. Undecodable rows report
    * `channels = -1` with zero hashes. */
  def videoFingerprint(videos: DataFrame): DataFrame = {
    import videos.sparkSession.implicits._
    videos.select(col("media_id").cast("long").as("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, data) =>
        val (ch, nf, n, hi, lo) = videoFpRow(data)
        (id, ch, nf, n, hi, lo)
      })
      .toDF("media_id", "channels", "n_frames", "n_values",
        "fp_hi", "fp_lo")
  }

  /** Per-row half of [[videoFingerprint]] — `(channels, n_frames,
    * n_values, fp_hi, fp_lo)`, `channels = -1` when undecodable — so
    * streaming consumers key on the identical arithmetic. */
  private[graft] def videoFpRow(
      data: Array[Byte]): (Long, Long, Long, Long, Long) =
    Y4mCodec.decode(data) match {
      case Some(v) if v.frames.nonEmpty =>
        val n = v.frames.length.toLong * v.frameBytes
        val sum = new Array[Long](65)
        val cnt = new Array[Long](65)
        var fi = 0
        while (fi < v.frames.length) {
          val f = v.frames(fi)
          val base = fi.toLong * v.frameBytes
          var j = 0
          while (j < f.length) {
            val w = ((base + j) * 65L / n).toInt
            sum(w) += (f(j) & 0xff).toLong
            cnt(w) += 1L
            j += 1
          }
          fi += 1
        }
        var hash = 0L
        var i = 0
        while (i < 64) {
          // empty windows (n < 65) compare 0 > 0 — bit 0, matching
          // the oracle's absent-row default
          if (sum(i + 1) * cnt(i) > sum(i) * cnt(i + 1))
            hash |= 1L << i
          i += 1
        }
        (v.channels.toLong, v.frames.length.toLong, n,
          hash >>> 32, hash & 0xffffffffL)
      case _ => (-1L, 0L, 0L, 0L, 0L)
    }

  /** Exact-duplicate video clusters by perceptual fingerprint — the
    * [[imageDupClusters]] shape: one hash-keyed map-side-combinable
    * aggregation, never a pairwise join. */
  def videoDupClusters(fps: DataFrame): DataFrame =
    fps.filter(col("channels") =!= -1L)
      .groupBy(col("fp_hi"), col("fp_lo"))
      .agg(count(lit(1)).as("n_media"),
        min(col("media_id")).as("min_media"),
        max(col("media_id")).as("max_media"))

  /** Video twin of [[imageNearDupPairs]] / [[audioNearDupPairs]]: the
    * same banded-LSH machinery over DISTINCT perceptual video
    * fingerprints — near-duplicate renderings of the same footage (a
    * few perturbed pixel windows, the fixture's knob) land within a
    * small Hamming distance and share a band; pair volume is bounded by
    * distinct-fingerprint band collisions, never corpus size. */
  def videoNearDupPairs(fps: DataFrame, maxHamming: Int = 8): DataFrame =
    bandedHammingPairs(
      fps.filter(col("channels") =!= -1L)
        .groupBy(col("fp_hi"), col("fp_lo"))
        .agg(count(lit(1)).as("n_media")),
      hi = "fp_hi", lo = "fp_lo", cnt = "n_media", maxHamming = maxHamming)

  /** Deterministic y4m corpus for the CROSS-MODAL still-frame gate —
    * the [[videoDupTable]] dims under a spatially-WRAPPING pixel formula
    * `(s + 3x + 7y + 11p + 13f + 5xy) % 251`: the `5xy` term wraps the
    * value ramp inside every frame, so per-frame dHashes discriminate
    * (the dup fixture's linear ramp is monotone in x — every frame
    * pools to the same all-ones spatial hash, useless for a spatial
    * index). Container bytes vary per doc; pixels depend only on the
    * seed. */
  def stillVideoTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = (docId % VidDupSeedMod).toInt
        val (ch, w, h, nf) = vidDims(s)
        val cs = if (ch == 1) "mono" else "444"
        val frames = (0 until nf).map { f =>
          val b = new Array[Byte](ch * w * h)
          var p = 0
          while (p < ch) {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                b(p * w * h + y * w + x) =
                  ((s + 3 * x + 7 * y + 11 * p + 13 * f + 5 * x * y)
                    % PxValMod).toByte
                x += 1
              }
              y += 1
            }
            p += 1
          }
          b
        }
        (docId, source, Y4mCodec.encode(w, h, cs, frames,
          headerExtra = s" Xg${docId % 37}",
          frameExtra = if (docId % 5 == 0) " Xf" else ""))
      }
      .toDF("media_id", "source", "data")
  }

  /** The still-image side of the cross-modal fixture: per doc, a REAL
    * PNG rendered from the SAME formula as [[stillVideoTable]]'s frame
    * `fStar = s % nf` (channel c ↔ plane p), so an unperturbed image's
    * dHash equals that frame's dHash EXACTLY — a training corpus
    * contaminated with stills lifted from known footage. Docs with
    * `doc_id % 3 == 0` invert (`250 - v`) the left half of row 0 per
    * channel — a localized edit that moves 1-4 dHash bits, the
    * near-match knob. Container bytes vary per doc (filter choice). */
  def stillImageTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = (docId % VidDupSeedMod).toInt
        val (ch, w, h, nf) = vidDims(s)
        val fStar = s % nf
        val colorType = if (ch == 1) 0 else 2
        val pert = docId % 3 == 0
        val raw = new Array[Byte](w * h * ch)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < ch) {
              val v = (s + 3 * x + 7 * y + 11 * c + 13 * fStar + 5 * x * y) %
                PxValMod
              raw((y * w + x) * ch + c) =
                (if (pert && y == 0 && x < w / 2) 250 - v else v).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        (docId, source,
          PngCodec.encode(w, h, colorType, raw, r => ((r + docId) % 5).toInt))
      }
      .toDF("media_id", "source", "data")
  }

  /** Per-FRAME perceptual dHash over REAL decoded y4m streams — the
    * [[imageDHash]] grid (8 rows × 9 pooled columns, bit = right cell's
    * mean luma exceeds left's, cross-multiplied) applied to each frame,
    * with per-pixel luma the sum over planes exactly as image luma sums
    * channels — so a PNG of a frame and the frame itself hash
    * IDENTICALLY. The frame-grain index for cross-modal matching.
    * Undecodable rows report one `frame_idx = -1, channels = -1` row. */
  def videoFrameDHash(videos: DataFrame): DataFrame = {
    import videos.sparkSession.implicits._
    videos.select(col("media_id").cast("long").as("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, data) =>
          Y4mCodec.decode(data) match {
            case Some(v) if v.frames.nonEmpty =>
              val w = v.width
              val h = v.height
              // mono/444 sum full-resolution planes (channel-sum luma,
              // matching imageDHash); 420's chroma is subsampled, so its
              // hash pools the full-res luma plane alone
              val ch = if (v.colorspace == "420jpeg") 1 else v.channels
              v.frames.zipWithIndex.map { case (f, fi) =>
                val cell = Array.ofDim[Long](8, 9)
                val area = Array.ofDim[Long](8, 9)
                var y = 0
                while (y < h) {
                  val j = y * 8 / h
                  var x = 0
                  while (x < w) {
                    val i = x * 9 / w
                    var l = 0L
                    var p = 0
                    while (p < ch) {
                      l += (f(p * w * h + y * w + x) & 0xff).toLong
                      p += 1
                    }
                    cell(j)(i) += l
                    area(j)(i) += 1L
                    x += 1
                  }
                  y += 1
                }
                var hash = 0L
                var j = 0
                while (j < 8) {
                  var i = 0
                  while (i < 8) {
                    if (cell(j)(i + 1) * area(j)(i) >
                        cell(j)(i) * area(j)(i + 1))
                      hash |= 1L << (j * 8 + i)
                    i += 1
                  }
                  j += 1
                }
                (id, fi.toLong, w.toLong, h.toLong, v.channels.toLong,
                  hash >>> 32, hash & 0xffffffffL)
              }
            case _ => Seq((id, -1L, 0L, 0L, -1L, 0L, 0L))
          }
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "channels",
        "dhash_hi", "dhash_lo")
  }

  /** Order-canonical signature of a video's DISTINCT frame-hash SET —
    * footage-set dedup: the same footage re-encoded, re-containered, or
    * with frames repeated hashes to the same signature (atoms are
    * zero-padded decimal `hi:lo` so lexicographic sort equals numeric
    * sort on both engines; md5 over the comma-joined sorted set). One
    * aggregation per video — the frame list never leaves its group and
    * nothing goes pairwise. */
  /** One frame hash as a fixed-width text atom (`hi:lo`, zero-padded so
    * lexicographic order equals numeric) — the token unit shared by the
    * footage signature and the footage MinHash. */
  private def frameAtom: Column =
    concat(lpad(col("dhash_hi").cast("string"), 10, "0"), lit(":"),
      lpad(col("dhash_lo").cast("string"), 10, "0"))

  def footageSignature(frames: DataFrame): DataFrame =
    frames.filter(col("channels") =!= -1L)
      .select(col("media_id"), frameAtom.as("atom"))
      .distinct()
      .groupBy(col("media_id"))
      .agg(md5(concat_ws(",", array_sort(collect_list(col("atom"))))
          .cast("binary")).as("footage_sig"),
        count(lit(1)).as("n_distinct_frames"))

  /** Exact footage-set clusters — the [[imageDupClusters]] shape at the
    * VIDEO grain: one signature-keyed map-side-combinable aggregation,
    * so a billion re-encodings of one clip cost one shuffled row. */
  def footageClusters(sigs: DataFrame): DataFrame =
    sigs.groupBy(col("footage_sig"))
      .agg(count(lit(1)).as("n_videos"),
        min(col("media_id")).as("min_media"),
        max(col("media_id")).as("max_media"))

  /** CLIP corpus for the near-duplicate-footage gate: per doc, a
    * doc-positioned WINDOW of its seed's [[stillVideoTable]] footage —
    * frames `[off, off + nf - 1)` with `off = (doc_id / VidDupSeedMod)
    * % 2` (NOT `doc_id % 2`, which is constant within a seed class
    * because the seed modulus is even) — so same-seed docs at different
    * offsets share most but not all frames (the trailer-cut-from-film
    * shape), and container bytes still vary per doc. */
  def clipTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = (docId % VidDupSeedMod).toInt
        val (ch, w, h, nf) = vidDims(s)
        val cs = if (ch == 1) "mono" else "444"
        val off = ((docId / VidDupSeedMod) % 2).toInt
        val frames = (off until off + nf - 1).map { f =>
          val b = new Array[Byte](ch * w * h)
          var p = 0
          while (p < ch) {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                b(p * w * h + y * w + x) =
                  ((s + 3 * x + 7 * y + 11 * p + 13 * f + 5 * x * y)
                    % PxValMod).toByte
                x += 1
              }
              y += 1
            }
            p += 1
          }
          b
        }
        (docId, source, Y4mCodec.encode(w, h, cs, frames,
          headerExtra = s" Xg${docId % 37}",
          frameExtra = if (docId % 5 == 0) " Xf" else ""))
      }
      .toDF("media_id", "source", "data")
  }

  /** NEAR-duplicate footage: video pairs sharing a large fraction of
    * their distinct frame hashes — a clip embedded in a compilation, a
    * trailer cut from a film, re-edits of the same source. The text
    * near-dup machinery reused whole
    * ([[graft.dedup.Dedup.minhashLshPairsOver]]) with frame-hash atoms
    * as the token unit: per-video MinHash signatures (one aggregation),
    * banded candidate generation, exact signature-agreement scoring —
    * pair volume bounded by band collisions, never by corpus size.
    * Output `(video_a, video_b, matches, est_sim)`. */
  def footageNearDupPairs(frames: DataFrame, numHashes: Int = 16,
      bands: Int = 4): DataFrame =
    graft.dedup.Dedup.minhashLshPairsOver(
      frames.filter(col("channels") =!= -1L)
        .select(col("media_id").as("doc_id"), frameAtom.as("shingle"))
        .distinct(),
      numHashes = numHashes, bands = bands)
      .select(col("doc_a").as("video_a"), col("doc_b").as("video_b"),
        col("matches"), col("est_sim"))

  /** CROSS-MODAL near-match: video frames whose perceptual dHash lands
    * within `maxHamming` of a known image's — still-frame / thumbnail
    * contamination detection between a video corpus and an image
    * corpus. Bipartite twin of [[imageNearDupPairs]]: both sides dedup
    * to DISTINCT-hash nodes first (`n_frames` counts (video, frame)
    * occurrences, `n_images` images), nodes band into four exact 16-bit
    * slices, candidates share a band, codegen `bit_count` applies the
    * exact cutoff. Pair volume is bounded by cross-side band
    * collisions, never by corpus sizes. */
  def stillFrameMatches(frames: DataFrame, images: DataFrame,
      maxHamming: Int = 8): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, s"maxHamming: $maxHamming")
    val frNodes = frames.filter(col("channels") =!= -1L)
      .groupBy(col("dhash_hi"), col("dhash_lo"))
      .agg(count(lit(1)).as("n_frames"))
    val imNodes = images.filter(col("channels") =!= -1L)
      .groupBy(col("dhash_hi"), col("dhash_lo"))
      .agg(count(lit(1)).as("n_images"))
    def banded(nodes: DataFrame, cnt: String) =
      nodes.select(col("dhash_hi"), col("dhash_lo"), col(cnt),
        posexplode(array(
          col("dhash_lo").bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("dhash_lo"), 16).bitwiseAND(lit(65535L)),
          col("dhash_hi").bitwiseAND(lit(65535L)),
          shiftrightunsigned(col("dhash_hi"), 16).bitwiseAND(lit(65535L))))
          .as(Seq("band_idx", "band_val")))
    val a = banded(frNodes, "n_frames")
      .select(col("dhash_hi").as("fr_hi"), col("dhash_lo").as("fr_lo"),
        col("n_frames"), col("band_idx"), col("band_val"))
    val b = banded(imNodes, "n_images")
      .select(col("dhash_hi").as("im_hi"), col("dhash_lo").as("im_lo"),
        col("n_images"), col("band_idx"), col("band_val"))
    val hamming = bit_count(col("fr_hi").bitwiseXOR(col("im_hi")))
      .cast("long") +
      bit_count(col("fr_lo").bitwiseXOR(col("im_lo"))).cast("long")
    a.join(b, Seq("band_idx", "band_val"))
      .select(col("fr_hi"), col("fr_lo"), col("n_frames"),
        col("im_hi"), col("im_lo"), col("n_images"))
      .distinct()
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming.toLong)
  }

  /** Shared gate/oracle constants for the synthetic y4m pixel corpus —
    * the video twin of the PxWidthMod family: per seed
    * `s = doc_id % VidSeedMod`, frame dims are `1 + s % VidPxWMod` ×
    * `1 + s % VidPxHMod`, frame count `1 + s % VidPxFrMod`, colorspace
    * mono (even seeds) or 444 (odd), and plane byte
    * `(s + 3x + 7y + 11p + 13f) % PxValMod`. */
  val VidSeedMod = 11
  val VidPxWMod = 12
  val VidPxHMod = 9
  val VidPxFrMod = 5

  /** Deterministic corpus of REAL YUV4MPEG2 streams — the frame leg of
    * the real-decode fixtures ([[imagePixelTable]]'s video twin): per
    * seed, formula-valued planar frames in a live y4m container; every
    * third doc carries an unknown `X` header parameter and every fifth
    * a FRAME-line parameter, so the decoder's skip paths are exercised
    * by the gate, not just by specs. Container bytes vary per doc while
    * pixels depend only on the seed. */
  def videoPixelTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val s = (docId % VidSeedMod).toInt
        val w = 1 + s % VidPxWMod
        val h = 1 + s % VidPxHMod
        val nf = 1 + s % VidPxFrMod
        val cs = if (s % 2 == 0) "mono" else "444"
        val ch = if (cs == "mono") 1 else 3
        val frames = (0 until nf).map { f =>
          val b = new Array[Byte](ch * w * h)
          var p = 0
          while (p < ch) {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                b(p * w * h + y * w + x) =
                  ((s + 3 * x + 7 * y + 11 * p + 13 * f) % PxValMod).toByte
                x += 1
              }
              y += 1
            }
            p += 1
          }
          b
        }
        (docId, source, Y4mCodec.encode(w, h, cs, frames,
          headerExtra = if (docId % 3 == 0) " Xgraft" else "",
          frameExtra = if (docId % 5 == 0) " Xf" else ""))
      }
      .toDF("media_id", "source", "data")
  }

  /** Integer-exact per-FRAME pixel audit over REAL decoded y4m streams —
    * the gate surface of [[Y4mCodec]], at frame grain so the decoder's
    * frame boundaries are pinned, not just stream totals: per (media,
    * frame), the plane byte count and min/max/sum. Undecodable rows
    * report one `frame_idx = -1, channels = -1` row with zero stats —
    * present, never dropped, never an exception. */
  def videoFrameStats(videos: DataFrame): DataFrame = {
    import videos.sparkSession.implicits._
    videos.select(col("media_id").cast("long").as("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, data) =>
          Y4mCodec.decode(data) match {
            case Some(v) if v.frames.nonEmpty =>
              v.frames.zipWithIndex.map { case (f, fi) =>
                var k = 0
                var mn = 255L
                var mx = 0L
                var sum = 0L
                while (k < f.length) {
                  val px = (f(k) & 0xff).toLong
                  if (px < mn) mn = px
                  if (px > mx) mx = px
                  sum += px
                  k += 1
                }
                (id, fi.toLong, v.width.toLong, v.height.toLong,
                  v.channels.toLong, f.length.toLong, mn, mx, sum)
              }
            case _ => Seq((id, -1L, 0L, 0L, -1L, 0L, 0L, 0L, 0L))
          }
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "channels",
        "n_values", "min_v", "max_v", "sum_v")
  }

  /** Shared gate/oracle constant for the synthetic MP4 corpus: movie
    * duration units derive as `1 + n_chars % VidDurMod`. */
  val VidDurMod = 100000

  /** Deterministic synthetic corpus of REAL ISO-BMFF (MP4) bytes — the
    * video leg of the fixture triple: ftyp (doc-derived major brand), a
    * free box (64-bit largesize on every 7th doc, exercising the u64
    * size path), moov with mvhd (version 1 on every 5th doc) and one or
    * two trak/tkhd boxes (video dims in 16.16 fixed point; odd docs add
    * a 0x0 audio track), and an mdat payload the parser must skip by
    * size. The oracle re-derives every field arithmetically. */
  def videoTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (docId, source, nChars) =>
        val brand = if (docId % 2 == 0) "isom" else "mp42"
        val timescale = (docId % 3) match {
          case 0 => 600
          case 1 => 1000
          case _ => 90000
        }
        val units = 1L + nChars % VidDurMod
        val w = (16L * (1 + docId % 120)).toInt
        val h = (16L * (1 + docId % 68)).toInt
        (docId, source, synthMp4(brand, timescale, units, w, h,
          audioTrack = docId % 2 == 1,
          mvhdV1 = docId % 5 == 0,
          largeFree = docId % 7 == 0))
      }
      .toDF("media_id", "source", "data")
  }

  private def mp4Box(boxType: String, payload: Array[Byte]): Array[Byte] =
    be32(8 + payload.length) ++ boxType.getBytes("US-ASCII") ++ payload

  /** A structurally valid minimal MP4: every box size is live, mvhd and
    * tkhd carry full-length payloads (unity matrix, rate/volume), and
    * dims ride the spec's 16.16 fixed-point encoding. */
  def synthMp4(brand: String, timescale: Int, durationUnits: Long,
      videoW: Int, videoH: Int, audioTrack: Boolean,
      mvhdV1: Boolean, largeFree: Boolean): Array[Byte] = {
    require(brand.length == 4, s"4cc brand: $brand")
    val unityMatrix =
      be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000)
    val ftyp = mp4Box("ftyp",
      brand.getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    val free =
      if (largeFree) {
        val payload = Array.tabulate[Byte](9)(i => (i + 1).toByte)
        be32(1) ++ "free".getBytes("US-ASCII") ++
          be32(0) ++ be32(16 + payload.length) ++ payload // u64 largesize
      } else mp4Box("free", Array.tabulate[Byte](6)(i => (i + 1).toByte))
    val mvhdTail = // rate, volume+reserved, reserved(8), matrix, predefined(24), next track
      be32(0x00010000) ++ be16(0x0100) ++ be16(0) ++ be32(0) ++ be32(0) ++
        unityMatrix ++ Array.fill[Byte](24)(0) ++ be32(3)
    val mvhd =
      if (mvhdV1)
        mp4Box("mvhd", Array[Byte](1, 0, 0, 0) ++
          be64(0L) ++ be64(0L) ++ be32(timescale) ++ be64(durationUnits) ++ mvhdTail)
      else
        mp4Box("mvhd", Array[Byte](0, 0, 0, 0) ++
          be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durationUnits.toInt) ++ mvhdTail)
    def tkhd(trackId: Int, w: Int, h: Int) =
      mp4Box("tkhd", Array[Byte](0, 0, 0, 7) ++
        be32(0) ++ be32(0) ++ be32(trackId) ++ be32(0) ++ be32(durationUnits.toInt) ++
        be64(0L) ++ be16(0) ++ be16(0) ++ be16(if (w == 0) 0x0100 else 0) ++ be16(0) ++
        unityMatrix ++ be32(w << 16) ++ be32(h << 16))
    val traks =
      (if (audioTrack) mp4Box("trak", tkhd(1, 0, 0)) else Array.emptyByteArray) ++
        mp4Box("trak", tkhd(if (audioTrack) 2 else 1, videoW, videoH))
    val moov = mp4Box("moov", mvhd ++ traks)
    val mdat = mp4Box("mdat", Array.tabulate[Byte](32)(j => ((j * 5 + 1) % 127).toByte))
    ftyp ++ free ++ moov ++ mdat
  }

  private def be64(v: Long): Array[Byte] =
    be32((v >>> 32).toInt) ++ be32((v & 0xffffffffL).toInt)

  /** Per-record byte overhead of [[warcTable]]'s header template beyond
    * the variable parts (2× the doc-id digit count, the source length,
    * the content-length digit count, the payload bytes) — shared with
    * the q_warc_records oracle's offset arithmetic and pinned against
    * the actual builder output by MultimodalSpec, so template and
    * constant cannot drift apart silently. */
  val WarcFixedOverhead = 145

  /** Bucket count bounding each WARC blob ([[warcTable]]): record streams
    * group on (source, doc_id % WarcBuckets) so blob size stays
    * core-friendly regardless of source skew. */
  val WarcBuckets = 32

  /** Deterministic synthetic crawl-container corpus: real ISO 28500 WARC
    * streams, one blob per (source, bucket), each concatenating that
    * slice's documents as `WARC/1.0 response` records in doc_id order —
    * CRLF header block (including WARC-Record-ID / WARC-Date headers the
    * parser must SKIP), Content-Length framing, CRLFCRLF separators.
    * The oracle re-derives every record's offset by cumulative byte
    * arithmetic over the same template. */
  def warcTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), (col("doc_id") % WarcBuckets).as("bucket"),
        col("doc_id"), col("text"))
      .groupBy(col("source"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("recs"))
      .as[(String, Long, Seq[(Long, String)])]
      .map { case (source, bucket, recs) =>
        val bos = new java.io.ByteArrayOutputStream()
        recs.foreach { case (docId, text) =>
          bos.write(warcRecord(source, docId, Option(text).getOrElse("")))
        }
        (source, bucket, bos.toByteArray)
      }
      .toDF("source", "bucket", "data")
  }

  /** One WARC/1.0 response record for (source, docId, text) — the
    * template [[WarcFixedOverhead]] describes. */
  def warcRecord(source: String, docId: Long, text: String): Array[Byte] =
    warcRecordBytes(source, docId, text.getBytes("UTF-8"))

  def warcRecordBytes(source: String, docId: Long, payload: Array[Byte]): Array[Byte] = {
    val header =
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:graft:$docId>\r\n" +
        "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"WARC-Target-URI: http://$source/$docId\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        "\r\n"
    header.getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** One RFC 1952 gzip member of `payload` (real DEFLATE via
    * `GZIPOutputStream`, live CRC32/ISIZE trailer). BEST_SPEED: the
    * gates compare INFLATED bytes, so the compression level affects only
    * fixture-build cost, never a hash. */
  def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos) {
      `def`.setLevel(java.util.zip.Deflater.BEST_SPEED)
    }
    gz.write(payload)
    gz.close()
    bos.toByteArray
  }

  /** Common Crawl's actual on-disk form: `.warc.gz` blobs with one gzip
    * member PER RECORD (RFC 1952 multi-member), one blob per
    * (source, bucket) — the fixture for `gzip_members` → `warc_records`.
    * The compressed bytes are whatever DEFLATE emits; the gate compares
    * only the INFLATED result, which is exact by construction. */
  def warcGzTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), (col("doc_id") % WarcBuckets).as("bucket"),
        col("doc_id"), col("text"))
      .groupBy(col("source"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("recs"))
      .as[(String, Long, Seq[(Long, String)])]
      .map { case (source, bucket, recs) =>
        val bos = new java.io.ByteArrayOutputStream()
        recs.foreach { case (docId, text) =>
          bos.write(gzipMember(warcRecord(source, docId, Option(text).getOrElse(""))))
        }
        (source, bucket, bos.toByteArray)
      }
      .toDF("source", "bucket", "data")
  }

  /** Deterministic corruption index for (source, bucket): which gzip
    * member of the blob gets its CRC trailer flipped — the md5-derived
    * position the q_warc_malformed oracle re-computes as
    * `('0x' || substr(md5('corrupt:' || source || ':' || bucket), 1, 8))::BIGINT % n`. */
  def corruptIdx(source: String, bucket: Long, n: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"corrupt:$source:$bucket".getBytes("UTF-8"))
    val hex = h.take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % n).toInt
  }

  /** The corrupted-crawl fixture: [[warcGzTable]] blobs with EXACTLY ONE
    * member's stored CRC32 trailer byte-flipped (XOR 0x5A on the first
    * trailer byte of member [[corruptIdx]]). The flip is
    * deterministic-by-construction malformed: the member still inflates,
    * but its computed CRC cannot equal the altered stored CRC, so a
    * stop-at-malformed reader recovers exactly the `corruptIdx`-member
    * prefix — data loss bounded and auditable, data invention impossible.
    * This is the contract a real 100 TB crawl read exercises constantly
    * (truncated members, bit rot); q_warc_malformed gates it cross-engine
    * against pure arithmetic. */
  def warcGzCorruptTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), (col("doc_id") % WarcBuckets).as("bucket"),
        col("doc_id"), col("text"))
      .groupBy(col("source"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("recs"))
      .as[(String, Long, Seq[(Long, String)])]
      .map { case (source, bucket, recs) =>
        val members = recs.map { case (docId, text) =>
          gzipMember(warcRecord(source, docId, Option(text).getOrElse("")))
        }
        val k = corruptIdx(source, bucket, members.length)
        val bos = new java.io.ByteArrayOutputStream()
        members.zipWithIndex.foreach { case (m, i) =>
          if (i == k) {
            val c = m.clone()
            c(c.length - 8) = (c(c.length - 8) ^ 0x5a).toByte // stored CRC32
            bos.write(c)
          } else bos.write(m)
        }
        (source, bucket, bos.toByteArray)
      }
      .toDF("source", "bucket", "data")
  }

  /** Tag count of the [[htmlPage]] template — shared with the
    * q_html_text / q_crawl_pipeline oracles (each page carries exactly
    * this many tags; `html_text` must count the same). */
  val HtmlTemplateTags = 14

  /** HTML-escape the five predefined characters — what a well-formed
    * producer emits; [[graft.functions.HtmlText]] must decode it back
    * EXACTLY for the body digest to match the oracle's md5(text). */
  def htmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case '\'' => sb.append("&#39;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** A deterministic HTML page: title from the doc id, script and style
    * blocks the extractor must SKIP (their content contains '<' and
    * braces), the escaped doc text as the single body text node. */
  def htmlPage(docId: Long, text: String): Array[Byte] =
    (s"<html><head><title>Doc $docId</title>" +
      "<script>var x = 1 < 2; // not training text</script>" +
      "<style>p { color: red; }</style>" +
      s"</head><body><p>${htmlEscape(text)}</p></body></html>").getBytes("UTF-8")

  /** HTML fixture table: one real page per doc. */
  def htmlTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .map { case (docId, source, text) =>
        (docId, source, htmlPage(docId, Option(text).getOrElse("")))
      }
      .toDF("media_id", "source", "data")
  }

  /** The COMPLETE crawl fixture, five layers deep: gzip members (one per
    * record) of WARC records whose payloads are HTTP responses whose
    * bodies are HTML pages carrying the doc text — what a Common Crawl
    * segment actually is. One blob per (source, bucket). */
  def crawlTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), (col("doc_id") % WarcBuckets).as("bucket"),
        col("doc_id"), col("text"))
      .groupBy(col("source"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("recs"))
      .as[(String, Long, Seq[(Long, String)])]
      .map { case (source, bucket, recs) =>
        val bos = new java.io.ByteArrayOutputStream()
        recs.foreach { case (docId, text) =>
          val (status, reason, ctype) = httpFieldsOf(docId)
          bos.write(gzipMember(warcRecordBytes(source, docId,
            httpResponse(status, reason, ctype,
              htmlPage(docId, Option(text).getOrElse(""))))))
        }
        (source, bucket, bos.toByteArray)
      }
      .toDF("source", "bucket", "data")
  }

  /** Byte size of every [[synthPng]] output (all fields are fixed-width,
    * so the container size is constant) — shared with the q_tar_entries /
    * q_webdataset oracles' offset/size arithmetic and pinned against the
    * builder by WebDatasetSpec. */
  val WdsPngBytes = 71

  /** One POSIX ustar entry — the promoted writer's framer
    * ([[ShardWriter.tarEntry]]); fixtures and operators share one byte
    * layout by construction. */
  def tarEntry(name: String, payload: Array[Byte]): Array[Byte] =
    ShardWriter.tarEntry(name, payload)

  /** WebDataset fixture: real ustar shards, one per (source, bucket),
    * whose members pair into samples by filename stem — `<doc_id>.txt`
    * (the doc text) followed by `<doc_id>.png` (a real PNG from
    * [[synthPng]], constant [[WdsPngBytes]] bytes) — closed by the two
    * zero blocks. The image-text-pair shard format multimodal training
    * actually reads. */
  def webdatasetTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), (col("doc_id") % WarcBuckets).as("bucket"),
        col("doc_id"), col("text"), col("n_chars"))
      .groupBy(col("source"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text"), col("n_chars")))).as("recs"))
      .as[(String, Long, Seq[(Long, String, Long)])]
      .map { case (source, bucket, recs) =>
        val bos = new java.io.ByteArrayOutputStream()
        recs.foreach { case (docId, text, nChars) =>
          bos.write(tarEntry(s"$docId.txt",
            Option(text).getOrElse("").getBytes("UTF-8")))
          bos.write(tarEntry(s"$docId.png",
            synthPng((1L + nChars % ImgWidthMod).toInt,
              (1L + docId % ImgHeightMod).toInt, 8, 2)))
        }
        bos.write(new Array[Byte](1024)) // end-of-archive zero blocks
        (source, bucket, bos.toByteArray)
      }
      .toDF("source", "bucket", "data")
  }

  /** One TFRecord frame — the promoted writer's framer
    * ([[ShardWriter.tfRecordFrame]]); fixtures and operators share one
    * byte layout by construction. */
  def tfRecord(payload: Array[Byte]): Array[Byte] =
    ShardWriter.tfRecordFrame(payload)

  /** TFRecord shard fixture: one shard per (source, bucket), records
    * carrying the doc texts in doc_id order — the third training
    * container next to [[warcGzTable]] and [[webdatasetTable]]. */
  def tfrecordTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), (col("doc_id") % WarcBuckets).as("bucket"),
        col("doc_id"), col("text"))
      .groupBy(col("source"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("recs"))
      .as[(String, Long, Seq[(Long, String)])]
      .map { case (source, bucket, recs) =>
        val bos = new java.io.ByteArrayOutputStream()
        recs.foreach { case (_, text) =>
          bos.write(tfRecord(Option(text).getOrElse("").getBytes("UTF-8")))
        }
        (source, bucket, bos.toByteArray)
      }
      .toDF("source", "bucket", "data")
  }

  /** Head-byte overhead of [[httpResponse]] beyond the variable parts
    * (reason, content-type, content-length digit count) — shared with
    * the q_warc_http oracle's body_offset arithmetic and pinned against
    * the builder by WarcRecordsSpec (the [[WarcFixedOverhead]] rule). */
  val HttpFixedOverhead = 66

  /** A real RFC 9112 response head + body: status line, Content-Type, a
    * skip-worthy Server header, Content-Length, blank line, body. */
  def httpResponse(status: Int, reason: String, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val head =
      s"HTTP/1.1 $status $reason\r\n" +
        s"Content-Type: $contentType\r\n" +
        "Server: graft\r\n" +
        s"Content-Length: ${body.length}\r\n" +
        "\r\n"
    head.getBytes("US-ASCII") ++ body
  }

  /** Doc-derived HTTP status/reason/content-type — the arithmetic the
    * q_warc_http oracle re-derives. */
  def httpFieldsOf(docId: Long): (Int, String, String) = {
    val (status, reason) = (docId % 10) match {
      case 0 => (301, "Moved Permanently")
      case 1 => (404, "Not Found")
      case _ => (200, "OK")
    }
    val ctype =
      if (docId % 2 == 0) "text/html; charset=utf-8" else "text/plain"
    (status, reason, ctype)
  }

  /** The full Common Crawl shape: WARC blobs whose record payloads are
    * real HTTP responses carrying the doc text as body — the three-layer
    * fixture for `warc_payloads` → `http_head`. */
  def warcHttpTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), (col("doc_id") % WarcBuckets).as("bucket"),
        col("doc_id"), col("text"))
      .groupBy(col("source"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("recs"))
      .as[(String, Long, Seq[(Long, String)])]
      .map { case (source, bucket, recs) =>
        val bos = new java.io.ByteArrayOutputStream()
        recs.foreach { case (docId, text) =>
          val (status, reason, ctype) = httpFieldsOf(docId)
          bos.write(warcRecordBytes(source, docId,
            httpResponse(status, reason, ctype,
              Option(text).getOrElse("").getBytes("UTF-8"))))
        }
        (source, bucket, bos.toByteArray)
      }
      .toDF("source", "bucket", "data")
  }

  /** The PRODUCTION codec at the [[MediaCodec]] seam: features come from a
    * real byte parse ([[graft.functions.ImageHeader]] — PNG IHDR / JPEG
    * SOFn + EXIF), not a byte histogram. Frame sampling and resize keep
    * the byte-window plumbing (header parsing yields no pixel buffer to
    * resample; those stages stay payload-shaped by design). */
  object ImageHeaderCodec extends MediaCodec {
    val FeatureDim = 6
    override def featureDim: Int = FeatureDim

    def decodeFeatures(data: Array[Byte]): Array[Float] = {
      val h = graft.functions.ImageHeader.parse(data)
      val fmt = h.getUTF8String(0).toString match {
        case "png" => 1f
        case "jpeg" => 2f
        case _ => 0f
      }
      Array(fmt, h.getInt(1).toFloat, h.getInt(2).toFloat,
        h.getInt(3).toFloat, h.getInt(4).toFloat, h.getInt(5).toFloat)
    }

    def sampleFrames(data: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] =
      StubCodec.sampleFrames(data, frameBytes, stride)

    def resize(data: Array[Byte], targetBytes: Int): Array[Byte] =
      StubCodec.resize(data, targetBytes)
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
