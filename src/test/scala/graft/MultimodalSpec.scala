package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.StubCodec

class MultimodalSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("mediaFromDocuments: binary column with modality metadata") {
    val media = Multimodal.mediaFromDocuments(docsOf((0L, "abc"), (1L, "defg"))).collect()
    val img = media.find(_.getAs[Long]("media_id") == 0L).get
    assert(img.getAs[String]("kind") == "image")
    assert(img.getAs[Array[Byte]]("data").toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(img.getAs[Int]("sample_rate") == -1)
    val aud = media.find(_.getAs[Long]("media_id") == 1L).get
    assert(aud.getAs[String]("kind") == "audio")
    assert(aud.getAs[Int]("sample_rate") == 16000)
    assert(aud.getAs[Long]("duration_ms") == 40L)
  }

  test("extractFeatures: deterministic stub features, L1-normalized") {
    val media = Multimodal.asMedia(Multimodal.mediaFromDocuments(docsOf((0L, "abc"))))
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.n_bytes == 3L)
    assert(f.features.length == StubCodec.FeatureDim)
    // 'a'=0x61,'b'=0x62,'c'=0x63 -> all high-nibble 6
    assert(f.features(6) == 1.0f)
    assert(math.abs(f.features.sum - 1.0f) < 1e-6)
  }

  test("sampleFrames: every stride-th fixed-size window, indexed") {
    val bytes = Array.tabulate[Byte](1024)(i => (i % 127).toByte)
    val frames = StubCodec.sampleFrames(bytes, frameBytes = 256, stride = 2)
    assert(frames.length == 2) // windows 0 and 2 of 4
    assert(frames.head.length == 256)

    val media = Multimodal.asMedia(Multimodal.mediaFromDocuments(docsOf((0L, "x" * 1024))))
    val df = Multimodal.sampleFrames(media, frameBytes = 256, stride = 2)
    assert(df.count() == 2)
    assert(df.select(max(col("frame_idx"))).collect().head.getInt(0) == 1)
  }

  test("resize: bounds payloads to target, rescales dims, passes small media through") {
    val small = "tiny"
    val big = "y" * 10000
    val media = Multimodal.asMedia(Multimodal.mediaFromDocuments(
      docsOf((0L, big), (2L, small))))
    val out = Multimodal.resize(media, targetBytes = 1000).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(0L).data.length == 1000) // downsampled to target
    assert(out(0L).width == (out(0L).width.toDouble).toInt && out(0L).width >= 1)
    assert(out(2L).data.sameElements(small.getBytes("UTF-8"))) // no upscale
    // deterministic: same input, same bytes
    val again = Multimodal.resize(media, targetBytes = 1000).collect()
      .find(_.media_id == 0L).get
    assert(again.data.sameElements(out(0L).data))
    // resized features still extract downstream
    val feats = Multimodal.extractFeatures(
      Multimodal.resize(media, targetBytes = 1000)).collect()
    assert(feats.forall(_.features.length == StubCodec.FeatureDim))
  }

  test("features feed similarity search: identical media rank first at cos 1.0") {
    val docs = docsOf((1L, "same bytes here"), (2L, "same bytes here"),
      (3L, "completely different content Z9!"))
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(Multimodal.mediaFromDocuments(docs)))
      .toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"),
        lit(0).as("label"))
    val got = graft.similarity.Similarity.bruteForceTopK(
      feats.filter(col("vec_id") =!= 1L), feats.filter(col("vec_id") === 1L), k = 2)
      .orderBy("rank").collect()
    assert(got.head.getAs[Long]("neighbor_id") == 2L)
    assert(math.abs(got.head.getAs[Double]("cos") - 1.0) < 1e-9)
    assert(got(1).getAs[Long]("neighbor_id") == 3L)
    assert(got(1).getAs[Double]("cos") < 1.0)
  }

  test("metaSummary never touches the data column (column pruning)") {
    val media = Multimodal.mediaFromDocuments(docsOf((0L, "y" * 600), (1L, "z" * 100)))
    val out = Multimodal.metaSummary(media).orderBy("media_id").collect()
    assert(out(0).getAs[Long]("n_bytes") == 600L)
    assert(out(0).getAs[Long]("n_frames") == 1L) // ceil(ceil(600/256)=3 /4)=1
    assert(out(1).getAs[Long]("n_frames") == 1L)
  }

  /** A second, unrelated codec implementation — proves the MediaCodec swap
    * point is real: the full pipeline (resize → features → frames) runs
    * under it with zero changes to the Spark plumbing. Features are a
    * 4-dim [min, max, first, last] byte profile; "frames" split from the
    * END of the payload; "resize" truncates (prefix) instead of sampling. */
  private object AltCodec extends Multimodal.MediaCodec {
    override def featureDim: Int = 4
    override def decodeFeatures(data: Array[Byte]): Array[Float] =
      if (data.isEmpty) Array.fill(4)(0f)
      else Array(data.min.toFloat, data.max.toFloat,
        data.head.toFloat, data.last.toFloat)
    override def sampleFrames(data: Array[Byte], frameBytes: Int,
        stride: Int): Seq[Array[Byte]] =
      data.reverse.grouped(frameBytes).zipWithIndex
        .collect { case (c, i) if i % stride == 0 => c.reverse }.toSeq
    override def resize(data: Array[Byte], targetBytes: Int): Array[Byte] =
      data.take(targetBytes)
  }

  test("codec seam: the pipeline runs identically-shaped under a swapped codec") {
    val media = Multimodal.asMedia(Multimodal.mediaFromDocuments(
      docsOf((0L, "abca" * 400), (1L, "zq"))))
    // resize honors the alternative policy (prefix truncation)
    val resized = Multimodal.resize(media, targetBytes = 100, codec = AltCodec)
    val r0 = resized.collect().find(_.media_id == 0L).get
    assert(r0.data.length == 100 &&
      r0.data.sameElements(("abca" * 25).getBytes("UTF-8")))
    // features carry the alt codec's dimension and values
    val f = Multimodal.extractFeatures(resized, codec = AltCodec)
      .collect().map(x => x.media_id -> x).toMap
    assert(f(0L).features.length == AltCodec.featureDim)
    assert(f(1L).features.sameElements(
      Array('q'.toFloat, 'z'.toFloat, 'z'.toFloat, 'q'.toFloat)))
    // frames split from the payload END: 100 bytes -> frames of 36+64
    // under frameBytes=64 (tail-aligned), stride 1 keeps both
    val frames = Multimodal.sampleFrames(resized, frameBytes = 64,
      stride = 1, codec = AltCodec)
      .collect().filter(_.getAs[Long]("media_id") == 0L)
      .sortBy(_.getAs[Int]("frame_idx"))
    assert(frames.length == 2)
    assert(frames(0).getAs[Array[Byte]]("frame").length == 64)
    assert(frames(1).getAs[Array[Byte]]("frame").length == 36)
    // and the stub path still runs unchanged next to it (both codecs green)
    val stub = Multimodal.extractFeatures(media).collect()
    assert(stub.forall(_.features.length == Multimodal.StubCodec.FeatureDim))
  }

  test("audio fingerprint is a content hash: byte-diverse containers, same samples, one cluster") {
    val s = spark
    import s.implicits._
    // same PCM stream under three different LIST paddings, plus one
    // different stream and one undecodable row
    val rows = Seq(
      (1L, Multimodal.synthWav(1, 8000, 16, 100, junkLen = 0)),
      (2L, Multimodal.synthWav(1, 8000, 16, 100, junkLen = 9)),
      (3L, Multimodal.synthWav(1, 8000, 16, 100, junkLen = 20)),
      (4L, Multimodal.synthWav(2, 8000, 8, 100)),
      (5L, "junk".getBytes("UTF-8"))).toDF("media_id", "data")
    assert(rows.collect().map(r => r.getAs[Array[Byte]]("data").length)
      .distinct.length >= 3, "containers should differ bytewise")
    val fp = Multimodal.audioFingerprint(rows).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("channels"), r.getAs[Long]("fp_hi"),
          r.getAs[Long]("fp_lo"))).toMap
    assert(fp(1L) == fp(2L) && fp(2L) == fp(3L),
      "same samples must fingerprint identically through any container")
    assert(fp(1L) != fp(4L), "different streams must not collide")
    assert(fp(5L)._1 == -1L)
    val clusters = Multimodal.audioDupClusters(
      Multimodal.audioFingerprint(rows)).collect()
      .map(r => (r.getAs[Long]("n_media"), r.getAs[Long]("min_media"),
        r.getAs[Long]("max_media"))).toSet
    assert(clusters == Set((3L, 1L, 3L), (1L, 4L, 4L)))
  }
}
