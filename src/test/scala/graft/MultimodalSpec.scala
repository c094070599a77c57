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
}
