package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: time the internal stages of the heavy composed queries
  * (crawl pipeline, corpus→shards, store roundtrip) to localize where the
  * seconds go before optimizing (`runMain graft.tools.StageProbe <sfDir>`).
  * Mirrors the SparkEntry wiring; NOT a gate — evidence only. */
object StageProbe {
  private val ProbeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "r", "the" -> "r")
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup
    import graft.text.TextAnalysis

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- crawlCurated stages (mirrors SparkEntry.crawlCurated) ----
    def parseStage(): DataFrame =
      graft.multimodal.Multimodal.crawlTable(docs)
        .select(posexplode(graft.functions.GzipMembers.gzip_members(col("data")))
          .as(Seq("mi", "m")))
        .select(element_at(
          graft.functions.WarcRecords.warc_payloads(col("m")), 1).as("hp"))
        .select(col("hp"),
          graft.functions.HttpHead.http_head(col("hp")).as("h"))
        .select(graft.functions.HtmlText.html_text(
          expr("substring(hp, CAST(h.body_offset AS INT) + 1, 2147483647)")).as("t"))
        .select(expr("CAST(substring(t.title, 5) AS BIGINT)").as("doc_id"),
          col("t.body").as("text"))

    (1 to 2).foreach { r =>
      println(s"== crawl round $r ==")
      val parsed = time("parse+checkpoint")(parseStage().localCheckpoint(true))
      val exact = time("exactDedup")({ val e = Dedup.exactDedup(parsed); noop(e); e })
      val losers = time("ngramJaccardPairs")({
        val l = Dedup.ngramJaccardPairs(exact, k = 3, threshold = 0.5)
          .select(col("doc_b").as("doc_id")).distinct(); noop(l); l })
      val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
      val quality = time("gopher+join")({
        val q = deduped.join(
          TextAnalysis.gopherQuality(deduped)
            .filter(col("passes_gopher") === 1).select(col("doc_id")),
          Seq("doc_id"), "left_semi"); noop(q); q })
      val curated = graft.operators.Sampling.splitAssign(quality, col("doc_id"),
        Seq("train" -> 8, "val" -> 1, "test" -> 1))
        .select(col("doc_id"), col("text"), col("split"))
      time("splitAssign+noop")(noop(curated))
      val train = time("train checkpoint")(
        curated.filter(col("split") === "train")
          .select(col("doc_id"), col("text")).localCheckpoint(true))
      val enc = time("bpe encode+checkpoint")(
        graft.text.Bpe.encode(train, ProbeMerges).localCheckpoint(true))
      val pa = graft.operators.Packing.paddingApply(enc,
        buckets = 8,
        budget = 16384L,
        tokens = col("n_subwords"))
      val sb = graft.operators.Packing.shardBalance(enc,
        shards = 5, tokens = col("n_subwords"))
      val payload = enc
        .join(pa.select(col("doc_id"), col("bucket"), col("batch")), "doc_id")
        .join(sb.select(col("doc_id"), col("shard")), "doc_id")
        .select(col("shard"), col("doc_id").as("order"),
          encode(concat_ws("|", col("doc_id"), col("bucket"),
            coalesce(col("batch"), lit(-1L)), col("encoded")), "UTF-8")
            .as("payload"))
      time("pad+balance+emit")(noop(
        graft.multimodal.ShardWriter.emitTfRecordShards(payload)))
    }

    // ---- store roundtrip halves ----
    (1 to 2).foreach { r =>
      println(s"== store round $r ==")
      val sd = graft.sources.Tables.streamData(spark, sfDir)
      val path = java.nio.file.Files.createTempDirectory("graft-probe-store").toString
      time("append")(graft.store.MessageStore.append(sd, path))
      time("open+metadata")(noop(
        graft.operators.BrokerQueries.metadata(
          graft.store.MessageStore.open(spark, path))
          .orderBy(col("stream_id"), col("stream_partition"))))
      time("open+metadata 2nd")(noop(
        graft.operators.BrokerQueries.metadata(
          graft.store.MessageStore.open(spark, path))
          .orderBy(col("stream_id"), col("stream_partition"))))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
    spark.stop()
  }
}
