package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Dev utility: dump the formatted plans of BOTH uncapped
  * ngram-Jaccard-verifier shapes (classic sizes-join vs size-ratio
  * prefiltered — [[graft.dedup.Dedup.ngramJaccardPairsImpl]]) over the
  * documents corpus at the crawl chain's threshold 0.5. The crawl
  * queries land their curation chain through eager localCheckpoints, so
  * their query-level plan dumps truncate this subtree — this tool is the
  * committed plan evidence for the shape choice. Usage:
  * `runMain graft.tools.JaccardShapeDump <sfDir> <outDir>` */
object JaccardShapeDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    Seq("before" -> false, "after" -> true).foreach { case (suffix, pre) =>
      val df = graft.dedup.Dedup.ngramJaccardPairsImpl(
        docs, k = 3, threshold = 0.5, maxDocFrequency = None,
        prefilter = pre)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.writeString(
        Paths.get(s"$outDir/crawl_jaccard_verifier_$suffix.txt"), txt)
      println(s"[jaccardshape] $suffix (${txt.length} chars)")
    }
    spark.stop()
  }
}
