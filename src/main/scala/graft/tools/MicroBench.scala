package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: micro-time individual expressions over the documents table
  * to localize hot spots (`runMain graft.tools.MicroBench <sfDir>`). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32).cache()
    docs.count()

    def time(name: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val toks = split(col("text"), " ")
    time("baseline-project")(docs.select(col("doc_id"), length(col("text"))))
    time("split-size")(docs.select(size(toks)))
    time("regexp_count-bpe")(docs.select(regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))))
    time("regexp_count-punct")(docs.select(regexp_count(col("text"), lit("[^A-Za-z0-9 ]"))))
    time("replace-len")(docs.select(length(regexp_replace(col("text"), " ", ""))))
    time("stopword-filter")(docs.select(size(filter(toks, t => t.isInCollection(Seq("the", "a", "of", "and", "to", "in", "is"))))))
    time("full-stats")(graft.text.TextAnalysis.stats(docs))
    spark.stop()
  }
}
