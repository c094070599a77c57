package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: split q_store_roundtrip's cost into its phases
  * (`runMain graft.tools.StoreProbe <sfDir>`).
  *
  * Round-5 findings at sf0.1 (600k rows, ~1,200 bucket files): flat
  * 32-file write ~0.5 s; partitioned append 8-11 s (file-count × FS
  * bound — ~6 ms/file of writer init + commit renames); metadata
  * read-back ~2 s. Committer algorithm v2 and parquet.block.size
  * (8/32 MB) moved nothing beyond run-to-run noise, so the append path
  * keeps Spark defaults; the cost scales with files-per-batch, which the
  * single-writer-per-bucket repartition already minimizes. */
object StoreProbe {
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val sd = graft.sources.Tables.streamData(spark, sfDir)
    t("materialize-input") { sd.write.format("noop").mode("overwrite").save() }
    val cached = sd.cache(); cached.count()
    val base = System.getProperty("java.io.tmpdir") + "/graft_probe"
    def wipe(p: String) = {
      val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    }
    (1 to 2).foreach { i =>
      wipe(s"$base/flat")
      t(s"flat-write-nopartition-$i") { cached.write.parquet(s"$base/flat") }
      wipe(s"$base/store")
      t(s"partitioned-append-$i") { graft.store.MessageStore.append(cached, s"$base/store") }
      t(s"metadata-readback-$i") {
        graft.operators.BrokerQueries.metadata(
          graft.store.MessageStore.open(spark, s"$base/store")).collect()
      }
    }
    wipe(s"$base/flat"); wipe(s"$base/store")
    spark.stop()
  }
}
