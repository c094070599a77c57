package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    // SPARK_GRAFT_SHUFFLE overrides shuffle parallelism — used for the
    // cluster-shape check (e.g. 256 partitions, the shape a ~64-executor
    // cluster would run) without touching the official bench config
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // SPARK_GRAFT_EVENTLOG=<dir>: write Spark event logs for stage-level
      // attribution (parsed offline — the UI stays off)
      .config("spark.eventLog.enabled",
        sys.env.contains("SPARK_GRAFT_EVENTLOG").toString)
      .config("spark.eventLog.compress", "false")
      .config("spark.eventLog.dir",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "/tmp"))
      // SPARK_GRAFT_RAWFS=1: probe the cost of Hadoop ChecksumFileSystem
      // crc sidecars on file:// writes (measurement aid, not the bench)
      .config("spark.hadoop.fs.file.impl",
        if (sys.env.contains("SPARK_GRAFT_RAWFS"))
          "org.apache.hadoop.fs.RawLocalFileSystem"
        else "org.apache.hadoop.fs.LocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm docs
    spark.read.parquet(s"$sfDir/documents.parquet").write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$n run$run ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
