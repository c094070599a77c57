package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: core-count scaling spot-run of the heaviest queries on a
  * `factor`-times-enlarged synthetic corpus — the r18 verdict's missing
  * evidence (at sf0.1 every query sits near the scheduler floor, so
  * 8-core vs 32-core wall times cannot certify parallelism).
  *
  * MEASUREMENT ONLY, never a gate: the scaled tables are synthetic
  * clones (documents get a per-clone token appended so exact-dedup does
  * not collapse them — which makes the clone groups mutual NEAR-dups, a
  * stress shape for the pair fan-out, disclosed in the committed
  * record; events get shifted ids/users and a per-clone +61-day ts
  * shift so stream-store bucket count and gapfill span scale too).
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.ScaleProbe <sfDir> <factor> <q>...
  * Prints one JSON line per run: {"cpus":N,"factor":F,"queries":{...}}.
  * The scaled tables are built once under /tmp and reused across the
  * 8- and 32-core invocations (identical bytes — the ratio is the
  * point). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaled = s"/tmp/graft_scale_${new java.io.File(sfDir).getName}_x$factor"
    val fs = new org.apache.hadoop.fs.Path(scaled)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$scaled/_READY"))) {
      fs.delete(new org.apache.hadoop.fs.Path(scaled), true)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val clonesD = (0 until factor).map { c =>
        docs.select(
          (col("doc_id") + lit(c.toLong * (1L << 45))).as("doc_id"),
          (if (c == 0) col("text")
           else concat(col("text"), lit(s" xz$c"))).as("text"),
          col("lang"), col("source"),
          (col("n_chars") + lit(if (c == 0) 0L else s" xz$c".length.toLong))
            .as("n_chars"))
      }.reduce(_ unionByName _)
      clonesD.repartition(8).write.mode("overwrite")
        .parquet(s"$scaled/documents.parquet")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val clonesE = (0 until factor).map { c =>
        ev.select(
          (col("event_id") + lit(c.toLong * (1L << 45))).as("event_id"),
          (col("ts") + expr(s"INTERVAL ${c * 61} DAYS")).as("ts"),
          (col("user_id") + lit(c.toLong * 1000000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
      clonesE.repartition(8).write.mode("overwrite")
        .parquet(s"$scaled/events.parquet")
      // the remaining tables are read by warmups/other queries only —
      // symlink-copy them unscaled so the sfDir contract holds
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "embeddings").foreach { t =>
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new org.apache.hadoop.fs.Path(s"$sfDir/$t.parquet"),
          fs, new org.apache.hadoop.fs.Path(s"$scaled/$t.parquet"),
          false, spark.sparkContext.hadoopConfiguration)
      }
      fs.create(new org.apache.hadoop.fs.Path(s"$scaled/_READY"), true).close()
      println(s"[scaleprobe] built $scaled")
    }
    Seq("documents", "events").foreach(t => spark.read
      .parquet(s"$scaled/$t.parquet")
      .write.format("noop").mode("overwrite").save())
    val times = names.map { n =>
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, scaled)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[scaleprobe] $n $t%.2f s")
      n -> t
    }
    println(s"""{"cpus":$cpus,"factor":$factor,"queries":{${
      times.map { case (n, t) => s"\"$n\":${math.rint(t * 100) / 100}" }
        .mkString(",")}}}""")
    spark.stop()
  }
}
