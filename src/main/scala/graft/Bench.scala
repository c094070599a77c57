package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay session/JIT/codegen startup once instead of
    // attributing it to whichever query happens to run first, and touch
    // every input table so no timed query absorbs the first cold read of
    // a parquet file (r2 showed the alphabetically-first reader of
    // lineitem eating the page-cache load as a phantom regression)
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet")
          .write.format("noop").mode("overwrite").save())
      SparkEntry.queries.get("q_last_n")
        .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    } catch { case _: Throwable => () }
    // noop v2 sink: executes the full plan (all columns materialized, sorts
    // retained) without count()'s column pruning / sort elimination.
    // stable alphabetical execution order: map-hash order shuffled which
    // query followed the heavy store write, making attribution noisy.
    // each query runs twice and reports the min — the first execution of a
    // plan pays its whole-stage-codegen JIT, which is compile-once cost,
    // not per-query cost, and dominated run-to-run variance at sf0.1
    // contention canary: a fixed, data-independent workload (range-sum of
    // 200M longs across all cores) whose clean min-of-3 on this machine
    // class is ~0.2s. Machine contention — the cause of two rounds of
    // ~3x-inflated official records — inflates it the same way it inflates
    // the real queries, so a canary far outside its band marks the whole
    // record as untrustworthy. Measured before AND after the sweep: either
    // end contended taints the record.
    def canarySec(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val canaryExpected =
      sys.env.getOrElse("SPARK_GRAFT_CANARY_SEC", "0.25").toDouble
    val canaryBefore = canarySec()
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); None }
      }
      val ok = times.flatten
      // -1 sentinel keeps failures visible in the metrics JSON; "first" is
      // -1 unless run 1 itself succeeded (a warm run must not masquerade
      // as the cold-start time)
      name -> (if (ok.nonEmpty) (ok.min, times.head.getOrElse(-1.0)) else (-1.0, -1.0))
    }
    def obj(sel: ((Double, Double)) => Double) = results
      .map { case (k, v) => s"\"" + k + "\":" + sel(v) }.mkString("{", ",", "}")
    // the driver captures only a ~2 KB tail of stdout (BENCH_r05 and r06
    // both came back parsed:null because the printed line outgrew it), so
    // stdout gets the minimal record — min-of-runs per query, rounded to
    // ms — and the full-precision record with first-run times goes to the
    // file, which cannot be cut mid-line
    def ms(v: Double) = if (v < 0) -1.0 else math.rint(v * 1000) / 1000
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val canaryAfter = canarySec()
    val canaryWorst = math.max(canaryBefore, canaryAfter)
    val contended = canaryWorst > 3 * canaryExpected
    val canaryJson =
      s""""canary_sec":${ms(canaryWorst)},"canary_expected":$canaryExpected,"contended":$contended"""
    // headline stays min-of-runs (first run pays compile-once codegen JIT)
    val compact =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":${obj(v => ms(v._1))},"sf":"$sfDir","runs":$runs,"agg":"min",$canaryJson}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(_._1)},"first":${obj(_._2)},"sf":"$sfDir","runs":$runs,"agg":"min",$canaryJson}"""
    println(compact)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, full.getBytes("UTF-8"))
    spark.stop()
  }
}
