package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.KllSketch
import graft.streaming.StreamQuantile
import graft.streaming.StreamQuantile.Obs

class StreamQuantileSpec extends SparkSpec {

  test("uncompacted regime is exact; snapshots match a batch fold of the same prefix") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Obs](s)
    val q = StreamQuantile.quantiles(input.toDS(), k = 200)
      .writeStream.format("memory").queryName("sq")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1 to 100).map(i => Obs("g", i.toLong, i.toDouble)): _*)
      q.processAllAvailable()
      val r1 = spark.sql("SELECT * FROM sq WHERE n = 100").collect().head
      // 100 items fit level 0 of a k=200 sketch: nearest-rank EXACT
      assert(r1.getAs[Double]("p50") == 50.0)
      assert(r1.getAs[Double]("p90") == 90.0)
      assert(r1.getAs[Double]("p99") == 99.0)
      // second batch shifts the distribution; snapshot must equal the
      // same sequential fold done locally (shared sketch implementation)
      input.addData((101 to 150).map(i => Obs("g", i.toLong, 1000.0 + i)): _*)
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM sq WHERE n = 150").collect().head
      val ref = new KllSketch(200)
      (1 to 100).foreach(i => ref.insert(i.toDouble))
      (101 to 150).foreach(i => ref.insert(1000.0 + i))
      assert(r2.getAs[Double]("p50") == ref.quantile(0.5))
      assert(r2.getAs[Double]("p99") == ref.quantile(0.99))
    } finally q.stop()
  }

  test("state stays sketch-bounded under volume; groups are independent") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Obs](s)
    val q = StreamQuantile.quantiles(input.toDS(), k = 16)
      .writeStream.format("memory").queryName("sqb")
      .outputMode(OutputMode.Append()).start()
    try {
      (0 until 4).foreach { b =>
        input.addData((0 until 500).map(i =>
          Obs("big", (b * 500 + i).toLong, (b * 500 + i).toDouble)): _*)
        input.addData(Obs("tiny", b.toLong, 7.0))
        q.processAllAvailable()
      }
      val big = spark.sql("SELECT * FROM sqb WHERE `group` = 'big' AND n = 2000")
        .collect().head
      // 2000 inserts into a k=16 sketch retain far fewer items than n
      assert(big.getAs[Int]("retained") < 200,
        s"retained ${big.getAs[Int]("retained")} not sketch-bounded")
      // rank error stays within the deterministic-KLL band: true p50 = 1000
      assert(math.abs(big.getAs[Double]("p50") - 1000.0) < 250.0)
      val tiny = spark.sql("SELECT * FROM sqb WHERE `group` = 'tiny' AND n = 4")
        .collect().head
      assert(tiny.getAs[Double]("p50") == 7.0 && tiny.getAs[Double]("p99") == 7.0)
    } finally q.stop()
  }

  test("restart from checkpoint recovers the sketch state") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-sq-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sq-out").toString
    val input = MemoryStream[Obs](s)
    def start() = StreamQuantile.quantiles(input.toDS(), k = 200)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData((1 to 50).map(i => Obs("g", i.toLong, i.toDouble)): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // data arriving while the query is down must fold into RECOVERED
    // state — a reset sketch would report n = 50, not 100
    input.addData((51 to 100).map(i => Obs("g", i.toLong, i.toDouble)): _*)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).orderBy("n").collect()
      assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(50L, 100L))
      // still in the exact regime: the recovered-state p-values are exact
      assert(rows.last.getAs[Double]("p50") == 50.0)
      assert(rows.last.getAs[Double]("p99") == 99.0)
    } finally q2.stop()
  }
}
