package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamHeavyHitters
import graft.streaming.StreamHeavyHitters.Item

class StreamHeavyHittersSpec extends SparkSpec {

  test("MG invariants across micro-batches: est <= true <= est + max_err; frequent items survive") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Item](s)
    val q = StreamHeavyHitters.heavyHitters(input.toDS(), k = 4)
      .writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a=5, b=3, c=1 — fits in k-1=3 counters, exact
      input.addData(
        (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).map(Item("g", _)): _*)
      q.processAllAvailable()
      val snap1 = spark.sql(
        "SELECT item, est, max_err FROM hh WHERE processed = 9")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(snap1 == Map("a" -> (5L, 0L), "b" -> (3L, 0L), "c" -> (1L, 0L)))
      // batch 2: 8 distinct one-off items force decrement rounds; the
      // dominant 'a' (true 5+6=11 > 27/4) must survive with est in band
      input.addData(
        (Seq.fill(6)("a") ++ (1 to 8).map(i => s"x$i") ++ Seq.fill(4)("b"))
          .map(Item("g", _)): _*)
      q.processAllAvailable()
      val snap2 = spark.sql(
        "SELECT item, est, max_err FROM hh WHERE processed = 27")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(snap2.contains("a"), s"dominant item evicted: $snap2")
      val (estA, err) = snap2("a")
      assert(estA <= 11L && estA + err >= 11L, s"a: est=$estA err=$err true=11")
      val (estB, _) = snap2.getOrElse("b", (0L, 0L))
      assert(estB <= 7L, s"b overestimated: $estB")
      // error bound: decrement rounds <= processed / k
      assert(err <= 27L / 4L, s"err=$err exceeds n/k")
    } finally q.stop()
  }

  test("groups keep independent state") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Item](s)
    val q = StreamHeavyHitters.heavyHitters(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("hh2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Item("g1", "a"), Item("g1", "a"), Item("g2", "z"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT group, item, est FROM hh2")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(("g1", "a", 2L), ("g2", "z", 1L)))
    } finally q.stop()
  }

  test("restart from checkpoint: counters and error bound survive") {
    val s = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("graft-hh-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-hh-out").toString
    val input = MemoryStream[Item](s)
    def start() = StreamHeavyHitters.heavyHitters(input.toDS(), k = 3)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData(Seq.fill(4)(Item("g", "a")) ++ Seq(Item("g", "b")): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      input.addData(Item("g", "a"))
      q2.processAllAvailable()
    } finally q2.stop()
    val last = spark.read.parquet(out)
      .where("processed = 6 AND item = 'a'").collect()
    assert(last.length == 1 && last.head.getAs[Long]("est") == 5L,
      "state lost across restart")
  }
}
