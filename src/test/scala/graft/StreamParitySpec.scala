package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Relational
import graft.streaming.{StreamDrift, StreamVocabGrowth}
import graft.streaming.StreamDrift.ValueEvent
import graft.streaming.StreamVocabGrowth.TokenEvent

/** Pins the streaming/batch parity claims both monitors document:
  *
  *  - [[StreamDrift]]: "a backfilled batch run over the same windows
  *    reproduces the streamed values exactly" — the streamed `psi` must
  *    equal the batch [[Relational.psiDrift]] integer statistic
  *    `Σ_band delta_num·dbits / (t1·t2)` computed over the SAME
  *    (reference, window) value split, exact double for exact double.
  *  - [[StreamVocabGrowth]]: a batch replay of the md5 bitmap over the
  *    same arrival order reproduces every report field exactly (the
  *    collision undercount is deterministic, not incidental).
  *
  * Both properties run over ScalaCheck-generated random streams. To keep
  * runtime bounded, the generated streams ride ONE streaming query each:
  * every sample becomes its own part key (parts are independent state in
  * both monitors), so 24 random streams cost one MemoryStream run, not
  * 24. The batch sides replay per part — psiDrift as one tiny batch plan
  * per (part, window), the vocab bitmap as an independent in-spec
  * reimplementation (md5 → low 17 bits), so a hashing drift in either
  * implementation fails the spec. */
class StreamParitySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("StreamDrift psi == batch psiDrift integer statistic per window (random streams)") {
    val s = spark
    import s.implicits._
    // per part: 2-4 windows of 1-12 integer values in [0, 60); window 0
    // is the reference. bandMicro 5e6 over value·1e6 == bandWidth 5e6
    // over valueMicro, and bands stay far below StreamDrift's clamp.
    val genWindows: Gen[List[List[Long]]] = for {
      nw <- Gen.choose(2, 4)
      ws <- Gen.listOfN(nw, for {
        n <- Gen.choose(1, 12)
        vs <- Gen.listOfN(n, Gen.choose(0L, 59L))
      } yield vs)
    } yield ws
    val streams: Seq[(String, List[List[Long]])] =
      (0 until 12).map(i => s"p$i" -> sample(genWindows, 1300L + i))

    val input = MemoryStream[ValueEvent](s)
    val q = StreamDrift.detect(input.toDS(), windowMinutes = 1L,
      bandWidth = 5000000L)
      .writeStream.format("memory").queryName("drift_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      streams.foreach { case (part, ws) =>
        ws.zipWithIndex.foreach { case (vs, w) =>
          input.addData(vs.map(v => ValueEvent(part, w.toLong, v * 1000000L)): _*)
        }
        // opener row closes the last real window (its own report never
        // emits — matches the batch comparison below, which stops at the
        // last CLOSED window)
        input.addData(ValueEvent(part, ws.length.toLong, 0L))
      }
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT part, window, psi FROM drift_parity")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
        .toMap

      val day = 86400000L
      var compared = 0
      streams.foreach { case (part, ws) =>
        val ref = ws.head
        (1 until ws.length).foreach { w =>
          // batch replay of this (reference, window) split: reference
          // values on day 0, window values on day 1, splitDay = 1
          val ev = (ref.map(v => (v.toDouble, 1000L)) ++
            ws(w).map(v => (v.toDouble, day + 1000L)))
            .toDF("value", "ms")
            .withColumn("ts", timestamp_millis($"ms")).drop("ms")
          val bands = Relational.psiDrift(ev, splitDay = 1L).collect()
          val t1 = ref.length.toLong
          val t2 = ws(w).length.toLong
          val num = bands.map(r =>
            r.getAs[Long]("delta_num") * r.getAs[Long]("dbits")).sum
          val expect = num.toDouble / (t1.toDouble * t2.toDouble)
          assert(streamed((part, w.toLong)) == expect,
            s"$part window $w: streamed ${streamed((part, w.toLong))} != batch $expect")
          compared += 1
        }
      }
      assert(compared >= 12, s"degenerate property run: only $compared windows")
    } finally q.stop()
  }

  test("StreamVocabGrowth reports == batch bitmap replay (random streams)") {
    val s = spark
    import s.implicits._
    // token pools overlap across windows so "new type" is non-trivial;
    // duplicates within a window exercise the within-window dedup
    val genWindows: Gen[List[List[String]]] = for {
      nw <- Gen.choose(2, 4)
      ws <- Gen.listOfN(nw, for {
        n <- Gen.choose(1, 15)
        ts <- Gen.listOfN(n, Gen.choose(0, 40).map(i => s"tok$i"))
      } yield ts)
    } yield ws
    val streams: Seq[(String, List[List[String]])] =
      (0 until 24).map(i => s"p$i" -> sample(genWindows, 2600L + i))

    val bitsLog2 = 12 // small bitmap so collisions actually occur
    val input = MemoryStream[TokenEvent](s)
    val q = StreamVocabGrowth.detect(input.toDS(), windowMinutes = 1L,
      bitsLog2 = bitsLog2)
      .writeStream.format("memory").queryName("vocab_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      streams.foreach { case (part, ws) =>
        ws.zipWithIndex.foreach { case (ts, w) =>
          input.addData(ts.map(t => TokenEvent(part, w.toLong, t)): _*)
        }
        input.addData(TokenEvent(part, ws.length.toLong, "opener"))
      }
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT part, window, tokens, new_types, bits_set FROM vocab_parity")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap

      // independent reimplementation of the bitmap (md5 first 8 bytes,
      // low bitsLog2 bits) — NOT a call into the operator
      def bit(token: String): Int = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(token.getBytes("UTF-8"))
        var acc = 0L
        var i = 0
        while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
        ((acc & Long.MaxValue) % (1L << bitsLog2)).toInt
      }
      streams.foreach { case (part, ws) =>
        val seen = scala.collection.mutable.BitSet.empty
        var bitsSet = 0L
        ws.zipWithIndex.foreach { case (ts, w) =>
          var winNew = 0L
          ts.foreach { t =>
            val b = bit(t)
            if (!seen.contains(b)) { seen += b; bitsSet += 1; winNew += 1 }
          }
          assert(streamed((part, w.toLong)) == ((ts.length.toLong, winNew, bitsSet)),
            s"$part window $w: ${streamed((part, w.toLong))} != " +
              s"(${ts.length}, $winNew, $bitsSet)")
        }
      }
    } finally q.stop()
  }
}
