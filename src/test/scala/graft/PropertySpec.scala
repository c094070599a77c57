package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed, Proved}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Md5Partition
import graft.model.StreamMessage
import graft.operators.BrokerQueries
import graft.operators.BrokerQueries.MsgRef

/** Property tests (SURVEY §5): partitioner range, ordering invariants,
  * and query-algebra relations over randomized message sets. Small
  * deterministic-seed corpora per property — each case spins real Spark
  * plans, so counts stay modest. */
class PropertySpec extends SparkSpec {

  private val params = Parameters.default
    .withMinSuccessfulTests(30)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("partitioner: result always in [0, n) and total over long strings") {
    holds(Prop.forAll(Gen.asciiPrintableStr, Gen.choose(1, 100)) { (key, n) =>
      val p = Md5Partition.partition(UTF8String.fromString(key), n)
      p >= 0 && p < n
    })
  }

  private val genMsgs: Gen[List[StreamMessage]] = for {
    n <- Gen.choose(0, 25)
    msgs <- Gen.listOfN(n, for {
      ts <- Gen.choose(0L, 5000L)
      seq <- Gen.choose(0, 3)
      pub <- Gen.oneOf("p1", "p2")
    } yield msg("s", 0, ts * 1000L, seq, pub))
  } yield msgs.distinct

  test("requestLast: ascending output, correct size, suffix of the ordered set") {
    holds(Prop.forAll(genMsgs, Gen.choose(0, 30)) { (msgs, limit) =>
      val sorted = msgs.map(m =>
        (m.ts.toInstant(java.time.ZoneOffset.UTC).toEpochMilli, m.sequence_no,
          m.publisher_id, m.msg_chain_id)).sorted
      val got = keysOf(BrokerQueries.requestLast(streamDataOf(msgs: _*), "s", 0, limit))
      got == sorted.takeRight(math.min(limit, msgs.size))
    })
  }

  test("assignment diff: partitions both sets; update applies its own delta") {
    import graft.streaming.DynamicAssignment
    val genSet = Gen.containerOf[Set, String](Gen.oneOf("a", "b", "c", "d", "e"))
    holds(Prop.forAll(genSet, genSet) { (before, after) =>
      val (added, removed) = DynamicAssignment.diff(Some(before), Some(after))
      added == (after -- before) && removed == (before -- after) &&
        (before -- removed) ++ added == after &&  // applying the delta lands on `after`
        (added & removed).isEmpty
    })
    holds(Prop.forAll(genSet) { s =>
      val d = new DynamicAssignment(Some(s))
      val (add1, rem1) = d.update(None) // scope up to universal
      val (add2, rem2) = d.update(Some(s)) // and back down
      d.get().contains(s) && add1.isEmpty && rem1.isEmpty &&
        add2.isEmpty && rem2.isEmpty
    })
  }

  test("capped Jaccard with a non-binding cap equals the exact self-join path") {
    import graft.dedup.Dedup
    val s = spark
    import s.implicits._
    // random word-soup corpora over a tiny vocabulary force shared shingles
    val genDocs: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(2, 10)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(3, 12)
        words <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      } yield words.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val cappedParams = params.withMinSuccessfulTests(10) // real Spark jobs per case
    val r = check(cappedParams, Prop.forAll(genDocs) { docs =>
      val df = docs.toDF("doc_id", "text")
      def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          math.round(r.getDouble(4) * 1e12))).sortBy(t => (t._1, t._2)).toSeq
      // cap larger than any possible df => identical semantics, distinct plans
      val capped = key(Dedup.ngramJaccardPairs(df, 3, 0.0, Some(1000)).collect())
      val exact = key(Dedup.ngramJaccardPairs(df, 3, 0.0, None).collect())
      capped == exact
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("prefix-filtered join equals the brute-force shared-shingle join (prefix lemma)") {
    import graft.dedup.Dedup
    val s = spark
    import s.implicits._
    // word soup over a tiny vocabulary maximizes shared shingles and ties
    // in the (df, tok) canonical order — the stress case for the lemma
    val genCase: Gen[(List[(Long, String)], Double)] = for {
      n <- Gen.choose(2, 10)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(3, 12)
        words <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      } yield words.mkString(" "))
      t <- Gen.oneOf(0.1, 0.3, 0.5, 0.8, 1.0)
    } yield (docs.zipWithIndex.map { case (x, i) => (i.toLong, x) }, t)
    val p = params.withMinSuccessfulTests(10) // real Spark jobs per case
    val r = check(p, Prop.forAll(genCase) { case (docs, t) =>
      val df = docs.toDF("doc_id", "text")
      def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          math.round(r.getDouble(4) * 1e12))).sortBy(x => (x._1, x._2)).toSeq
      val filtered = key(Dedup.prefixFilterPairs(df, t, 3).collect())
      val brute = key(Dedup.ngramJaccardPairs(df, 3, t, None).collect())
      filtered == brute
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("q-gram edit join equals brute-force levenshtein on eligible strings") {
    import graft.dedup.Dedup
    val s = spark
    import s.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // small alphabet + shared stems force hot grams, near-dups, and ties;
    // maxDist=2/q=2 -> eligibility needs > 4 distinct grams. The
    // rare-char substitutions cover the case a distinct-gram-COUNT
    // candidate filter gets wrong: 2 edits on repetitive text create up
    // to 2q=4 brand-new distinct grams (|Δng| > maxDist) while the pair
    // stays within maxDist edits — only the length filter is sound there.
    val genDocs: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(2, 8)
      docs <- Gen.listOfN(n, for {
        stem <- Gen.oneOf("abcdeabcde", "abcdefghij", "aabbccddee",
          "abcabcabxy")
        k <- Gen.choose(0, 2)
        pos <- Gen.listOfN(k, Gen.choose(0, 9))
        ch <- Gen.listOfN(k, Gen.oneOf('x', 'y', 'z'))
      } yield {
        val sb = stem.toArray
        pos.zip(ch).foreach { case (p, c) => sb(p) = c }
        new String(sb)
      })
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val p = params.withMinSuccessfulTests(10)
    val r = check(p, Prop.forAll(genDocs) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.qgramEditPairs(df, maxDist = 2, q = 2, prefixLen = 160)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      def grams(t: String) = t.sliding(2).toSet
      val eligible = docs.filter { case (_, t) => grams(t).size > 4 }
      val want = (for {
        (ia, ta) <- eligible; (ib, tb) <- eligible if ia < ib
        d = lev(ta, tb) if d <= 2
      } yield (ia, ib, d.toLong)).sortBy(t => (t._1, t._2))
      got == want
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("packGreedy: every doc exactly once; offsets respect the budget") {
    import graft.operators.Packing
    val s = spark
    import s.implicits._
    val genCorpus: Gen[(List[(Long, String, String)], Int, Int)] = for {
      n <- Gen.choose(1, 30)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 12)
        words <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
        lang <- Gen.oneOf("en", "de")
      } yield (words.mkString(" "), lang))
      budget <- Gen.choose(1, 20)
      shards <- Gen.choose(1, 3)
    } yield (docs.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) },
      budget, shards)
    val packParams = params.withMinSuccessfulTests(10) // real Spark jobs
    val r = check(packParams, Prop.forAll(genCorpus) { case (docs, budget, shards) =>
      val out = Packing.packGreedy(
        docs.toDF("doc_id", "text", "lang"), budget, shards).collect()
      val byChain = out.groupBy(r =>
        (r.getAs[String]("stratum"), r.getAs[Long]("shard")))
      // conservation: every doc exactly once, no chain invents or drops
      out.map(_.getAs[Long]("doc_id")).sorted.toSeq ==
        docs.map(_._1).sorted &&
      byChain.values.forall { rows =>
        val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
        // replay the greedy fold: offsets/pack ids must match exactly,
        // and a pack never exceeds the budget unless a single doc does
        var pack = 0L; var fill = 0L; var ok = true
        sorted.foreach { r =>
          val n = r.getAs[Long]("n_tokens")
          if (fill > 0 && fill + n > budget) { pack += 1; fill = 0 }
          ok &&= r.getAs[Long]("pack_id") == pack &&
            r.getAs[Long]("pack_offset") == fill &&
            (fill == 0 || fill + n <= budget)
          fill += n
        }
        ok
      }
    })
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("ingestDedup: one deterministic winner (max payload) per uniqueness key") {
    val genReplayed: Gen[List[StreamMessage]] = for {
      base <- genMsgs
      // replay a prefix of the batch, sometimes with a mutated body
      replayed <- Gen.someOf(base)
      mutate <- Gen.oneOf(true, false)
    } yield base ++ replayed.map(m =>
      if (mutate) m.copy(payload = m.payload + "!") else m)
    holds(Prop.forAll(genReplayed) { msgs =>
      val got = graft.dedup.Dedup.ingestDedup(streamDataOf(msgs: _*))
        .collect().map(r => (
          (r.getAs[String]("stream_id"), r.getAs[Int]("stream_partition"),
            r.getAs[java.time.LocalDateTime]("ts"), r.getAs[Int]("sequence_no"),
            r.getAs[String]("publisher_id"), r.getAs[String]("msg_chain_id")),
          r.getAs[String]("payload"))).toMap
      val expect = msgs.groupBy(m =>
        (m.stream_id, m.stream_partition, m.ts, m.sequence_no,
          m.publisher_id, m.msg_chain_id))
        .view.mapValues(_.map(_.payload).max).toMap
      got == expect
    })
  }

  test("requestRange(from, to) == requestFrom(from) intersect toBound") {
    holds(Prop.forAll(genMsgs, Gen.choose(0L, 5000L), Gen.choose(0L, 5000L)) {
      (msgs, a, b) =>
        val (lo, hi) = (math.min(a, b) * 1000L, math.max(a, b) * 1000L)
        val sd = streamDataOf(msgs: _*)
        val fromRef = MsgRef(lo, 1)
        val toRef = MsgRef(hi, 2)
        val range = keysOf(BrokerQueries.requestRange(sd, "s", 0, fromRef, toRef))
        val fromOnly = keysOf(BrokerQueries.requestFrom(sd, "s", 0, fromRef))
        val expected = fromOnly.filter { case (ts, seq, _, _) =>
          ts < hi || (ts == hi && seq <= toRef.seq)
        }
        range == expected
    })
  }

  private val fewerCases = Parameters.default
    .withMinSuccessfulTests(12)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def holdsFewer(p: Prop): Unit = {
    val r = check(fewerCases, p)
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  test("asofBackward == brute-force latest-at-or-before on random events") {
    val s = spark
    import s.implicits._
    val genSide = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 12L)
    } yield (u, t)))
    holdsFewer(Prop.forAll(genSide, genSide) { (ls, rs) =>
      // distinct ids per side; rights offset so id spaces never collide
      val lefts = ls.zipWithIndex.map { case ((u, t), i) => (u, t, 100L + i, 0.0) }
      val rights = rs.zipWithIndex.map { case ((u, t), i) => (u, t, 900L + i, 1.0) }
      val got = graft.operators.AsofJoin.asofBackward(
        lefts.toDF("user_id", "tms", "event_id", "value"),
        rights.toDF("user_id", "tms", "purchase_id", "purchase_value"),
        keys = Seq("user_id"), ts = "tms",
        rightTie = "purchase_id", rightVals = Seq("purchase_id", "purchase_value"))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("purchase_id")).map(_.toLong)).toMap
      val expect = lefts.map { case (u, t, id, _) =>
        id -> rights.filter(r => r._1 == u && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      }.toMap
      got == expect
    })
  }

  test("dupSpans == brute-force duplicated-gram island merge on a tiny vocab") {
    val s = spark
    import s.implicits._
    val n = 3
    val genDocs = Gen.choose(2, 4).flatMap(d => Gen.listOfN(d,
      Gen.choose(0, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")))))
    holdsFewer(Prop.forAll(genDocs) { toks =>
      val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
      val grams = docs.flatMap { case (id, text) =>
        val t = text.split(" ").toSeq.filter(_.nonEmpty)
        (0 to t.size - n).map(p => (id, p.toLong, t.slice(p, p + n)))
      }
      val dupGrams = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      val expect = grams.filter(g => dupGrams(g._3)).groupBy(_._1).toSeq.flatMap {
        case (id, hs) =>
          val ps = hs.map(_._2).sorted
          // islands: break where pos > prev + n
          // merge while pos <= prevPos + n, i.e. new end e = p+n-1 <= e0+n;
          // with e0 = prevPos+n-1 that is exactly p <= e0 + 1
          val spans = ps.foldLeft(List.empty[(Long, Long)]) {
            case (acc, p) => acc match {
              case (s0, e0) :: rest if p <= e0 + 1 => (s0, p + n - 1) :: rest
              case _ => (p, p + n - 1) :: acc
            }
          }
          spans.map { case (st, en) => (id, st, en, en - st + 1) }
      }.toSet
      val got = graft.dedup.Dedup.dupSpans(docs.toDF("doc_id", "text"), n = n)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == expect
    })
  }

  test("lmBits == in-memory add-one floor-log2 reference on random corpora") {
    val s = spark
    import s.implicits._
    val genDocs = Gen.choose(1, 6).flatMap(d => Gen.listOfN(d,
      Gen.choose(0, 8).flatMap(len => Gen.listOfN(len, Gen.oneOf("a", "b", "c")))))
    def bits(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    holdsFewer(Prop.forAll(genDocs) { toks =>
      val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
      // Spark split("", " ") yields [""], so an empty text doc contributes
      // the "" token to the vocab — mirror that exactly
      val tokenized = docs.map { case (id, text) => id -> text.split(" ", -1).toSeq }
      val uni = tokenized.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val vocab = uni.size.toLong
      val big = tokenized.flatMap { case (_, t) => t.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expect = tokenized.flatMap { case (id, t) =>
        val bs = t.sliding(2).filter(_.size == 2).map { bg =>
          bits(uni(bg.head) + vocab) - bits(big(bg.mkString(" ")) + 1)
        }.toSeq
        if (bs.isEmpty) None else Some(id -> ((bs.size.toLong, bs.sum)))
      }.toMap
      val got = graft.text.TextAnalysis.lmBits(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got == expect
    })
  }

  test("cmsEstimates: one-sided error on random corpora — est >= true, " +
      "and exact at collision-free width") {
    val s = spark
    import s.implicits._
    val genDocs = Gen.choose(1, 5).flatMap(d => Gen.listOfN(d,
      Gen.choose(1, 10).flatMap(len => Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e")))))
    holdsFewer(Prop.forAll(genDocs) { toks =>
      val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val truth = toks.flatMap(identity).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      // narrow width forces collisions; estimates must never undercount
      val est = graft.text.TextAnalysis
        .cmsEstimates(docs, depth = 2, width = 4, topK = 10).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      est.forall { case (t, tc, e) => tc == truth(t) && e >= tc }
    })
  }

  test("lmBackoffBits == in-memory stupid-backoff reference on random corpora") {
    val s = spark
    import s.implicits._
    val genDocs = Gen.choose(1, 5).flatMap(d => Gen.listOfN(d,
      Gen.choose(0, 8).flatMap(len => Gen.listOfN(len, Gen.oneOf("a", "b", "c")))))
    def bits(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    holdsFewer(Prop.forAll(genDocs, genDocs) { (tr, sc) =>
      val trT = tr.map(_.mkString(" ").split(" ", -1).toSeq)
      val c1 = trT.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = c1.values.sum
      val v = c1.size.toLong
      def grams(k: Int) = trT.flatMap(_.sliding(k).filter(_.size == k)
        .map(_.mkString(" "))).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c2 = grams(2)
      val c3 = grams(3)
      val scD = sc.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
      val expect = scD.flatMap { case (id, text) =>
        val t = text.split(" ", -1).toSeq
        val bs = t.sliding(3).filter(_.size == 3).map { w =>
          val tri = w.mkString(" ")
          val bg = w.drop(1).mkString(" ")
          if (c3.contains(tri)) bits(c2(w.take(2).mkString(" "))) - bits(c3(tri))
          else if (c2.contains(bg)) 2 + bits(c1(w(1))) - bits(c2(bg))
          else 4 + bits(n + v) - bits(c1.getOrElse(w(2), 0L) + 1)
        }.toSeq
        if (bs.isEmpty) None else Some(id -> ((bs.size.toLong, bs.sum)))
      }.toMap
      val trDF = tr.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.text.TextAnalysis.lmBackoffBits(trDF, scD.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got == expect
    })
  }

  test("quotaCap: monotone in k; per-source count = min(k, source size)") {
    import graft.operators.Sampling
    val s = spark
    import s.implicits._
    // 7 sources of uneven sizes (source i has ~300/7 docs), quality with
    // deliberate collisions so the key tie-break is exercised
    val df = (0L until 300L)
      .map(i => (i, s"src${i % 7}", (i * 37) % 11)).toDF("doc_id", "source", "q")
    val sizes = (0 until 7).map(j => s"src$j" -> (0L until 300L).count(_ % 7 == j)).toMap
    def kept(k: Int): Map[String, Set[Long]] = Sampling
      .quotaCap(df, col("doc_id"), col("source"), col("q"), k)
      .collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    holdsFewer(Prop.forAll(Gen.choose(1, 50), Gen.choose(0, 50)) { (k1, dk) =>
      val (a, b) = (kept(k1), kept(k1 + dk))
      // widening the quota only ever ADDS rows — a stable cut, so a
      // re-run with a larger cap is a superset, never a reshuffle
      a.forall { case (src, ids) => ids.subsetOf(b(src)) } &&
        a.forall { case (src, ids) => ids.size == math.min(k1, sizes(src)) }
    })
  }

  test("tokenBudgetSample: monotone in budget; kept cum never exceeds it") {
    import graft.operators.Sampling
    val s = spark
    import s.implicits._
    val df = (0L until 200L)
      .map(i => (i, if (i % 3 == 0) "en" else "de", 5L + i % 13))
      .toDF("doc_id", "lang", "n_tok")
    def kept(en: Long, de: Long): Map[Long, Long] = Sampling
      .tokenBudgetSample(df, col("doc_id"), col("lang"), col("n_tok"),
        Map("en" -> en, "de" -> de))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    holdsFewer(Prop.forAll(
      Gen.choose(5L, 400L), Gen.choose(0L, 400L), Gen.choose(5L, 400L)) {
      (b1, db, bDe) =>
        val (a, b) = (kept(b1, bDe), kept(b1 + db, bDe))
        // raising one stratum's budget only extends that prefix: existing
        // members keep their cum position (hash order is budget-free)
        a.forall { case (id, cum) => b.get(id).contains(cum) } &&
          a.valuesIterator.forall(_ <= math.max(b1, bDe))
    })
  }

  test("heavyHitters == exact frequency filter for random streams and k") {
    val s = spark
    import s.implicits._
    val genToks = Gen.choose(0, 50).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf("v", "w", "x", "y", "z")))
    holdsFewer(Prop.forAll(genToks, Gen.choose(2, 10)) { (toks, k) =>
      val docs = toks.grouped(5).zipWithIndex
        .map { case (t, i) => (i.toLong, t.mkString(" ")) }.toSeq
      val total = toks.size.toLong
      val expect = toks.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
        .filter { case (_, c) => c * k > total }
        .map { case (t, c) => (t, c, total) }.toSet
      val got = graft.text.TextAnalysis.heavyHitters(docs.toDF("doc_id", "text"), k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      got == expect
    })
  }

  test("interval join == brute-force BETWEEN filter for random points/intervals/widths") {
    val s = spark
    import s.implicits._
    val genCase = for {
      np <- Gen.choose(0, 12)
      pts <- Gen.listOfN(np, for {
        u <- Gen.choose(1L, 3L); t <- Gen.choose(-50L, 50L)
      } yield (u, t))
      ni <- Gen.choose(0, 8)
      ivs <- Gen.listOfN(ni, for {
        u <- Gen.choose(1L, 3L); a <- Gen.choose(-50L, 50L); len <- Gen.choose(-5L, 30L)
      } yield (u, a, a + len))
      w <- Gen.oneOf(1L, 3L, 7L, 16L, 100L)
    } yield (pts, ivs, w)
    holdsFewer(Prop.forAll(genCase) { case (pts, ivs, w) =>
      val p = pts.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
        .toDF("user_id", "ts", "pid")
      val iv = ivs.zipWithIndex.map { case ((u, a, b), i) => (u, a, b, i.toLong) }
        .toDF("user_id", "s0", "e0", "iid")
      val got = graft.operators.IntervalJoin.joinPointsToIntervals(
        p, iv, Seq("user_id"), "ts", "s0", "e0", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        ((u, t), i) <- pts.zipWithIndex
        ((v, a, b), j) <- ivs.zipWithIndex
        if u == v && t >= a && t <= b
      } yield (i.toLong, j.toLong)).toSet
      got == expect
    })
  }

  test("unimax: per-stratum allocation sums to min(budget, corpus); never oversamples") {
    val s = spark
    import s.implicits._
    val genCase = for {
      sizes <- Gen.listOfN(3, Gen.choose(0, 30))
      budget <- Gen.choose(1L, 80L)
    } yield (sizes, budget)
    holdsFewer(Prop.forAll(genCase) { case (sizes, budget) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, si) =>
        (0 until n).map(i => ((si * 1000 + i).toLong, s"l$si"))
      }
      if (rows.isEmpty) true
      else {
        val got = graft.operators.Sampling.unimaxSample(
          rows.toDF("doc_id", "lang"), col("doc_id"), col("lang"), budget)
          .groupBy("lang").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val bySize = sizes.zipWithIndex.map { case (n, si) => s"l$si" -> n.toLong }.toMap
        val total = sizes.map(_.toLong).sum
        got.values.sum == math.min(budget, total) &&
          got.forall { case (l, k) => k <= bySize(l) }
      }
    })
  }

  test("KLL quantile rank error within the n/8 coarse bound for random values and k") {
    val genCase = for {
      n <- Gen.choose(1, 800)
      vals <- Gen.listOfN(n, Gen.choose(-1000, 1000))
      k <- Gen.oneOf(16, 64, 256)
      p <- Gen.oneOf(0.1, 0.5, 0.9)
    } yield (vals, k, p)
    holdsFewer(Prop.forAll(genCase) { case (vals, k, p) =>
      val sk = new graft.functions.KllSketch(k)
      vals.foreach(v => sk.insert(v.toDouble))
      val est = sk.quantile(p)
      val sorted = vals.sorted
      val rank = sorted.count(_ .toDouble <= est)
      val target = math.max(1L, math.ceil(p * vals.length).toLong)
      // coarse engine-level sanity bound (the tight bound is KLL theory):
      // the estimate's true rank is within n/8 + 1 of the target for k>=16
      math.abs(rank - target) <= vals.length / 8 + 1
    })
  }

  /** The engine's exact quantized cosine, replayed locally: floor-1e6
    * ints, exact integer dot, one double division — the same IEEE steps
    * [[graft.similarity.Similarity]] runs, so == comparisons are valid. */
  private def localCos(a: Seq[Float], b: Seq[Float]): Double = {
    def q(v: Seq[Float]) = v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
    val (qa, qb) = (q(a), q(b))
    val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
    val na = qa.map(x => x * x).sum
    val nb = qb.map(x => x * x).sum
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  test("mmrTopK == naive greedy MMR on random vectors") {
    val s = spark
    import s.implicits._
    val genCase = for {
      nc <- Gen.choose(3, 8)
      dim <- Gen.choose(2, 4)
      vecs <- Gen.listOfN(nc + 1, Gen.listOfN(dim,
        Gen.choose(-8, 8).map(_.toFloat / 4f)))
      // degenerate zero vectors would make cosine NaN — nudge dim 0
      k <- Gen.choose(1, 3)
    } yield (vecs.map(v => (v.head + 9f) +: v.tail), k)
    holdsFewer(Prop.forAll(genCase) { case (vecs, k) =>
      val qv = vecs.head
      val corpus = vecs.tail.zipWithIndex.map { case (v, i) => (10L + i, v, 0) }
      val cand = corpus.size
      val got = graft.similarity.Similarity.mmrTopK(
          corpus.toDF("vec_id", "embedding", "label"),
          Seq((1L, qv, 0)).toDF("vec_id", "embedding", "label"),
          k = k, candidates = cand, lambda = 0.7)
        .orderBy("step").collect().map(_.getAs[Long]("neighbor_id")).toSeq
      // naive greedy with the same scoring and (score desc, id asc) ties
      val rel = corpus.map { case (id, v, _) => id -> localCos(qv, v) }.toMap
      val byId = corpus.map { case (id, v, _) => id -> v }.toMap
      var remaining = corpus.map(_._1).sorted
      var picked = List.empty[Long]
      while (picked.size < k && remaining.nonEmpty) {
        val best = remaining.map { c =>
          val score = if (picked.isEmpty) rel(c)
            else 0.7 * rel(c) -
              0.30000000000000004 * picked.map(p => localCos(byId(c), byId(p))).max
          (c, score)
        }.reduceLeft((x, y) => if (y._2 > x._2) y else x) // strict >: first max wins, ids ascend
        picked = picked :+ best._1
        remaining = remaining.filterNot(_ == best._1)
      }
      got == picked
    })
  }

  test("hits == local integer power iteration on random weighted digraphs") {
    val s = spark
    import s.implicits._
    val genGraph = for {
      nn <- Gen.choose(2, 5)
      ne <- Gen.choose(0, 8)
      edges <- Gen.listOfN(ne, for {
        a <- Gen.choose(0, nn - 1); b <- Gen.choose(0, nn - 1)
        w <- Gen.choose(1L, 5L)
      } yield (s"n$a", s"n$b", w))
    } yield (nn, edges.groupBy(e => (e._1, e._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).sum) }.toList)
    holdsFewer(Prop.forAll(genGraph) { case (nn, edges) =>
      val nodes = (0 until nn).map(i => s"n$i")
      val got = graft.operators.Graph.hits(
          nodes.toDF("node"),
          edges.toDF("src", "dst", "w"), iterations = 2, scale = 1000L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // local replay: sweep + max-normalize, all integer
      def sweep(sc: Map[String, Long], from: Int, to: Int): Map[String, Long] = {
        val raw = nodes.map(n =>
          n -> edges.filter(e => e.productElement(to).asInstanceOf[String] == n)
            .map(e => e._3 * sc(e.productElement(from).asInstanceOf[String]))
            .sum).toMap
        val mx = math.max(raw.values.max, 1L)
        raw.map { case (n, v) => n -> v * 1000L / mx }
      }
      var hub = nodes.map(_ -> 1000L).toMap
      var auth = hub
      (1 to 2).foreach { _ =>
        auth = sweep(hub, from = 0, to = 1)
        hub = sweep(auth, from = 1, to = 0)
      }
      got == nodes.map(n => (n, hub(n), auth(n))).toSet
    })
  }

  test("asofNearest == brute-force closest-either-side with backward tie preference") {
    val s = spark
    import s.implicits._
    val genSide = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 12L)
    } yield (u, t)))
    holdsFewer(Prop.forAll(genSide, genSide) { (ls, rs) =>
      val lefts = ls.zipWithIndex.map { case ((u, t), i) => (u, t, 100L + i, 0.0) }
      val rights = rs.zipWithIndex.map { case ((u, t), i) => (u, t, 900L + i, 1.0, t) }
      val got = graft.operators.AsofJoin.asofNearest(
          lefts.toDF("user_id", "tms", "event_id", "value"),
          rights.toDF("user_id", "tms", "purchase_id", "purchase_value", "purchase_tms"),
          keys = Seq("user_id"), ts = "tms", rightTie = "purchase_id",
          rightVals = Seq("purchase_id", "purchase_value", "purchase_tms"),
          rightTs = "purchase_tms")
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("purchase_id")).map(_.toLong)).toMap
      val expect = lefts.map { case (u, t, id, _) =>
        val back = rights.filter(r => r._1 == u && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption
        val fwd = rights.filter(r => r._1 == u && r._2 >= t)
          .sortBy(r => (r._2, r._3)).headOption // earliest ts, smallest id
        id -> ((back, fwd) match {
          case (None, f) => f.map(_._3)
          case (b, None) => b.map(_._3)
          case (Some(b), Some(f)) =>
            Some(if (t - b._2 <= f._2 - t) b._3 else f._3)
        })
      }.toMap
      got == expect
    })
  }

  test("globalRank == single-sort row_number for random ties and bucket counts") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.choose(0, 40)
      vals <- Gen.listOfN(n, Gen.choose(0, 4)) // heavy ties across buckets
      buckets <- Gen.choose(1, 8)
    } yield (vals, buckets)
    holdsFewer(Prop.forAll(gen) { case (vals, buckets) =>
      val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong + 1, v / 2.0) }
      val got = graft.operators.RobustStats.globalRank(
        rows.toDF("event_id", "value"), buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._3).toSeq
      val expect = rows
        .map { case (id, v) => (id, math.floor(v * 1000000).toLong) }
        .sortBy { case (id, vm) => (vm, id) }
        .zipWithIndex.map { case ((id, vm), i) => (id, vm, i + 1L) }
      got == expect
    })
  }

  test("skipGramPairs: total pair mass == sum over docs of max(0, len-d)") {
    val s = spark
    import s.implicits._
    val genDocs = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n,
      Gen.choose(0, 8).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")))))
    holdsFewer(Prop.forAll(genDocs) { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.text.TextAnalysis.skipGramPairs(df,
        window = 3, minCount = 1)
        .collect().map(_.getAs[Long]("pairs")).sum
      // "" splits to [""], a single token — same as a 1-token doc
      val expect = docs.map(t => math.max(t.size, 1)).map { len =>
        (1 to 3).map(d => math.max(0, len - d)).sum
      }.sum
      got == expect
    })
  }

  test("pairItemsets == brute-force basket pair counts") {
    val s = spark
    import s.implicits._
    val genEv = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L)
      day <- Gen.choose(0L, 2L)
      t <- Gen.oneOf("a", "b", "c", "d")
    } yield (u, day, t)))
    holdsFewer(Prop.forAll(genEv) { ev =>
      val df = ev.map { case (u, day, t) =>
        (u, t, new java.sql.Timestamp(day * 86400000L + u * 1000L)) }
        .toDF("user_id", "event_type", "ts")
      val got = graft.operators.Relational.pairItemsets(df, topK = 100)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("support"))
        .toMap
      val expect = ev.groupBy { case (u, d, _) => (u, d) }
        .values.map(_.map(_._3).distinct.sorted)
        .flatMap(items => for {
          i <- items.indices; j <- (i + 1) until items.size
        } yield (items(i), items(j)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      got == expect
    })
  }

  test("linkPrediction == brute-force RA over common neighbors") {
    val s = spark
    import s.implicits._
    val genEdges = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(1L, 6L); b <- Gen.choose(1L, 6L) if a != b
    } yield (math.min(a, b), math.max(a, b)))).map(_.distinct)
    holdsFewer(Prop.forAll(genEdges) { edges =>
      val got = graft.operators.Graph.linkPrediction(
        edges.toDF("a", "b"), topK = 1000)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getAs[Long]("common"), r.getAs[Long]("ra_micro"))).toMap
      val adj = (edges ++ edges.map(e => (e._2, e._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val nodes = adj.keys.toSeq.sorted
      val expect = (for {
        a <- nodes; b <- nodes if a < b
        if !adj(a).contains(b)
        common = adj(a) & adj(b)
        if common.nonEmpty
      } yield (a, b) -> (common.size.toLong,
        common.toSeq.map(z => 1000000L / adj(z).size).sum)).toMap
      got == expect
    })
  }

  test("bootstrapMeans weights replay the local md5 Poisson inverse CDF") {
    val s = spark
    import s.implicits._
    val genIds = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 1000L))).map(_.distinct)
    holdsFewer(Prop.forAll(genIds) { ids =>
      val df = ids.map(id => (id, 1.0)).toDF("event_id", "value")
      val got = graft.operators.Sampling.bootstrapMeans(df,
        col("event_id"), col("value"), resamples = 8)
        .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("n_eff")).toMap
      def w(b: Int, id: Long): Long = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$b:$id".getBytes("UTF-8"))
        val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        val ts = graft.operators.Sampling.PoissonThresholds
        ts.indexWhere(u < _) match { case -1 => ts.size.toLong; case k => k.toLong }
      }
      val expect = (1 to 8).map(b => b.toLong -> ids.map(w(b, _)).sum).toMap
      got == expect
    })
  }

  test("gini == brute-force O(n^2) mean-absolute-difference form") {
    val s = spark
    import s.implicits._
    // G = sum_ij |xi - xj| / (2 n sum) — the definitional form, O(n²),
    // checked against the histogram rank identity
    val genVals = Gen.choose(1, 15).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 9L)))
    holdsFewer(Prop.forAll(genVals) { vals =>
      val sx = vals.sum
      (sx == 0) || {
        val r = graft.operators.RobustStats.gini(
          vals.toDF("v"), col("v")).collect()(0)
        val mad = (for (a <- vals; b <- vals) yield math.abs(a - b)).sum
        val expect = mad.toDouble / (2.0 * vals.size * sx)
        r.getAs[Long]("n") == vals.size &&
          math.abs(r.getAs[Double]("gini") - expect) < 1e-12
      }
    })
  }

  test("gapfill: contiguous spine, endpoints exact, interpolation between neighbors") {
    val genSeries = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, for {
      m <- Gen.choose(0L, 30L)   // minute
      c <- Gen.choose(1, 5)      // msgs that minute
    } yield (m, c))).map(_.groupBy(_._1).view.mapValues(_.map(_._2).sum).toList.sortBy(_._1))
    holdsFewer(Prop.forAll(genSeries) { series =>
      val msgs = series.flatMap { case (m, c) =>
        (0 until c).map(i => msg("s", 0, m * 60000L + i * 10L, i))
      }
      val got = graft.metrics.Metrics.interpolatedMinuteCounts(streamDataOf(msgs: _*))
        .orderBy("minute").collect()
        .map(r => (r.getAs[java.time.LocalDateTime]("minute").toEpochSecond(
            java.time.ZoneOffset.UTC) / 60,
          r.getAs[Long]("msgs"), r.getAs[Boolean]("filled")))
      val lo = series.head._1
      val hi = series.last._1
      val active = series.toMap
      got.map(_._1).toSeq == (lo to hi) &&                       // contiguous
        got.forall { case (m, v, filled) =>
          active.get(m) match {
            case Some(c) => !filled && v == c.toLong             // endpoints exact
            case None =>
              val (pm, pc) = series.takeWhile(_._1 < m).last
              val (nm, nc) = series.dropWhile(_._1 < m).head
              val expect = (pc.toLong * (nm - m) + nc.toLong * (m - pm)) / (nm - pm)
              filled && v == expect                              // exact floor interp
          }
        }
    })
  }

  test("mannWhitneyDrift == brute-force pairwise U with tie halves") {
    val s = spark
    import s.implicits._
    val gen = for {
      n1 <- Gen.choose(0, 10)
      n2 <- Gen.choose(0, 10)
      p1 <- Gen.listOfN(n1, Gen.choose(0, 4))
      p2 <- Gen.listOfN(n2, Gen.choose(0, 4))
    } yield (p1, p2)
    holdsFewer(Prop.forAll(gen) { case (p1, p2) =>
      val rows =
        p1.map(v =>
          ("t", java.sql.Timestamp.valueOf("2024-01-10 12:00:00"), v / 2.0)) ++
        p2.map(v =>
          ("t", java.sql.Timestamp.valueOf("2024-01-20 12:00:00"), v / 2.0))
      val out = graft.operators.RobustStats
        .mannWhitneyDrift(rows.toDF("event_type", "ts", "value")).collect()
      if (rows.isEmpty) out.isEmpty
      else {
        val r = out.head
        // doubled brute-force U1: 2 per strict win, 1 per tie
        val u1x2 = (for { a <- p1; b <- p2 } yield
          if (a > b) 2L else if (a == b) 1L else 0L).sum
        val tieCubes = (p1 ++ p2).groupBy(identity).values
          .map(g => g.size.toLong).map(t => t * t * t - t).sum
        val (n1L, n2L) = (p1.size.toLong, p2.size.toLong)
        val zOk =
          if (n1L == 0 || n2L == 0) r.isNullAt(r.fieldIndex("z"))
          else {
            val bigN = n1L + n2L
            val varU = (n1L * n2L).toDouble * ((bigN + 1).toDouble -
              tieCubes.toDouble / (bigN * (bigN - 1)).toDouble) / 12.0
            if (varU <= 0) r.isNullAt(r.fieldIndex("z"))
            else r.getAs[Double]("z") ==
              (u1x2 - n1L * n2L).toDouble / (2.0 * math.sqrt(varU))
          }
        r.getAs[Long]("n1") == n1L && r.getAs[Long]("n2") == n2L &&
          r.getAs[Double]("u1_2x") == u1x2.toDouble &&
          r.getAs[Double]("u2_2x") == (2 * n1L * n2L - u1x2).toDouble &&
          r.getAs[Double]("tie_cubes") == tieCubes.toDouble && zOk
      }
    })
  }

  test("spearmanTrend == brute-force tie-averaged rank Pearson") {
    val s = spark
    import s.implicits._
    val gen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, for {
      d <- Gen.choose(1, 4)
      v <- Gen.choose(0, 4)
    } yield (d, v)))
    holdsFewer(Prop.forAll(gen) { pts =>
      // noon pins every row mid-day, so any uniform JVM-zone shift moves
      // ALL rows the same whole number of days and ranks are unchanged
      val rows = pts.map { case (d, v) =>
        ("t", java.sql.Timestamp.valueOf(s"2024-01-0$d 12:00:00"), v / 2.0) }
      val out = graft.operators.RobustStats
        .spearmanTrend(rows.toDF("event_type", "ts", "value")).collect()
      if (pts.isEmpty) out.isEmpty
      else {
        // doubled average rank of key k among keys: 2*|smaller| + ties + 1
        def rank2x(keys: List[Int]): List[Long] = keys.map(k =>
          2L * keys.count(_ < k) + keys.count(_ == k) + 1L)
        val xs = rank2x(pts.map(_._1))
        val ys = rank2x(pts.map(_._2))
        val n = pts.size.toLong
        val (sx, sy) = (xs.sum, ys.sum)
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(a => a * a).sum)
        val (denx, deny) = (n * sxx - sx * sx, n * syy - sy * sy)
        val r = out.head
        val rhoOk =
          if (denx <= 0 || deny <= 0) r.isNullAt(r.fieldIndex("rho"))
          else r.getAs[Double]("rho") == (n * sxy - sx * sy).toDouble /
            (math.sqrt(denx.toDouble) * math.sqrt(deny.toDouble))
        r.getAs[Long]("n") == n && rhoOk
      }
    })
  }
  test("kendallTau == brute-force pairwise concordance with tie correction") {
    val s = spark
    import s.implicits._
    val gen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, for {
      d <- Gen.choose(1, 5)
      v <- Gen.choose(0, 4)
    } yield (d, v)))
    holdsFewer(Prop.forAll(gen) { pts =>
      // dayBand=1 / valueBand=1e6 make the bands the raw (day, int value)
      // so banded tau-b IS plain tau-b over the generated points
      val rows = pts.map { case (d, v) =>
        ("t", java.sql.Timestamp.valueOf(s"2024-01-0$d 12:00:00"), v.toDouble) }
      val out = graft.operators.RobustStats
        .kendallTau(rows.toDF("event_type", "ts", "value"),
          dayBand = 1L, valueBand = 1000000L).collect()
      if (pts.isEmpty) out.isEmpty
      else {
        val idx = pts.toIndexedSeq
        var c = 0L; var d = 0L
        for (i <- idx.indices; j <- (i + 1) until idx.size) {
          val (d1, v1) = idx(i); val (d2, v2) = idx(j)
          if (d1 != d2 && v1 != v2) {
            if ((d1 < d2) == (v1 < v2)) c += 1 else d += 1
          }
        }
        val n = pts.size.toLong
        val tx2 = pts.groupBy(_._1).values.map(_.size.toLong)
          .map(t => t * (t - 1)).sum
        val ty2 = pts.groupBy(_._2).values.map(_.size.toLong)
          .map(t => t * (t - 1)).sum
        val (dx, dy) = (n * (n - 1) - tx2, n * (n - 1) - ty2)
        val r = out.head
        val tauOk =
          if (dx <= 0 || dy <= 0) r.isNullAt(r.fieldIndex("tau_b"))
          else r.getAs[Double]("tau_b") == 2.0 * (c - d).toDouble /
            (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))
        r.getAs[Long]("n") == n && r.getAs[Double]("conc") == c.toDouble &&
          r.getAs[Double]("disc") == d.toDouble && tauOk
      }
    })
  }
  test("tCloseness == brute-force integer cross-multiplied ordered EMD") {
    val s = spark
    import s.implicits._
    val gen = Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("A", "B", "C")
      v <- Gen.choose(0L, 4L)
    } yield (g, v)))
    holdsFewer(Prop.forAll(gen) { pts =>
      val out = graft.operators.Profile
        .tCloseness(pts.toDF("grp", "v"), Seq("grp"),
          org.apache.spark.sql.functions.col("v"), t = 0.2)
        .collect().map(r => r.getAs[String]("grp") ->
          (if (r.isNullAt(r.fieldIndex("emd"))) None
           else Some(r.getAs[Double]("emd")))).toMap
      val bigN = pts.size.toLong
      val global = pts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val vs = global.keys.toSeq.sorted
      val m = vs.size.toLong
      pts.groupBy(_._1).forall { case (grp, rows) =>
        val n = rows.size.toLong
        val cls = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        var cum = 0L; var num = 0L
        vs.foreach { v =>
          cum += cls.getOrElse(v, 0L) * bigN - global(v) * n
          num += math.abs(cum)
        }
        val expect =
          if (m <= 1) None
          else Some(num.toDouble / (n * bigN * (m - 1)).toDouble)
        out(grp) == expect
      }
    })
  }

  test("goodTuring == brute-force frequency-of-frequencies (unigram form)") {
    val s = spark
    import s.implicits._
    val gen = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e")))
    holdsFewer(Prop.forAll(gen) { toks =>
      val docs = Seq((1L, toks.mkString(" "), "en", "s"))
        .toDF("doc_id", "text", "lang", "source")
      val got = graft.text.TextAnalysis.goodTuring(docs, n = 1)
        .collect().map(r => r.getAs[Long]("r") ->
          (r.getAs[Long]("n_r"), r.getAs[Long]("n_r1"),
            r.getAs[Double]("r_star"), r.getAs[Double]("p0"))).toMap
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val hist = counts.values.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val total = toks.size.toLong
      val n1 = hist.getOrElse(1L, 0L)
      hist.filter(_._1 <= 10L).forall { case (r, nr) =>
        val nr1 = hist.getOrElse(r + 1, 0L)
        got.get(r).contains((nr, nr1,
          ((r + 1) * nr1).toDouble / nr.toDouble,
          n1.toDouble / total.toDouble))
      } && got.size == hist.count(_._1 <= 10L)
    })
  }
  test("zipfSlope == brute-force staircase OLS over ranked counts") {
    val s = spark
    import s.implicits._
    val gen = Gen.choose(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f")))
    holdsFewer(Prop.forAll(gen) { toks =>
      val docs = Seq((1L, toks.mkString(" "), "en", "s"))
        .toDF("doc_id", "text", "lang", "source")
      val out = graft.text.TextAnalysis.zipfSlope(docs, topK = 4).collect()
      def bits(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
      val ranked = toks.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy { case (t, c) => (-c, t) }.take(4)
      val pts = ranked.zipWithIndex.map { case ((_, c), k) =>
        (bits(k + 1L), bits(c)) }
      val n = pts.size.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val den = n * sxx - sx * sx
      val r = out.head
      val slopeOk =
        if (den <= 0) r.isNullAt(r.fieldIndex("slope"))
        else r.getAs[Double]("slope") ==
          (n * sxy - sx * sy).toDouble / den.toDouble
      r.getAs[Long]("n") == n && slopeOk
    })
  }
}
