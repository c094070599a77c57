package graft

import graft.functions.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("SQL surface: md5_partition and quantized_dot callable from spark.sql") {
    GraftExtensions.register(spark)
    val p = spark.sql("SELECT md5_partition('key-0', 10) AS p").collect().head.getInt(0)
    assert(p == 6) // golden vector 0 (Partitioner.test.ts)
    val d = spark.sql(
      "SELECT quantized_dot(array(1L, 2L, -3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0)
    assert(d == -4L)
    // usable inside a realistic SQL query
    val n = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT md5_partition(CAST(id AS STRING), 4) AS part FROM range(100)
        |) WHERE part BETWEEN 0 AND 3""".stripMargin).collect().head.getLong(0)
    assert(n == 100)
  }

  test("SQL kll_quantiles aggregates with a foldable probs literal") {
    GraftExtensions.register(spark)
    val q = spark.sql(
      """SELECT kll_quantiles(CAST(id AS DOUBLE), array(0.5D, 0.9D), 4096) AS q
        |FROM range(1, 101)""".stripMargin)
      .collect().head.getSeq[Double](0)
    assert(q == Seq(50.0, 90.0)) // exact nearest-rank: k > n, no compaction
  }

  test("SQL md5_int matches the declarative conv(substring(md5)) form") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT md5_int(CAST(id AS STRING), 15) AS fast,
        |       CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS slow
        |FROM range(500)""".stripMargin).collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
    // digits outside [1,15] is an analysis-time error, not runtime garbage
    val e = intercept[Exception](spark.sql("SELECT md5_int('x', 16)").collect())
    assert(e.getMessage.contains("md5_int") || e.getMessage.contains("DATATYPE"))
  }

  test("SQL fingerprint_fold matches the declarative aggregate() fold") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT fingerprint_fold(split(t, ' '), 1000000000039L) AS fast,
        |       aggregate(split(t, ' '), 0L,
        |         (acc, tok) -> (acc * 31L + md5_int(tok, 8)) % 1000000000039L) AS slow
        |FROM (SELECT concat('w', CAST(id AS STRING), ' x y z w', CAST(id % 7 AS STRING)) AS t
        |      FROM range(200))""".stripMargin).collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
    // empty array folds to the seed
    assert(spark.sql(
      "SELECT fingerprint_fold(CAST(array() AS ARRAY<STRING>), 97L) AS f")
      .collect().head.getLong(0) == 0L)
    // overflow-unsafe modulus is an analysis-time error, not silent wrap
    val e = intercept[Exception](
      spark.sql("SELECT fingerprint_fold(array('a'), 9223372036854775807L)").collect())
    assert(e.getMessage.contains("fingerprint_fold") ||
      e.getMessage.contains("DATATYPE"))
  }

  test("SQL centroid_rank accepts a foldable centroid-table literal") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT centroid_rank(array(1L, 1L),
        |  array(array(0.0d, 0.0d), array(10.0d, 0.0d), array(3.0d, 4.0d))) AS r""".stripMargin)
      .collect().head.getSeq[Long](0).toList
    assert(got == List(0L, 2L, 1L)) // same vector as the Scala-API case below
    // non-literal centroid table is rejected with a clear message
    val e = intercept[Exception](spark.sql(
      """SELECT centroid_rank(array(1L), array(array(CAST(id AS DOUBLE))))
        |FROM range(3)""".stripMargin).collect())
    assert(e.getMessage.contains("foldable"))
  }

  test("centroid_rank: ids ordered by (squared L2, id); ties break on id; type-checked") {
    import org.apache.spark.sql.functions._
    import graft.functions.CentroidRank.centroid_rank
    val s = spark
    import s.implicits._
    val cents = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(3.0, 4.0))
    val got = Seq(Seq(1L, 1L), Seq(9L, 1L), Seq(3L, 4L))
      .toDF("v")
      .select(centroid_rank(col("v"), cents).as("r"))
      .collect().map(_.getSeq[Long](0).toList)
    assert(got(0) == List(0L, 2L, 1L)) // (1,1): d=2 < 13 < 82
    assert(got(1) == List(1L, 2L, 0L)) // (9,1): d=2 < 45 < 82
    // (3,4): exactly on centroid 2; centroid 0 at 25, centroid 1 at 65
    assert(got(2) == List(2L, 0L, 1L))
    // equidistant centroids keep id order (insertion sort is stable)
    val tie = Seq(Seq(5L, 0L)).toDF("v")
      .select(centroid_rank(col("v"), Seq(Seq(0.0, 0.0), Seq(10.0, 0.0))).as("r"))
      .collect().head.getSeq[Long](0).toList
    assert(tie == List(0L, 1L))
    // analysis-time contract: input must be array<bigint>
    val bad = intercept[Exception](
      Seq(Seq(1.0, 2.0)).toDF("v")
        .select(centroid_rank(col("v"), cents)).collect())
    assert(bad.getMessage.contains("centroid_rank") ||
      bad.getMessage.contains("DATATYPE"))
  }

  test("multi_pattern_count: overlapping all-occurrence semantics, UTF-8, contracts") {
    import graft.functions.MultiPatternCount.multi_pattern_count
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    def counts(text: String, pats: Seq[String]): List[Long] =
      Seq(text).toDF("t")
        .select(multi_pattern_count(col("t"), pats).as("c"))
        .collect().head.getSeq[Long](0).toList

    // overlapping occurrences all count: "aa" twice in "aaa"
    assert(counts("aaa", Seq("aa", "a")) == List(2L, 3L))
    // the classic AC dictionary walkthrough (Aho & Corasick 1975 §2)
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ==
      List(1L, 1L, 0L, 1L))
    // patterns sharing proper suffixes both fire at one end position
    assert(counts("a a a the", Seq("a a", "the", "he")) == List(2L, 1L, 1L))
    // multi-byte UTF-8: byte-level DFA still counts character occurrences
    assert(counts("héllo hé", Seq("hé")) == List(2L))
    assert(counts("", Seq("x")) == List(0L))
    // null text stays null (UnaryExpression null propagation)
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(multi_pattern_count(col("t"), Seq("x")).as("c"))
      .collect().head
    assert(nullRow.isNullAt(0))
    // construction contracts: empty set / empty pattern / duplicates
    intercept[IllegalArgumentException](counts("x", Seq.empty))
    intercept[IllegalArgumentException](counts("x", Seq("")))
    intercept[IllegalArgumentException](counts("x", Seq("a", "a")))
    // analysis-time contract: input must be a string column
    val bad2 = intercept[Exception](
      Seq(1L).toDF("v").select(multi_pattern_count(col("v"), Seq("a"))).collect())
    assert(bad2.getMessage.contains("multi_pattern_count") ||
      bad2.getMessage.contains("DATATYPE"))
    // SQL surface: registered with a foldable array<string> pattern literal
    GraftExtensions.register(spark)
    val sqlGot = spark.sql(
      "SELECT multi_pattern_count('ushers', array('he', 'she', 'hers')) AS c")
      .collect().head.getSeq[Long](0).toList
    assert(sqlGot == List(1L, 1L, 1L))
    val sqlBad = intercept[Exception](
      spark.sql("SELECT multi_pattern_count('x', array(CAST(NULL AS STRING)))").collect())
    assert(sqlBad.getMessage.nonEmpty)
  }
  test("unicode_norm: NFC/NFD/NFKC forms, ASCII fast-path, analysis errors") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.UnicodeNorm.unicode_norm
    val s = spark
    import s.implicits._
    val decomposed = "Cafe\u0301"  // e + combining acute
    val composed = "Caf\u00e9"     // precomposed é
    val df = Seq((decomposed, composed)).toDF("d", "c")
    val r = df.select(
      unicode_norm(col("d"), "NFC").as("nfc"),
      unicode_norm(col("c"), "NFD").as("nfd"),
      unicode_norm(lit("ﬁle"), "NFKC").as("nfkc"), // fi ligature
      unicode_norm(lit("ﬁle"), "NFC").as("nfc_lig"))
      .collect().head
    assert(r.getString(0) == composed, "NFC must compose e+U+0301")
    assert(r.getString(1) == decomposed, "NFD must decompose the é")
    assert(r.getString(2) == "file", "NFKC must fold the fi ligature")
    assert(r.getString(3) == "ﬁle",
      "NFC must NOT fold compatibility ligatures")
    // SQL registration, null propagation, ASCII identity
    val sql = spark.sql(
      """SELECT unicode_norm('plain ascii', 'NFKD') AS a,
        |       unicode_norm(CAST(NULL AS STRING), 'NFC') AS n""".stripMargin)
      .collect().head
    assert(sql.getString(0) == "plain ascii" && sql.isNullAt(1))
    // a bad form is an analysis-time error, not per-row garbage
    val e = intercept[Exception](
      spark.sql("SELECT unicode_norm('x', 'NFX')").collect())
    assert(e.getMessage.contains("unicode_norm")
      || e.getMessage.contains("DATATYPE"))
  }

  test("stripMarks: combining accents dropped, single-codepoint letters kept") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val got = Seq("Café ü ñ ø")
      .toDF("t")
      .select(graft.text.TextAnalysis.stripMarks(col("t")))
      .collect().head.getString(0)
    // é->e, ü->u, ñ->n (combining sequences), ø untouched (no Mn mark)
    assert(got == "Cafe u n ø")
  }
  test("SQL cov_stats: sufficient stats match hand sums; ragged dims raise") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    Seq((Array(1L, 2L)), (Array(3L, 4L))).toDF("q")
      .createOrReplaceTempView("covq")
    val rows = spark.sql(
      """SELECT p.i, p.j, p.n, p.sx, p.sy, p.sxy
        |FROM (SELECT cov_stats(q) AS s FROM covq)
        |LATERAL VIEW explode(s) t AS p ORDER BY p.i, p.j""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(rows == Seq(
      (0L, 0L, 2L, 4L, 4L, 10L),   // sxx = 1 + 9
      (0L, 1L, 2L, 4L, 6L, 14L),   // sxy = 2 + 12
      (1L, 1L, 2L, 6L, 6L, 20L)))  // syy = 4 + 16
    // ragged dims must raise loudly, not mis-pair coordinates
    val e = intercept[Exception] {
      Seq((Array(1L, 2L)), (Array(3L))).toDF("q")
        .createOrReplaceTempView("ragged")
      spark.sql("SELECT cov_stats(q) FROM ragged").collect()
    }
    assert(e.getMessage.contains("ragged")
      || e.getCause != null && e.getCause.getMessage.contains("ragged"))
  }

  test("CovState: merge equals single-pass; overflow raises, never wraps") {
    import graft.functions.CovState
    val a = new CovState; val b = new CovState; val whole = new CovState
    a.insert(Array(1L, 2L)); b.insert(Array(3L, 4L))
    whole.insert(Array(1L, 2L)); whole.insert(Array(3L, 4L))
    a.mergeWith(b)
    assert(a.n == whole.n && a.sx.toSeq == whole.sx.toSeq
      && a.sxy.toSeq == whole.sxy.toSeq)
    // serialization round-trip preserves every statistic
    val rt = CovState.fromBytes(a.toBytes)
    assert(rt.n == a.n && rt.sx.toSeq == a.sx.toSeq
      && rt.sxy.toSeq == a.sxy.toSeq)
    // int64 overflow is LOUD (addExact), never a silent wrap
    val big = new CovState
    big.insert(Array(3037000499L)) // q*q = 9.223e18 still fits int64
    // the second accumulation pushes the sxy sum past Long.MaxValue
    intercept[ArithmeticException](big.insert(Array(3037000499L)))
  }

  test("SQL image_header / wav_header parse real container bytes from the registry") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    Seq(
      (1L, graft.multimodal.Multimodal.synthPng(320, 200, 8, 2)),
      (2L, graft.multimodal.Multimodal.synthJpeg(64, 48, 3, 6, bigEndianTiff = false)),
      (3L, graft.multimodal.Multimodal.synthWav(2, 16000, 16, 160)),
      (4L, "not media".getBytes("UTF-8")))
      .toDF("id", "data").createOrReplaceTempView("media_bytes")
    val img = spark.sql(
      """SELECT id, image_header(data).format AS f, image_header(data).width AS w,
        |       image_header(data).orientation AS o
        |FROM media_bytes ORDER BY id""".stripMargin).collect()
    assert(img.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1L, "png", 320, -1), (2L, "jpeg", 64, 6),
        (3L, "unknown", -1, -1), (4L, "unknown", -1, -1)))
    val wav = spark.sql(
      """SELECT wav_header(data).channels AS c, wav_header(data).sample_rate AS sr,
        |       wav_header(data).n_frames AS nf, wav_header(data).duration_ms AS ms
        |FROM media_bytes WHERE id = 3""".stripMargin).collect().head
    assert((wav.getInt(0), wav.getInt(1), wav.getLong(2), wav.getLong(3)) ==
      ((2, 16000, 160L, 10L)))
  }

  test("SQL crawl-stack functions: mp4_header, warc/gzip splitting, http_head, html_text") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    val mp4 = graft.multimodal.Multimodal.synthMp4("isom", 1000, 2500L, 320, 240,
      audioTrack = false, mvhdV1 = false, largeFree = false)
    val crawlGz = graft.multimodal.Multimodal.gzipMember(
      graft.multimodal.Multimodal.warcRecordBytes("web", 9L,
        graft.multimodal.Multimodal.httpResponse(200, "OK", "text/html",
          graft.multimodal.Multimodal.htmlPage(9L, "sql &amp; stack"))))
    Seq((1L, mp4), (2L, crawlGz)).toDF("id", "data")
      .createOrReplaceTempView("crawl_bytes")
    val m = spark.sql(
      "SELECT mp4_header(data).duration_ms AS d, mp4_header(data).width AS w " +
        "FROM crawl_bytes WHERE id = 1").collect().head
    assert((m.getLong(0), m.getInt(1)) == ((2500L, 320)))
    val r = spark.sql(
      """SELECT t.title, t.body, hh.status FROM (
        |  SELECT http_head(hp) AS hh,
        |         html_text(substring(hp, CAST(http_head(hp).body_offset AS INT) + 1, 2147483647)) AS t
        |  FROM (SELECT element_at(warc_payloads(element_at(gzip_members(data), 1)), 1) AS hp
        |        FROM crawl_bytes WHERE id = 2))""".stripMargin).collect().head
    assert(r.getString(0) == "Doc 9")
    assert(r.getString(1) == "sql &amp; stack") // builder escaped the '&' of the raw text
    assert(r.getInt(2) == 200)
  }
}
