package graft

import org.apache.spark.sql.functions._

/** Pins the native [[graft.functions.GopherStats]] byte walk against the
  * declarative chain it replaced in
  * [[graft.text.TextAnalysis.gopherQuality]]:
  * `size(split(text,' '))`, `length(regexp_replace(text,' ',''))`,
  * `size(filter(tokens, rlike '[A-Za-z]'))` and
  * `regexp_count(text, '[#]|[.][.][.]')` — value-identical on every row,
  * including the edges that break naive implementations (consecutive /
  * leading / trailing spaces, empty text, multibyte UTF-8, supplementary
  * planes, dot-run overlaps, null). */
class GopherStatsSpec extends SparkSpec {

  private val edges = Seq(
    "the quick brown fox",
    "",
    " ",
    "  ",
    "a  b",
    " leading and trailing ",
    "über größe naïve 日本語 テスト",
    "emoji 😀 mixed ascii",
    "### ... .... ..... ......",
    "..# #.. ...# #...",
    "dots.inside.words...and#hash",
    "no-alpha 123 456 --- ###",
    "UPPER lower MiXeD 42x x42",
    "single",
    ".",
    "..",
    "...",
    "....",
    "#",
    "a#b...c",
    "ééé 中文 abc123",
    "tab\tis not a space separator",
    "multi   space   runs   everywhere")

  test("gopher_stats equals the declarative replay on edge corpus") {
    val s = spark
    import s.implicits._
    val docs = edges.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val declared = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_words"),
      length(regexp_replace(col("text"), " ", "")).cast("long")
        .as("word_chars"),
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
        .as("n_alpha_words"),
      regexp_count(col("text"), lit("[#]|[.][.][.]")).cast("long")
        .as("n_symbols"))
    val native = docs.select(col("doc_id"),
      graft.functions.GopherStats.gopher_stats(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_words"), col("g.word_chars"),
        col("g.n_alpha_words"), col("g.n_symbols"))
    val d = declared.orderBy("doc_id").collect().map(_.toSeq)
    val n = native.orderBy("doc_id").collect().map(_.toSeq)
    d.zip(n).zipWithIndex.foreach { case ((dd, nn), i) =>
      assert(dd == nn, s"row $i (text=${edges(i)})")
    }
  }

  test("null text propagates as null struct, like the declarative form") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, null: String), (2L, "ok text here now five"))
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.gopherQuality(docs)
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("n_words")))
    assert(out(0).isNullAt(out(0).fieldIndex("passes_gopher")))
    assert(out(1).getLong(out(1).fieldIndex("n_words")) == 5L)
    assert(out(1).getLong(out(1).fieldIndex("passes_gopher")) == 1L)
  }

  test("gopherKeep == the semi-join composition, all columns preserved") {
    val s = spark
    import s.implicits._
    val docs = (edges.zipWithIndex.map { case (t, i) => (i.toLong, t, s"L$i") }
      :+ ((99L, null: String, "LN")))
      .toDF("doc_id", "text", "lang")
    val composed = docs.join(
      graft.text.TextAnalysis.gopherQuality(docs)
        .filter(col("passes_gopher") === 1).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val fused = graft.text.TextAnalysis.gopherKeep(docs)
    assert(fused.columns.toSeq == docs.columns.toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rows(fused) == rows(composed))
    assert(rows(fused).nonEmpty)
  }

  test("gopherQuality schema and verdict unchanged by the native rewrite") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "no"),
      (3L, "### ### ### ### ### ### some words here to pass count"))
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.gopherQuality(docs)
    assert(out.columns.toSeq == Seq("doc_id", "n_words", "word_chars",
      "n_alpha_words", "n_symbols", "mean_word_len", "symbol_ratio",
      "alpha_frac", "passes_gopher"))
    val rows = out.orderBy("doc_id").collect()
    assert(rows(0).getLong(8) == 1L)   // passes
    assert(rows(1).getLong(8) == 0L)   // too few words
    assert(rows(2).getLong(8) == 0L)   // symbol ratio too high
  }
}
