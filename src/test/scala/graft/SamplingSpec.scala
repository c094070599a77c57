package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
  }

  test("hashSample: deterministic, repeatable, roughly at rate") {
    val a = Sampling.hashSample(docs, col("doc_id"), 1, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, col("doc_id"), 1, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)                          // same subset every run
    assert(a.size > 50 && a.size < 200)     // ~10% of 1000
    val c = Sampling.hashSample(docs, col("doc_id"), 1, 10, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c != a)                          // salt changes the subset
  }

  test("hashSample: rate composes — keep 2/10 is a superset of keep 1/10") {
    val narrow = Sampling.hashSample(docs, col("doc_id"), 1, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wide = Sampling.hashSample(docs, col("doc_id"), 2, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(narrow.subsetOf(wide))
  }

  test("stratifiedSample: per-stratum rates, unlisted strata kept") {
    val out = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> (0, 1))) // drop all english
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("en"))
    assert(out("de") == 500L)
  }
}
