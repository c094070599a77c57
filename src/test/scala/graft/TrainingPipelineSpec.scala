package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.Sampling
import graft.text.TextAnalysis

/** End-to-end training-data pipeline composition: raw docs → exact dedup →
  * near-dup removal (MinHash LSH) → quality filter → language filter →
  * deterministic subsample. Each stage is one of the engine's operators;
  * the spec pins the surviving corpus exactly, so any stage regression
  * shows up as a concrete diff. */
class TrainingPipelineSpec extends SparkSpec {

  test("docs -> dedup -> near-dup -> quality -> sample pipeline") {
    val s = spark
    import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base, "en"),                     // kept
      (2L, base, "en"),                     // exact dup of 1 -> dropped
      (3L, base + " lambda", "en"),         // near-dup of 1 (LSH) -> dropped
      (4L, "one two three four five six seven eight nine ten", "en"), // kept
      (5L, "tiny", "en"),                   // quality: too short -> dropped
      (6L, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es")) // kept
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text").cast("long"))

    // 1. exact dedup (keep min doc_id)
    val exact = Dedup.exactDedup(docs)
    assert(exact.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L, 5L, 6L))

    // 2. near-dup removal: drop the higher doc_id of each LSH pair
    val nearDupLosers = Dedup.minhashLshPairs(exact)
      .filter($"est_sim" >= 0.5)
      .select($"doc_b".as("doc_id")).distinct()
    val deduped = exact.join(nearDupLosers, Seq("doc_id"), "left_anti")
    assert(deduped.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 4L, 5L, 6L))

    // 3. quality gate: at least 5 tokens
    val quality = deduped.join(
      TextAnalysis.stats(deduped).filter($"n_ws_tokens" >= 5).select("doc_id"),
      Seq("doc_id"), "left_semi")
    assert(quality.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 4L, 6L))

    // 4. deterministic stratified sample: drop all non-en
    val corpus = Sampling.stratifiedSample(quality, $"doc_id", $"lang",
      Map("es" -> (0, 1)))
    assert(corpus.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))

    // the pipeline is a single declarative plan end-to-end — no actions
    // between stages, so Catalyst optimizes across stage boundaries
    assert(corpus.queryExecution.optimizedPlan != null)
  }
}
