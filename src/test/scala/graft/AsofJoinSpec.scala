package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  private def df(name: String, rows: Seq[(Long, Long, Long, Double)], valCols: (String, String)) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "tms", valCols._1, valCols._2)
  }

  private def leftOf(rows: (Long, Long, Long, Double)*) =
    df("l", rows, ("event_id", "value"))
  private def rightOf(rows: (Long, Long, Long, Double)*) =
    df("r", rows, ("purchase_id", "purchase_value"))

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsofJoin.asofBackward(l, r, keys = Seq("user_id"), ts = "tms",
      rightTie = "purchase_id", rightVals = Seq("purchase_id", "purchase_value"))
      .orderBy("event_id").collect()
      .map(row => (row.getAs[Long]("event_id"),
        Option(row.getAs[java.lang.Long]("purchase_id")).map(_.toLong)))
      .toSeq

  test("asofBackward: latest at-or-before right row per key, null when none") {
    val l = leftOf((1L, 100L, 10L, 1.0), (1L, 250L, 11L, 1.0), (2L, 100L, 12L, 1.0))
    val r = rightOf((1L, 90L, 900L, 5.0), (1L, 200L, 901L, 6.0), (3L, 50L, 902L, 7.0))
    assert(run(l, r) == Seq(
      (10L, Some(900L)),  // 90 <= 100 < 200
      (11L, Some(901L)),  // latest at 250 is 200
      (12L, None)))       // user 2 has no purchases
  }

  test("asofBackward: equal timestamp is inclusive; greatest tie among right rows wins") {
    val l = leftOf((1L, 100L, 10L, 1.0))
    val r = rightOf((1L, 100L, 900L, 5.0), (1L, 100L, 901L, 6.0))
    assert(run(l, r) == Seq((10L, Some(901L))))
  }

  test("asofBackward: plan shuffles once on the key — no range-join fan-out") {
    val l = leftOf((1L, 100L, 10L, 1.0))
    val r = rightOf((1L, 90L, 900L, 5.0))
    val plan = AsofJoin.asofBackward(l, r, Seq("user_id"), "tms",
      "purchase_id", Seq("purchase_id", "purchase_value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a product join:\n$plan")
  }

  test("asofForward: earliest at-or-after right row; smallest tie wins; null when none") {
    val l = leftOf((1L, 100L, 10L, 1.0), (1L, 300L, 11L, 1.0))
    val r = rightOf((1L, 100L, 902L, 5.0), (1L, 100L, 901L, 5.0), (1L, 200L, 903L, 6.0))
    val got = AsofJoin.asofForward(l, r, Seq("user_id"), "tms",
      "purchase_id", Seq("purchase_id", "purchase_value"))
      .orderBy("event_id").collect()
      .map(row => (row.getAs[Long]("event_id"),
        Option(row.getAs[java.lang.Long]("purchase_id")).map(_.toLong))).toSeq
    assert(got == Seq(
      (10L, Some(901L)),  // equal ts inclusive; smallest of the two ties
      (11L, None)))       // nothing at or after 300
  }

  test("asofBackward: null payload field rides with ITS row — no column tearing") {
    val s = spark
    import s.implicits._
    val l = leftOf((1L, 150L, 10L, 1.0))
    // newest right row has a NULL payload value; the older row must not
    // leak its value into the newest row's enrichment
    val r = Seq((1L, 90L, Some(900L), Some(5.0)), (1L, 100L, Some(901L), None))
      .toDF("user_id", "tms", "purchase_id", "purchase_value")
    val row = AsofJoin.asofBackward(l, r, Seq("user_id"), "tms",
      "purchase_id", Seq("purchase_id", "purchase_value")).collect().head
    assert(row.getAs[java.lang.Long]("purchase_id") == 901L)
    assert(row.getAs[java.lang.Double]("purchase_value") == null)
  }

  test("asofBackward rejects colliding left columns and a tie outside rightVals") {
    val l = leftOf((1L, 100L, 10L, 1.0)).withColumnRenamed("value", "purchase_value")
    val r = rightOf((1L, 90L, 900L, 5.0))
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(l, r, Seq("user_id"), "tms",
        "purchase_id", Seq("purchase_id", "purchase_value"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(leftOf((1L, 100L, 10L, 1.0)), r, Seq("user_id"), "tms",
        "tms", Seq("purchase_id", "purchase_value"))
    }
  }

  private def runNearest(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsofJoin.asofNearest(
      l, r.withColumn("purchase_tms", col("tms")),
      keys = Seq("user_id"), ts = "tms", rightTie = "purchase_id",
      rightVals = Seq("purchase_id", "purchase_value", "purchase_tms"),
      rightTs = "purchase_tms")
      .orderBy("event_id").collect()
      .map(row => (row.getAs[Long]("event_id"),
        Option(row.getAs[java.lang.Long]("purchase_id")).map(_.toLong),
        row.getAs[String]("matched_dir")))
      .toSeq

  test("asofNearest: closest side wins, backward on equal distance, null when no rights") {
    val l = leftOf(
      (1L, 100L, 10L, 1.0),   // back 90 (Δ10) vs fwd 200 (Δ100) -> backward
      (1L, 195L, 11L, 1.0),   // back 90 (Δ105) vs fwd 200 (Δ5)  -> forward
      (1L, 145L, 12L, 1.0),   // Δ55 both sides -> backward wins the tie
      (2L, 100L, 13L, 1.0))   // user 2 has no purchases
    val r = rightOf((1L, 90L, 900L, 5.0), (1L, 200L, 901L, 6.0))
    assert(runNearest(l, r) == Seq(
      (10L, Some(900L), "backward"),
      (11L, Some(901L), "forward"),
      (12L, Some(900L), "backward"),
      (13L, None, null)))
  }

  test("asofNearest: an exact-timestamp right row matches as backward") {
    val l = leftOf((1L, 100L, 10L, 1.0))
    val r = rightOf((1L, 100L, 900L, 5.0), (1L, 101L, 901L, 6.0))
    assert(runNearest(l, r) == Seq((10L, Some(900L), "backward")))
  }
}
