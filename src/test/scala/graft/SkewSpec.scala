package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join on a skewed key distribution") {
    val s = spark
    import s.implicits._
    // 1000 rows of one hot key + a long tail
    val large = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"key-$i", i.toLong))).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"key-$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim-$i") }.toDF("k", "name")

    val plain = large.join(small, Seq("k"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, Seq("k"), buckets = 8,
      saltCols = Seq("v"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.count(_.head == "hot") == 1000)
  }

  test("saltedAgg equals plain aggregation") {
    val s = spark
    import s.implicits._
    val df = ((1 to 500).map(i => ("hot", i.toLong)) ++
      Seq(("cold", 7L), ("cold", 3L))).toDF("k", "v")
    val got = Skew.saltedAgg(df, Seq("k"), buckets = 8, saltCols = Seq("v"),
      agg = sum(col("v")), merge = c => sum(c), as = "total")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> (1 to 500).map(_.toLong).sum, "cold" -> 10L))
  }

  test("gini: exact rank identity over the value histogram, with ties") {
    val s = spark
    import s.implicits._
    // values 1,1,2,4: ranks 1..4, 2*sum(rank*x) = 2*(1+2+6+16) = 50
    // G = (50 - 5*8) / (4*8) = 0.3125
    val got = graft.operators.RobustStats.gini(
      Seq(1L, 1L, 2L, 4L).toDF("v"), col("v")).collect()(0)
    assert(got.getAs[Long]("n") == 4L)
    assert(got.getAs[Double]("sum_value") == 8.0)
    assert(got.getAs[Double]("gini") == 0.3125)
    // uniform values: G exactly 0
    val uni = graft.operators.RobustStats.gini(
      Seq(5L, 5L, 5L).toDF("v"), col("v")).collect()(0)
    assert(uni.getAs[Double]("gini") == 0.0)
  }
}
