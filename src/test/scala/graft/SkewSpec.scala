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
}
