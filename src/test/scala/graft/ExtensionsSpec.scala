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
}
