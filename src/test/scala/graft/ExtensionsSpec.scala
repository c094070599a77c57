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
}
