package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import graft.sources.Tables

/** Guards for the testdata readers — in particular the events.ts dual
  * encoding: the nanos→micros division must only ever run on a column the
  * parquet footer actually annotates TIMESTAMP(NANOS). */
class TablesSpec extends SparkSpec {
  private val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("events(): ts lands as TIMESTAMP_NTZ on the shipped generation") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampNTZType)
    assert(ev.limit(5).count() > 0)
  }

  test("events(): plain-INT64 ts (no nanos annotation) fails loudly, not silently") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_tables_spec").toString
    // Spark writes LongType as unannotated INT64 — exactly the ambiguous
    // surface the footer check exists to reject
    Seq((1L, 1723500000000000L, "ev", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, tmp))
    assert(e.getMessage.contains("TIMESTAMP(NANOS)"))
  }
}
