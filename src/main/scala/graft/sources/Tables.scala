package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata plus the canonical events→stream_data
  * mapping (FIXTURES.md §5). The mapping is mirrored 1:1 by [[Tables.StreamDataSql]]
  * so every Spark query has a DuckDB-oracle twin over the same parquet.
  */
object Tables {

  /** events.parquet carries INT64 TIMESTAMP(NANOS) which Spark only reads
    * via the nanosAsLong legacy flag; convert to microsecond precision with
    * integral division (double division would lose precision above 2^53).
    * DuckDB likewise truncates its TIMESTAMP_NS to microseconds on
    * CAST(ts AS TIMESTAMP), so both engines see identical values.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/customer.parquet")

  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/supplier.parquet")

  def part(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet")

  def nation(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/nation.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/region.parquet")

  /** The `events` table viewed as the reference's `stream_data` fact table
    * (schema: FIXTURES.md §1): stream-part = (event_type, user_id mod 8),
    * deterministic sequence/publisher/chain derivations, payload = props.
    */
  def streamData(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("event_type").as("stream_id"),
      (col("user_id") % 8).cast("int").as("stream_partition"),
      col("ts"),
      (col("event_id") % 16).cast("int").as("sequence_no"),
      concat(lit("pub-"), (col("user_id") % 4).cast("string")).as("publisher_id"),
      (col("user_id") % 2).cast("string").as("msg_chain_id"),
      col("props").as("payload"))

  /** DuckDB CTE computing the identical stream_data relation from raw
    * `events` — prepended to every broker-query oracle. */
  val StreamDataSql: String =
    """WITH stream_data AS (
      |  SELECT event_type AS stream_id,
      |         CAST(user_id % 8 AS INT) AS stream_partition,
      |         CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(event_id % 16 AS INT) AS sequence_no,
      |         'pub-' || CAST(user_id % 4 AS VARCHAR) AS publisher_id,
      |         CAST(user_id % 2 AS VARCHAR) AS msg_chain_id,
      |         props AS payload
      |  FROM events
      |)""".stripMargin
}
