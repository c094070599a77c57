package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata plus the canonical events→stream_data
  * mapping (FIXTURES.md §5). The mapping is mirrored 1:1 by [[Tables.StreamDataSql]]
  * so every Spark query has a DuckDB-oracle twin over the same parquet.
  */
object Tables {

  /** events.parquet has shipped with two `ts` encodings across testdata
    * generations: INT64 TIMESTAMP(NANOS) — which Spark surfaces as a plain
    * long under the nanosAsLong legacy flag, converted here to microsecond
    * precision with integral division (double division would lose precision
    * above 2^53) — and plain TIMESTAMP(MICROS, isAdjustedToUTC=false),
    * which Spark reads as TIMESTAMP_NTZ directly. Branch on the physical
    * type so both generations produce the identical TIMESTAMP_NTZ column;
    * DuckDB's CAST(ts AS TIMESTAMP) lands on the same microsecond values
    * either way.
    *
    * A LongType surface is ambiguous on its own — under the nanosAsLong
    * legacy flag it means TIMESTAMP(NANOS), but a plain (unannotated)
    * INT64 ts would surface identically and be silently misread by the
    * div-1000 conversion. So the LongType branch re-reads the parquet
    * footer's logical-type annotation and fails loudly unless it really
    * is nanos-annotated.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val raw = spark.read.parquet(path)
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        requireNanosAnnotation(spark, path)
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    raw.withColumn("ts", ts.cast("timestamp_ntz"))
  }

  /** Footer-only check (no data I/O): the `ts` column of the first parquet
    * footer under `path` must carry a TIMESTAMP(NANOS) logical-type
    * annotation — the only case the int64→micros division is valid for. */
  private def requireNanosAnnotation(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).map(_.getPath)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .sortBy(_.getName).headOption
        .getOrElse(throw new IllegalStateException(s"no parquet files under $path"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    val annotation =
      try reader.getFooter.getFileMetaData.getSchema
        .getType(Seq("ts"): _*).asPrimitiveType().getLogicalTypeAnnotation
      finally reader.close()
    annotation match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
          if t.getUnit == TimeUnit.NANOS => ()
      case other => throw new IllegalStateException(
        s"events.ts surfaced as INT64 but its parquet logical type is " +
          s"${Option(other).getOrElse("<none>")} — expected TIMESTAMP(NANOS); " +
          "refusing the nanos→micros division rather than misreading it")
    }
  }

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
    *
    * The envelope fields the driver testdata lacks are derived
    * deterministically so every downstream operator (store, serve formats,
    * dedup) carries the full reference contract
    * (`src/http/DataProduceEndpoints.ts:86-113`): prev-ref present for
    * every non-chain-head message, a 1-in-16 AES-encrypted slice carrying
    * its group-key id (1 in 10 of those also rotating the key in-band, the
    * v32 `newGroupKey` slot), mostly ETH signatures with a legacy minority,
    * and an md5-derived hex signature over the message id — all expressed
    * identically in [[StreamDataSql]] so the oracle sees the same bytes. */
  def streamData(spark: SparkSession, sfDir: String): DataFrame = {
    val seqNo = (col("event_id") % 16).cast("int")
    val pub = concat(lit("pub-"), (col("user_id") % 4).cast("string"))
    val groupKeyId = when(col("event_id") % 16 === 0,
      concat(lit("GK-"), col("event_type"), lit("-"), pub))
    events(spark, sfDir).select(
      col("event_type").as("stream_id"),
      (col("user_id") % 8).cast("int").as("stream_partition"),
      col("ts"),
      seqNo.as("sequence_no"),
      pub.as("publisher_id"),
      (col("user_id") % 2).cast("string").as("msg_chain_id"),
      col("props").as("payload"),
      when(seqNo > 0, col("ts") - expr("INTERVAL 1 SECOND")).as("prev_ts"),
      when(seqNo > 0, seqNo - 1).cast("int").as("prev_sequence_no"),
      when(col("event_id") % 16 === 0, 2).otherwise(0).cast("int").as("encryption_type"),
      groupKeyId.as("group_key_id"),
      when(col("event_id") % 160 === 0, md5(concat(lit("rot:"), groupKeyId)))
        .as("new_group_key"),
      when(col("event_id") % 10 === 0, 1).otherwise(2).cast("int").as("signature_type"),
      concat(lit("0x"), md5(concat_ws(":",
        col("event_type"),
        unix_millis(col("ts").cast("timestamp")).cast("string"),
        seqNo.cast("string"),
        pub))).as("signature"))
  }

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
      |         props AS payload,
      |         CASE WHEN event_id % 16 > 0
      |              THEN CAST(ts AS TIMESTAMP) - INTERVAL 1 SECOND END AS prev_ts,
      |         CASE WHEN event_id % 16 > 0
      |              THEN CAST(event_id % 16 - 1 AS INT) END AS prev_sequence_no,
      |         CAST(CASE WHEN event_id % 16 = 0 THEN 2 ELSE 0 END AS INT) AS encryption_type,
      |         CASE WHEN event_id % 16 = 0
      |              THEN 'GK-' || event_type || '-pub-' || CAST(user_id % 4 AS VARCHAR)
      |         END AS group_key_id,
      |         CASE WHEN event_id % 160 = 0
      |              THEN md5('rot:GK-' || event_type || '-pub-' || CAST(user_id % 4 AS VARCHAR))
      |         END AS new_group_key,
      |         CAST(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 2 END AS INT) AS signature_type,
      |         '0x' || md5(event_type || ':' ||
      |           CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS VARCHAR) || ':' ||
      |           CAST(event_id % 16 AS VARCHAR) || ':' ||
      |           'pub-' || CAST(user_id % 4 AS VARCHAR)) AS signature
      |  FROM events
      |)""".stripMargin
}
