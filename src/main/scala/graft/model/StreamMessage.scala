package graft.model

import org.apache.spark.sql.types._

/** The engine's canonical message-envelope row — the reference's
  * StreamMessage (`src/http/DataProduceEndpoints.ts:101-114`) flattened into
  * columns, with the serialized body kept as an opaque `payload` just like
  * the reference's Cassandra `stream_data` blob
  * (`src/storage/BatchManager.ts:8-14`).
  *
  * Logical order key within a stream-part: `(ts, sequence_no)` ascending;
  * uniqueness key `(stream_id, stream_partition, ts, sequence_no,
  * publisher_id, msg_chain_id)` (the reference's clustering columns,
  * `src/storage/Storage.ts:109-112`).
  */
final case class StreamMessage(
    stream_id: String,
    stream_partition: Int,
    ts: java.time.LocalDateTime, // TIMESTAMP_NTZ; epoch-ms in the reference
    sequence_no: Int,
    publisher_id: String,
    msg_chain_id: String,
    payload: String)

object StreamMessage {
  val schema: StructType = StructType(Seq(
    StructField("stream_id", StringType, nullable = false),
    StructField("stream_partition", IntegerType, nullable = false),
    StructField("ts", TimestampNTZType, nullable = false),
    StructField("sequence_no", IntegerType, nullable = false),
    StructField("publisher_id", StringType, nullable = false),
    StructField("msg_chain_id", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Columns forming the uniqueness/upsert key (dedup key on ingest). */
  val uniqueKey: Seq[String] =
    Seq("stream_id", "stream_partition", "ts", "sequence_no",
      "publisher_id", "msg_chain_id")
}
