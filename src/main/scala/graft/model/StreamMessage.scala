package graft.model

import org.apache.spark.sql.types._

/** The engine's canonical message-envelope row — the reference's
  * StreamMessage (`src/http/DataProduceEndpoints.ts:86-114`) flattened into
  * columns, with the serialized body kept as an opaque `payload` just like
  * the reference's Cassandra `stream_data` blob
  * (`src/storage/BatchManager.ts:8-14`).
  *
  * Logical order key within a stream-part: `(ts, sequence_no)` ascending;
  * uniqueness key `(stream_id, stream_partition, ts, sequence_no,
  * publisher_id, msg_chain_id)` (the reference's clustering columns,
  * `src/storage/Storage.ts:109-112`).
  *
  * The trailing envelope fields complete the reference's wire contract
  * (`test/integration/storage/Storage.test.ts:24-44`): the previous-message
  * reference used for gap detection (`prev_ts`/`prev_sequence_no`, nullable
  * — first message of a chain has none), the content encryption marker
  * (`encryption_type`: 0 = NONE, 1 = RSA, 2 = AES), the AES group-key
  * envelope of the v32 wire format (`group_key_id` identifies the key that
  * encrypted the content; `new_group_key` carries an in-band key rotation —
  * both null for unencrypted rows), and the message signature
  * (`signature_type`: 0 = none, 1 = legacy, 2 = ETH; `signature` nullable
  * hex string). They are stored and served verbatim — the engine never
  * interprets or resolves them, exactly like the reference's storage node.
  */
final case class StreamMessage(
    stream_id: String,
    stream_partition: Int,
    ts: java.time.LocalDateTime, // TIMESTAMP_NTZ; epoch-ms in the reference
    sequence_no: Int,
    publisher_id: String,
    msg_chain_id: String,
    payload: String,
    prev_ts: Option[java.time.LocalDateTime] = None,
    prev_sequence_no: Option[Int] = None,
    encryption_type: Int = 0,
    group_key_id: Option[String] = None,
    new_group_key: Option[String] = None,
    signature_type: Int = 0,
    signature: Option[String] = None)

object StreamMessage {
  val schema: StructType = StructType(Seq(
    StructField("stream_id", StringType, nullable = false),
    StructField("stream_partition", IntegerType, nullable = false),
    StructField("ts", TimestampNTZType, nullable = false),
    StructField("sequence_no", IntegerType, nullable = false),
    StructField("publisher_id", StringType, nullable = false),
    StructField("msg_chain_id", StringType, nullable = false),
    StructField("payload", StringType, nullable = false),
    StructField("prev_ts", TimestampNTZType, nullable = true),
    StructField("prev_sequence_no", IntegerType, nullable = true),
    StructField("encryption_type", IntegerType, nullable = false),
    StructField("group_key_id", StringType, nullable = true),
    StructField("new_group_key", StringType, nullable = true),
    StructField("signature_type", IntegerType, nullable = false),
    StructField("signature", StringType, nullable = true)))

  /** Columns forming the uniqueness/upsert key (dedup key on ingest). */
  val uniqueKey: Seq[String] =
    Seq("stream_id", "stream_partition", "ts", "sequence_no",
      "publisher_id", "msg_chain_id")
}
