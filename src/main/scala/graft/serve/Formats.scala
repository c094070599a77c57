package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's HTTP result formats (S10 — `src/http/DataQueryFormat.ts:
  * 11-46`): `object` (JSON of `toObject()`), `protocol` (serialized message
  * array), `raw` (newline-delimited serialized). Here each format is a
  * narrow projection producing one string column — the serving layer streams
  * the rows out with `toLocalIterator`, so formatting work is distributed
  * while delivery stays incremental (the reference's header/delimiter/footer
  * framing is a serving-layer concern, not a plan concern).
  *
  * `content` is carried as the stored serialized string, exactly like the
  * reference's payload blob round-trip (`DataQueryFormat.ts:33-40` formats
  * re-serialize the stored message rather than re-encode content).
  */
object Formats {

  /** Minimal JSON string escaping (backslash, quote, newline, CR, tab) —
    * expressible identically in any engine's replace chain. */
  def jsonEscape(c: Column): Column =
    Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
      .foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** NTZ → epoch ms under the engine's NTZ-as-UTC convention. The cast
    * goes through the session timezone, which [[graft.GraftEngine]] and
    * every main pin to UTC — callers embedding Formats elsewhere must do
    * the same (a non-UTC session would shift every served timestamp). */
  private def epochMs(ts: Column): Column = unix_millis(ts.cast("timestamp"))

  /** Previous-message reference as a JSON fragment: `[epochMs,seq]`, or
    * the literal `null` for a chain-head message (prevMsgRef is nullable in
    * the reference contract, `Storage.test.ts:24-44`). Built with
    * when/otherwise because `concat` over a null child would null the whole
    * message string. */
  private def prevRefJson: Column =
    when(col("prev_ts").isNotNull,
      concat(lit("["), epochMs(col("prev_ts")), lit(","),
        col("prev_sequence_no"), lit("]")))
      .otherwise(lit("null"))

  /** Signature as a JSON fragment: quoted string or literal `null`. */
  private def signatureJson: Column =
    when(col("signature").isNotNull,
      concat(lit("\""), jsonEscape(col("signature")), lit("\"")))
      .otherwise(lit("null"))

  /** `object` format — the reference's `toObject()` JSON shape
    * (`DataQueryFormat.ts:33-36`), field order fixed. Serves the complete
    * stored envelope: prev-ref, encryption marker, and signature round-trip
    * verbatim (encrypted content is served as stored — the engine never
    * decrypts, `DataProduceEndpoints.ts:86-113`). */
  def objectJson: Column =
    concat(
      lit("{\"streamId\":\""), jsonEscape(col("stream_id")),
      lit("\",\"streamPartition\":"), col("stream_partition"),
      lit(",\"timestamp\":"), epochMs(col("ts")),
      lit(",\"sequenceNumber\":"), col("sequence_no"),
      lit(",\"publisherId\":\""), jsonEscape(col("publisher_id")),
      lit("\",\"msgChainId\":\""), jsonEscape(col("msg_chain_id")),
      lit("\",\"prevMsgRef\":"), prevRefJson,
      lit(",\"encryptionType\":"), col("encryption_type"),
      lit(",\"content\":\""), jsonEscape(col("payload")),
      lit("\",\"signatureType\":"), col("signature_type"),
      lit(",\"signature\":"), signatureJson,
      lit("}"))

  /** `protocol`/`raw` format — v31-shaped serialized array
    * `[version,[msgId...],prevRef,contentType,encryptionType,content,
    * sigType,signature]` (`FIXTURES.md §3`). Every envelope field comes
    * from the stored row — nothing is hardcoded, so signed and encrypted
    * messages round-trip exactly as the reference stores them. */
  def protocolJson: Column =
    concat(
      lit("[31,[\""), jsonEscape(col("stream_id")),
      lit("\","), col("stream_partition"),
      lit(","), epochMs(col("ts")),
      lit(","), col("sequence_no"),
      lit(",\""), jsonEscape(col("publisher_id")),
      lit("\",\""), jsonEscape(col("msg_chain_id")),
      lit("\"],"), prevRefJson,
      lit(",27,"), col("encryption_type"),
      lit(",\""), jsonEscape(col("payload")),
      lit("\","), col("signature_type"),
      lit(","), signatureJson,
      lit("]"))

  /** Apply a named format (`object` | `protocol` | `raw`) as the single
    * output column, mirroring `DataQueryFormat.getFormat`
    * (`DataQueryFormat.ts:43-46`; unknown names fall back to object like
    * the endpoint's 400 guard). `raw` and `protocol` differ only in HTTP
    * framing, which lives in the serving layer. */
  def format(messages: DataFrame, name: String): DataFrame = name match {
    case "protocol" | "raw" => messages.select(protocolJson.as("msg"))
    case _                  => messages.select(objectJson.as("msg"))
  }
}
