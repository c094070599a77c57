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

  /** `object` format — the reference's `toObject()` JSON shape
    * (`DataQueryFormat.ts:33-36`), field order fixed. */
  def objectJson: Column =
    concat(
      lit("{\"streamId\":\""), jsonEscape(col("stream_id")),
      lit("\",\"streamPartition\":"), col("stream_partition"),
      lit(",\"timestamp\":"), epochMs(col("ts")),
      lit(",\"sequenceNumber\":"), col("sequence_no"),
      lit(",\"publisherId\":\""), jsonEscape(col("publisher_id")),
      lit("\",\"msgChainId\":\""), jsonEscape(col("msg_chain_id")),
      lit("\",\"content\":\""), jsonEscape(col("payload")),
      lit("\"}"))

  /** `protocol`/`raw` format — v31-shaped serialized array
    * `[version,[msgId...],prevRef,contentType,encryptionType,content,
    * sigType,signature]` (`FIXTURES.md §3`; prevRef/signature not stored in
    * the fact table ⇒ null, matching a no-signature deployment). */
  def protocolJson: Column =
    concat(
      lit("[31,[\""), jsonEscape(col("stream_id")),
      lit("\","), col("stream_partition"),
      lit(","), epochMs(col("ts")),
      lit(","), col("sequence_no"),
      lit(",\""), jsonEscape(col("publisher_id")),
      lit("\",\""), jsonEscape(col("msg_chain_id")),
      lit("\"],null,27,0,\""), jsonEscape(col("payload")),
      lit("\",0,null]"))

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
