package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.serve.Formats

/** Scalar helper surface (SURVEY §2.7): timestamp parsing, stream-part key
  * strings, JSON access, and the MQTT non-JSON wrap. All composed from
  * codegen built-ins; ANSI-safe (numeric casts are guarded, so malformed
  * input yields null rather than a runtime error, like the reference's
  * 400-with-message paths). */
object Scalars {

  /** C2 — number-or-ISO-string → epoch-ms
    * (`DataProduceEndpoints.ts:25-40`): digit strings parse as epoch ms,
    * anything else goes through timestamp parsing (null when invalid). */
  def parseTimestampMs(c: Column): Column =
    // digit guard bounded to 18 digits: anything longer would overflow
    // long and throw under ANSI; it falls through to timestamp parsing
    // (null) instead
    when(c.rlike("^-?[0-9]{1,18}$"), c.cast("long"))
      .otherwise(unix_millis(try_to_timestamp(c)))

  /** C5 — `"{id}::{partition}"` key build/split
    * (`StorageConfig.ts:18-36`, `StreamStateManager.ts:6-8`). */
  def streamPartKey(streamId: Column, partition: Column): Column =
    concat_ws("::", streamId, partition)

  def keyStreamId(key: Column): Column = element_at(split(key, "::"), 1)

  def keyPartition(key: Column): Column = element_at(split(key, "::"), 2).cast("int")

  /** C4 — JSON field access over the stored payload (the engine keeps the
    * serialized form; access is on demand, `DataQueryFormat.ts:33-40`). */
  def payloadField(payload: Column, jsonPath: String): Column =
    get_json_object(payload, jsonPath)

  /** S8 — MQTT ingest wrap: non-JSON payloads become
    * `{"mqttPayload": <text>}` so the store only ever holds JSON
    * (`src/mqtt/MqttServer.ts:21-30`). */
  def mqttWrap(c: Column): Column =
    // the trim = 'null' disjunct covers the one valid-JSON root
    // get_json_object cannot represent (it returns SQL NULL for a JSON
    // null): the reference's JSON.parse accepts it unwrapped
    when(get_json_object(c, "$").isNotNull || trim(c) === "null", c)
      .otherwise(concat(lit("{\"mqttPayload\":\""), Formats.jsonEscape(c), lit("\"}")))
}
