package graft

import org.apache.spark.sql.functions._

import graft.functions.Scalars

class ScalarsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    spark.range(1).select(c).collect().head

  test("parseTimestampMs: digits, ISO, invalid (DataProduceEndpoints.ts:25-40)") {
    assert(one(Scalars.parseTimestampMs(lit("1545144750494"))).getLong(0) == 1545144750494L)
    assert(one(Scalars.parseTimestampMs(lit("2018-12-18T14:52:30"))).getLong(0) == 1545144750000L)
    assert(one(Scalars.parseTimestampMs(lit("not a time"))).isNullAt(0))
    assert(one(Scalars.parseTimestampMs(lit("-5"))).getLong(0) == -5L)
  }

  test("stream-part key build/split roundtrip (StorageConfig.ts:18-36)") {
    val r = one(struct(
      Scalars.keyStreamId(Scalars.streamPartKey(lit("my-stream"), lit(7))),
      Scalars.keyPartition(Scalars.streamPartKey(lit("my-stream"), lit(7)))))
      .getStruct(0)
    assert(r.getString(0) == "my-stream" && r.getInt(1) == 7)
  }

  test("mqttWrap: JSON passes through, text wraps, quotes escape (MqttServer.ts:21-30)") {
    assert(one(Scalars.mqttWrap(lit("""{"a":1}"""))).getString(0) == """{"a":1}""")
    assert(one(Scalars.mqttWrap(lit("hello"))).getString(0) == """{"mqttPayload":"hello"}""")
    assert(one(Scalars.mqttWrap(lit("say \"hi\""))).getString(0) ==
      """{"mqttPayload":"say \"hi\""}""")
    // the one JSON root get_json_object can't represent: JSON.parse
    // accepts a bare null, so it must pass through unwrapped
    assert(one(Scalars.mqttWrap(lit("null"))).getString(0) == "null")
    assert(one(Scalars.mqttWrap(lit(" null "))).getString(0) == " null ")
  }

  test("mqttWrap escapes ALL control characters to valid JSON (RFC 8259)") {
    // short forms for \b \t \n \f \r, \u00xx for the rest — the store's
    // "only ever holds JSON" invariant requires every one escaped
    assert(one(Scalars.mqttWrap(lit(s"a${1.toChar}b"))).getString(0) ==
      "{\"mqttPayload\":\"a\\" + "u0001b\"}")
    assert(one(Scalars.mqttWrap(lit("a\bb\fc"))).getString(0) ==
      """{"mqttPayload":"a\bb\fc"}""")
    (0 until 0x20).foreach { i =>
      val wrapped = one(Scalars.mqttWrap(lit(s"x${i.toChar}y"))).getString(0)
      assert(!wrapped.exists(_ < 0x20), s"raw control char 0x$i%02x survives")
      // and it must parse back to the original content
      assert(one(org.apache.spark.sql.functions.get_json_object(
        lit(wrapped), "$.mqttPayload")).getString(0) == s"x${i.toChar}y",
        s"round-trip failed for 0x$i")
    }
  }

  test("payloadField extracts stored JSON fields") {
    assert(one(Scalars.payloadField(lit("""{"k": 69}"""), "$.k")).getString(0) == "69")
    assert(one(Scalars.payloadField(lit("""{"k": 69}"""), "$.missing")).isNullAt(0))
  }
}
