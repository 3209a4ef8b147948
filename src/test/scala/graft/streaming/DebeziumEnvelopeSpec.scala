package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import graft.TestSpark

/** Envelope-contract tests for [[DebeziumEnvelope.parse]]: op mapping,
  * image selection, ordering fallback, wrapped form, tombstone/junk
  * rejection. The end-to-end path (stage → stream → apply → live view)
  * is gated by `t12_debezium_cdc` against the DuckDB oracle. */
class DebeziumEnvelopeSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, v STRING")

  private def parse(lines: Seq[String], wrapped: Boolean = false) =
    DebeziumEnvelope.parse(lines.toDF("value"), "value", schema, wrapped)
      .as[(Option[Long], Option[String], String, Long, String)].collect()

  test("op mapping and image selection: c/r/u read after, d reads before") {
    val rows = parse(Seq(
      """{"before":null,"after":{"id":1,"v":"a"},"source":{"ts_ms":10,"table":"t","pos":100},"op":"c","ts_ms":11}""",
      """{"before":null,"after":{"id":2,"v":"b"},"source":{"ts_ms":20,"table":"t","pos":200},"op":"r","ts_ms":21}""",
      """{"before":{"id":3,"v":"old"},"after":{"id":3,"v":"new"},"source":{"ts_ms":30,"table":"t","pos":300},"op":"u","ts_ms":31}""",
      """{"before":{"id":4,"v":"gone"},"after":null,"source":{"ts_ms":40,"table":"t","pos":400},"op":"d","ts_ms":41}"""))
    assert(rows.toSet == Set(
      (Some(1L), Some("a"), "I", 100L, "t"),
      (Some(2L), Some("b"), "I", 200L, "t"), // snapshot read lands as I
      (Some(3L), Some("new"), "U", 300L, "t"), // update before-image discarded
      (Some(4L), Some("gone"), "D", 400L, "t"))) // delete image from before
  }

  test("ordering falls back to source.ts_ms when binlog pos is absent") {
    val rows = parse(Seq(
      """{"after":{"id":1,"v":"x"},"source":{"ts_ms":77,"table":"t"},"op":"c"}"""))
    assert(rows.toSeq == Seq((Some(1L), Some("x"), "I", 77L, "t")))
  }

  test("wrapped (schemas.enable) envelopes unwrap payload") {
    val rows = parse(Seq(
      """{"schema":{"type":"struct"},"payload":{"after":{"id":9,"v":"w"},"source":{"ts_ms":5,"table":"t","pos":50},"op":"c"}}"""),
      wrapped = true)
    assert(rows.toSeq == Seq((Some(9L), Some("w"), "I", 50L, "t")))
  }

  test("tombstones and non-JSON lines drop out") {
    val rows = parse(Seq(
      """{"before":null,"after":null}""", // Kafka compaction tombstone
      "not json at all",
      """{"after":{"id":1,"v":"ok"},"source":{"ts_ms":1,"table":"t","pos":1},"op":"c"}"""))
    assert(rows.length == 1 && rows.head._3 == "I")
  }
}
