package graft

import org.apache.spark.sql.types._
import graft.operators.EnvelopeDecoder

/** Connect wire-envelope decoding per the reference's unit fixtures (FIXTURES.md §4 shapes):
  * a schema block with logical names drives typed decoding of the payload. */
class EnvelopeDecoderSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{"fields":[
      |  {"type":"int32","optional":false,"field":"id"},
      |  {"type":"string","optional":true,"field":"name"},
      |  {"type":"int32","optional":true,"field":"created","name":"io.debezium.time.Date"},
      |  {"type":"int64","optional":true,"field":"updated_at","name":"io.debezium.time.Timestamp"},
      |  {"type":"string","optional":true,"field":"uid","name":"io.debezium.data.Uuid"},
      |  {"type":"double","optional":true,"field":"weight"}
      |]}""".stripMargin

  test("schema block parses to SchemaElements with logical names") {
    val els = EnvelopeDecoder.parseSchemaElements(schemaJson)
    assert(els.map(_.field) == Seq("id", "name", "created", "updated_at", "uid", "weight"))
    assert(!els.head.optional && els(1).optional)
    assert(els(2).isDate && els(3).isTimestamp && els(4).isUuid)
    // decoded Spark schema per §1.3a
    val st = EnvelopeDecoder.decodedStruct(els)
    assert(st("created").dataType == DateType)
    assert(st("updated_at").dataType == TimestampType)
    assert(st("uid").dataType == StringType)
  }

  test("wire parse + logical decode: epoch-day date, epoch-millis UTC timestamp") {
    val els = EnvelopeDecoder.parseSchemaElements(schemaJson)
    // 19000 epoch days = 2022-01-08; 1710349868992 ms = 2024-03-13 17:11:08.992 UTC
    val events = Seq(
      """{"payload":{"id":122,"name":"ccc","created":19000,"updated_at":1710349868992,"uid":"0f4","weight":100.5}}""",
      """{"payload":{"id":123,"name":null,"created":null,"updated_at":null,"uid":null,"weight":null}}"""
    ).toDF("value")
    val out = EnvelopeDecoder.decodePayload(events, "value", els).orderBy("id").collect()
    assert(out(0).getAs[Int]("id") == 122)
    assert(out(0).getAs[java.sql.Date]("created").toString == "2022-01-08")
    assert(out(0).getAs[java.sql.Timestamp]("updated_at").toInstant.toString == "2024-03-13T17:11:08.992Z")
    assert(out(0).getAs[Double]("weight") == 100.5)
    assert(out(1).isNullAt(out(1).fieldIndex("created")) && out(1).isNullAt(out(1).fieldIndex("updated_at")))
  }

  test("schema drift: extended schema decodes old events with NULL backfill (E1/E2)") {
    val els = EnvelopeDecoder.parseSchemaElements(schemaJson)
    val extended = els :+ graft.model.ConnectTypes.SchemaElement(
      "int64", optional = true, field = "timestamp_col", name = Some("io.debezium.time.Timestamp"))
    val oldEvent = Seq("""{"payload":{"id":1,"name":"a"}}""").toDF("value")
    val out = EnvelopeDecoder.decodePayload(oldEvent, "value", extended).collect().head
    assert(out.getAs[Int]("id") == 1)
    assert(out.isNullAt(out.fieldIndex("timestamp_col")))
  }
}
