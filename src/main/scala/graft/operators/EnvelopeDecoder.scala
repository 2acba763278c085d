package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.ConnectTypes
import graft.model.ConnectTypes.SchemaElement

/**
 * Kafka-Connect wire-envelope decoding: `{"schema":{"fields":[...]},"payload":{...}}` with
 * the event's own schema block driving typed decoding — the reference's actual input format
 * (`DbChangeConsumerTest.java:40-46`; parse `DbChangeConsumer.java:164-229`; value
 * conversion `AbstractDbConverter.java:93-131`).
 *
 * Two stages, mirroring §1.3a:
 *  1. wire parse — `from_json` with the RAW Connect types (epoch-day dates arrive as int32,
 *     epoch-millis timestamps as int64);
 *  2. logical decode — column conversions per logical name: `io.debezium.time.Date` →
 *     `date_add('1970-01-01', v)` (reference `LocalDate.ofEpochDay`, :105-108),
 *     `Timestamp` → `timestamp_millis(v)` UTC (:109-110), `ZonedTimestamp` →
 *     `to_timestamp`, bytes/arrays/structs ride through as text (§1.3 golden renderings).
 *
 * The schema block is parsed driver-side from a sample event (the reference caches one
 * schema per table and checks drift per event, E1 — here drift shows up as a new sample
 * parse on the next micro-batch).
 */
object EnvelopeDecoder {

  /** Parse a `schema` block's `fields` array into [[SchemaElement]]s (driver-side, using
    * Spark's bundled Jackson). */
  def parseSchemaElements(schemaJson: String): Seq[SchemaElement] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(schemaJson)
    val fields = if (root.has("fields")) root.get("fields") else root
    (0 until fields.size()).map { i =>
      val f = fields.get(i)
      SchemaElement(
        `type` = f.get("type").asText(),
        optional = !f.has("optional") || f.get("optional").asBoolean(),
        field = if (f.has("field")) f.get("field").asText() else "",
        name = if (f.has("name")) Some(f.get("name").asText()) else None,
        version = if (f.has("version")) Some(f.get("version").asInt()) else None)
    }
  }

  /** Raw wire type (pre-logical-decode): what `from_json` should parse the payload field as. */
  def wireType(e: SchemaElement): DataType = e.`type` match {
    case "int8" | "int16" | "int32" => IntegerType
    case "int64"                    => LongType
    case "float"                    => FloatType
    case "double"                   => DoubleType
    case "boolean"                  => BooleanType
    case _                          => StringType // string/bytes/array/struct ride as text
  }

  def wireStruct(elements: Seq[SchemaElement]): StructType =
    StructType(elements.map(e => StructField(e.field, wireType(e), nullable = e.optional)))

  /** Logical decode of one wire column per §1.3a. */
  def decodeColumn(c: Column, e: SchemaElement): Column = {
    val decoded =
      if (e.isDate) date_add(to_date(lit("1970-01-01")), c)            // epoch-day int
      else if (e.isTimestamp) timestamp_millis(c.cast(LongType))       // epoch-millis, UTC
      else if (e.isZonedTs) to_timestamp(c)                            // ISO text with zone
      else c                                                           // uuid/interval/bytes/json: text
    decoded.as(e.field)
  }

  /** Decode a DataFrame of raw envelope JSON strings (`valueCol`) whose payloads follow
    * `elements`; emits one typed column per element (+ passthrough columns). */
  def decodePayload(df: DataFrame, valueCol: String, elements: Seq[SchemaElement],
      payloadPath: String = "payload", passthrough: Seq[String] = Nil): DataFrame = {
    val envelope = StructType(Seq(StructField(payloadPath, wireStruct(elements))))
    df.select((passthrough.map(col) :+
        from_json(col(valueCol), envelope).getField(payloadPath).as("__p")): _*)
      .select(passthrough.map(col) ++
        elements.map(e => decodeColumn(col(s"__p.`${e.field}`"), e)): _*)
  }

  /** Final Spark schema after logical decode (for manifests / drift bookkeeping). */
  def decodedStruct(elements: Seq[SchemaElement]): StructType =
    ConnectTypes.toStructType(elements)
}
