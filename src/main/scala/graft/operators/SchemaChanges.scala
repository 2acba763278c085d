package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * E6: DDL / schema-changes side output (MySQL connector emits
 * `io.debezium.connector.mysql.SchemaChangeValue` records). Fixed schema + composite pk
 * `(ts_ms, databaseName, schemaName, ddl)`, always loaded incrementally.
 * Reference: `db_components/debezium/common.py:4-29`; handling
 * `ex_mysql_cdc/src/component.py:350-351,418-420,462-463`.
 */
object SchemaChanges {

  val TableName = "io_debezium_connector_mysql_SchemaChangeValue"

  val Schema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("ts_ms", LongType),
    StructField("databaseName", StringType),
    StructField("schemaName", StringType),
    StructField("ddl", StringType),
    StructField("tableChanges", StringType),
    StructField("KBC__BATCH_EVENT_ORDER", LongType)))

  val PrimaryKey: Seq[String] = Seq("ts_ms", "databaseName", "schemaName", "ddl")

  /**
   * Extract DDL events from a raw spool batch `(value STRING, pos LONG)`: any event whose
   * payload carries a `ddl` field is a schema-change record; `source`/`tableChanges`
   * ride through as JSON text (the reference stores them as serialized strings too).
   */
  def fromSpool(batch: DataFrame): DataFrame =
    batch
      .filter(get_json_object(col("value"), "$.ddl").isNotNull)
      .select(
        get_json_object(col("value"), "$.source").as("source"),
        get_json_object(col("value"), "$.source.ts_ms").cast(LongType).as("ts_ms"),
        get_json_object(col("value"), "$.databaseName").as("databaseName"),
        get_json_object(col("value"), "$.schemaName").as("schemaName"),
        get_json_object(col("value"), "$.ddl").as("ddl"),
        get_json_object(col("value"), "$.tableChanges").as("tableChanges"),
        col("pos").as("KBC__BATCH_EVENT_ORDER"))
}
