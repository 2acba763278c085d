package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * S8: staging catalog — enumerate the per-table staging produced by a run, read schemas,
 * list chunk files. The Spark form of the reference's DuckDB staging-table scan
 * (`get_extracted_tables()` / `get_table_schema(t)` / `get_table_chunks(t)`,
 * `db_components/db_common/staging.py:153-169,284-297`): staging "tables" are parquet
 * directories, "chunks" are their part files, and the union schema comes from
 * `mergeSchema` instead of NULL-padding SQL.
 */
object StagingCatalog {

  def tables(stagingRoot: String): Seq[String] = {
    val dir = new java.io.File(stagingRoot)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  def table(spark: SparkSession, stagingRoot: String, name: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$stagingRoot/$name")

  def tableSchema(spark: SparkSession, stagingRoot: String, name: String): StructType =
    table(spark, stagingRoot, name).schema

  /** Chunk files of one staging table, name-sorted (= write order, like the reference's
    * `<table>_chunk_<n>` naming). */
  def chunks(stagingRoot: String, name: String): Seq[String] = {
    val dir = new java.io.File(s"$stagingRoot/$name")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
  }
}
