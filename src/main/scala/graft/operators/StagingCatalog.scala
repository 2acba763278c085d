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

  /**
   * Compact a staging table: per-micro-batch appends accumulate one small file per batch
   * per partition; long-running chained syncs degrade scans (file-open overhead dominates).
   * Rewrites the table to `targetFiles` parquet files under the merged schema, atomically
   * (write to a sibling dir, then swap). The small-file problem is THE operational failure
   * mode of streaming ingestion at scale; the reference sidesteps it only because DuckDB
   * staging is a single local file.
   */
  def compact(spark: SparkSession, stagingRoot: String, name: String, targetFiles: Int = 1): Long = {
    val dir = s"$stagingRoot/$name"
    val tmp = s"$stagingRoot/.compact_$name"
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    df.repartition(targetFiles).write.mode("overwrite").parquet(tmp)
    val rows = spark.read.parquet(tmp).count()
    val old = new java.io.File(dir)
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete); f.delete()
    }
    delete(old)
    new java.io.File(tmp).renameTo(old)
    rows
  }
}
