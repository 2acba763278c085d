package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * S8: staging catalog — enumerate the per-table staging produced by a run, read schemas,
 * list chunk files. The Spark form of the reference's DuckDB staging-table scan
 * (`get_extracted_tables()` / `get_table_schema(t)` / `get_table_chunks(t)`,
 * `db_components/db_common/staging.py:153-169,284-297`): staging "tables" are parquet
 * directories, "chunks" are their part files, and the union schema comes from
 * `mergeSchema` instead of NULL-padding SQL.
 *
 * All filesystem access goes through the Hadoop `FileSystem` API, so the staging root can
 * live on HDFS/S3/GCS on a real cluster, not just the local disk the tests use.
 */
object StagingCatalog {

  private def fs(root: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(conf), p)
  }

  private def hadoopConf(): Configuration =
    SparkSession.getActiveSession.map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def tables(stagingRoot: String): Seq[String] = {
    val (f, p) = fs(stagingRoot, hadoopConf())
    if (!f.exists(p)) return Nil
    // dot-prefixed dirs are internal plumbing (compact/retype scratch, swap asides) — a
    // crash mid-swap must never surface a leftover as a phantom output table
    f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
  }

  def table(spark: SparkSession, stagingRoot: String, name: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$stagingRoot/$name")

  def tableSchema(spark: SparkSession, stagingRoot: String, name: String): StructType =
    table(spark, stagingRoot, name).schema

  /** Chunk files of one staging table, name-sorted (= write order, like the reference's
    * `<table>_chunk_<n>` naming). */
  def chunks(stagingRoot: String, name: String): Seq[String] = {
    val (f, p) = fs(s"$stagingRoot/$name", hadoopConf())
    if (!f.exists(p)) return Nil
    f.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).sorted.toSeq
  }

  /**
   * Compact a staging table: per-micro-batch appends accumulate one small file per batch
   * per partition; long-running chained syncs degrade scans (file-open overhead dominates).
   * Rewrites the table to `targetFiles` parquet files under the merged schema, swapped in
   * safely. The small-file problem is THE operational failure mode of streaming ingestion
   * at scale; the reference sidesteps it only because DuckDB staging is a single local file.
   */
  def compact(spark: SparkSession, stagingRoot: String, name: String, targetFiles: Int = 1): Long = {
    val dir = s"$stagingRoot/$name"
    val tmp = s"$stagingRoot/.compact_$name"
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    df.repartition(targetFiles).write.mode("overwrite").parquet(tmp)
    val rows = spark.read.parquet(tmp).count()
    swapInto(spark, dir, tmp)
    rows
  }

  /**
   * Rewrite a staging table with columns cast to `types` (schema-drift type widening,
   * E2/E3): existing chunks were written at the narrower type, and parquet `mergeSchema`
   * cannot merge e.g. BIGINT with DOUBLE files — so history is rewritten once at the widen
   * point, keeping every chunk type-consistent. Widening is a rare drift event; the rewrite
   * cost is one pass over THAT table's staging, paid when the drift arrives.
   */
  def retype(spark: SparkSession, stagingRoot: String, name: String,
      types: Map[String, org.apache.spark.sql.types.DataType]): Unit = {
    val dir = s"$stagingRoot/$name"
    val (f, p) = fs(dir, spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p) || !f.getFileStatus(p).isDirectory) return
    import org.apache.spark.sql.functions.col
    val df = table(spark, stagingRoot, name)
    val casted = df.select(df.columns.map(c =>
      types.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))): _*)
    val tmp = s"$stagingRoot/.retype_$name"
    casted.write.mode("overwrite").parquet(tmp)
    swapInto(spark, dir, tmp)
  }

  /**
   * Replace `liveDir` with `tmpDir` safely: the live dir is first renamed ASIDE (so a crash
   * between steps leaves the data intact under the aside name, never deleted), tmp is moved
   * into place, and only then is the old data removed. Rename results are checked — a
   * failed rename restores the original and throws instead of silently losing the table.
   * Uses Hadoop renames: atomic on HDFS/local, emulated on object stores.
   */
  private[graft] def swapInto(spark: SparkSession, liveDir: String, tmpDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (f, live) = fs(liveDir, conf)
    val tmp = new Path(tmpDir)
    // dot-prefixed so a crash between renames leaves the old data invisible to tables()
    val aside = new Path(live.getParent, "." + live.getName + ".old_" + System.nanoTime())
    if (!f.rename(live, aside))
      throw new java.io.IOException(s"staging swap: rename $live aside failed; nothing lost")
    if (!f.rename(tmp, live)) {
      f.rename(aside, live) // restore
      throw new java.io.IOException(s"staging swap: rename $tmp into place failed; restored $live")
    }
    if (!f.delete(aside, true))
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn("staging swap: could not delete aside dir {}; harmless leftover", aside)
  }
}
