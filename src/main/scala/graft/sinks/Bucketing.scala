package graft.sinks

import org.apache.spark.sql.DataFrame

/**
 * Bucketed-table sink for co-located joins: write both sides of a recurring big join
 * bucketed (and sorted) by the join key, and every subsequent join between them is
 * exchange-free — the sort-merge join reads co-located buckets directly. This is the
 * standing answer to the reference's repeated per-run dedupe/merge passes at 100 TB:
 * pay the partitioning once at write time, not per query.
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted table at `path`, registered as `name`. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      keys: Seq[String], buckets: Int): Unit = {
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)
  }
}
