package graft

import org.apache.spark.sql.SparkSession

/**
 * Session tuning shared by every graft entry point (Bench, Verify, CdcCli, tests).
 * Cluster deployments apply the same keys via spark-defaults.
 */
object GraftConf {

  /**
   * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` defaults to 128 in-memory
   * groups per task — after that, ObjectHashAggregate (the operator behind the
   * `LatestStruct`/`TopKByScore` aggregates) silently degrades to sort-based aggregation.
   * Real CDC dedupe has millions of primary keys, so the default falls back almost
   * immediately and pays a per-partition sort the plan string never shows (measured 1.5×
   * on 2M rows / 200k keys locally). 128k entries ≈ tens of MB of aggregation state per
   * task for row-sized buffers — well inside executor memory at 100 TB shapes — while
   * genuinely-huge per-task key counts still get the memory-safe fallback.
   */
  val ObjectHashFallbackThreshold = 128 * 1024

  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      ObjectHashFallbackThreshold.toString)
}
