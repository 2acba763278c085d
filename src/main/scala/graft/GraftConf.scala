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

  /**
   * Never use the bypass-merge shuffle writer. BypassMergeSortShuffleWriter opens (and
   * later merges + deletes) ONE FILE PER REDUCE PARTITION PER MAP TASK; with the r13
   * scan-parallelism floor raising map-task counts to the core count, a 32-map ×
   * 32-reduce shuffle paid 1024 tiny file create/merge/delete round-trips — jstack
   * sampling showed `FileOutputStream.open0` / `UnixFileSystem.delete0` inside
   * `BypassMergeSortShuffleWriter` dominating executor CPU (~200 ms fixed cost per
   * map task, guide §2.2's M×R block blow-up in local-disk form). The sort /
   * serialized writers buffer in memory and write ONE file + index per map task
   * regardless of R. Scale-neutral: bypass is only ever chosen when R ≤ the threshold
   * (default 200) — any production shuffle has R far above it, so this changes
   * nothing on a cluster; locally it converts M×R file I/O into M.
   */
  val BypassMergeThreshold = 1

  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      ObjectHashFallbackThreshold.toString)
      .config("spark.shuffle.sort.bypassMergeThreshold", BypassMergeThreshold.toString)
}
