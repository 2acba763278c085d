package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: multi-dimensional clustering for scan pruning.
 *
 * Z-ordering (Morton order) interleaves the bits of two (or more) columns so that rows
 * close in EITHER dimension land close in the one-dimensional sort order — the layout
 * trick behind multi-dimensional data skipping (Delta/Iceberg OPTIMIZE ZORDER): after
 * `repartitionByRange(zvalue)` every output file covers a tight bounding box in ALL
 * z-ordered dimensions, so a predicate on any of them prunes files by min/max stats
 * instead of reading the full table. A single-column sort gives that pruning for one
 * dimension only; Z-order pays a small widening of each box to buy it for all of them.
 *
 * Scale: the z-value is a per-row codegen'd bit-shuffle (narrow map); the layout write
 * is ONE range repartition (sampled boundaries — Spark's RangePartitioner, no global
 * sort on a single node) + an in-partition sort that parquet's min/max row-group stats
 * then capture. 100 TB of events re-clusters with exactly one shuffle.
 */
object LayoutOps {

  /**
   * Morton z-value of two non-negative ints using `bits` bits each (result has 2·bits
   * bits; `a`'s bits land at odd positions). Pure shift/mask arithmetic — whole-stage
   * codegen, replayable in any engine.
   */
  def zValue(a: Column, b: Column, bits: Int = 8): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        (shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i + 1)) +
        (shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i))
    }

  /**
   * Re-cluster a frame on the z-order of two dimension columns: range-partition on the
   * z-value into `nParts` output partitions (≈ files on write) and sort within each, so
   * every partition covers a contiguous z-range = a tight (a, b) bounding box.
   */
  def zorderRepartition(df: DataFrame, aCol: String, bCol: String, nParts: Int,
      bits: Int = 8): DataFrame = {
    val z = zValue(col(aCol), col(bCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nParts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /**
   * Hilbert-curve twin of [[zorderRepartition]]: range-partition on the Hilbert
   * distance of two dimension columns. The Hilbert curve's strict adjacency (every
   * consecutive index is a grid neighbor — Morton order jumps 2^k cells at quadrant
   * boundaries) gives measurably tighter per-file bounding boxes, i.e. better
   * min/max skipping for the same single shuffle.
   */
  def hilbertRepartition(df: DataFrame, aCol: String, bCol: String, nParts: Int,
      bits: Int = 8): DataFrame = {
    val h = graft.functions.LayoutFunctions
      .hilbertIndex(col(aCol), col(bCol), bits).as("__h")
    df.withColumn("__h", h)
      .repartitionByRange(nParts, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /**
   * Per-partition bounding-box stats of the CURRENT layout (what parquet min/max file
   * stats would record): one row per physical partition with min/max of both dims. The
   * skipping win of a layout is read directly off this frame — e.g. the expected
   * fraction of partitions a point predicate on `aCol` touches is
   * `avg(max_a - min_a) / (global max_a - min_a)`.
   */
  def partitionBounds(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.select(spark_partition_id().as("pid"), col(aCol).as("a"), col(bCol).as("b"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
}
