package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * Iterative graph algorithms as plain DataFrame plans — no GraphX (RDD-era, no Catalyst)
 * and no driver-side adjacency: edges stay a distributed table, every iteration is a
 * join + aggregate that AQE re-plans, and vertex state is one row per node.
 *
 * Connected components live in [[DedupOps]] (O(diameter) checkpointed rounds); here is
 * the weighted-influence side of the family.
 */
object GraphOps {

  /**
   * Fixed-iteration PageRank (Brin & Page 1998, simplified: dangling mass not
   * redistributed — every node of the kNN use-case has out-degree ≥ 1) in PURE
   * FIXED-POINT arithmetic: ranks are BIGINT units of 1e-12, the per-edge contribution
   * is integer floor division `r // deg`, the update is
   * `teleportUnits//N + (dampingPct·Σ)//100` — no floating point ANYWHERE, so every
   * engine reproduces the iteration bit-for-bit. (A double-then-quantize formulation
   * fails cross-engine here BY CONSTRUCTION: `r/deg` with small power-of-two degrees
   * lands exactly on quantization half-boundaries, where Java's shortest-repr HALF_UP
   * and a binary-value scaling round differently — measured 50-80 mismatched nodes per
   * run before the integer rewrite.)
   *
   * Scale: per iteration one shuffle of (dst, long) digests + a node-keyed aggregate;
   * vertex state is |V| rows, edges never touch the driver. The fixed iteration count
   * keeps the plan finite; at cluster scale each iteration's result would be
   * checkpointed to cut lineage (like [[DedupOps]]' CC rounds).
   *
   * @param edges      directed (src, dst) rows; multi-edges count once per row
   * @param dampingPct damping factor in percent (85 = the canonical 0.85)
   * @return (id, rank_e12) — rank in 1e-12 units; Σ rank ≈ 1e12 minus floor loss
   */
  def pageRank(edges: DataFrame, iters: Int = 3, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct > 0 && dampingPct < 100)
    val Scale = 1000000000000L
    val teleportUnits = Scale / 100 * (100 - dampingPct)
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val nCnt = broadcast(nodes.agg(count(lit(1)).as("__n")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    var ranks = nodes.crossJoin(nCnt)
      .select(col("id"), expr(s"$Scale div __n").as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("id"))
        .join(deg, "src")
        .select(col("dst"), expr("r div __deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("__s"))
      ranks = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .crossJoin(nCnt)
        .select(nodes("id"),
          expr(s"($teleportUnits div __n) + (($dampingPct * coalesce(__s, 0L)) div 100)")
            .as("r"))
    }
    ranks.select(col("id"), col("r").as("rank_e12"))
  }
}
