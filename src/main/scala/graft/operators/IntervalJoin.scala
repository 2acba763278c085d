package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded interval (range) join: pair every left row with the right rows of the same key
 * whose time falls in `[l.time + lo, l.time + hi]` (inclusive) — "errors within a day
 * after each click", the bounded-window companion to [[AsOfJoin]]'s point-in-time lookup.
 *
 * Spark plans a naive `ON l.key = r.key AND r.t BETWEEN l.t+lo AND l.t+hi` as an equi-join
 * on the key with the range as a post-filter — every (left, right) pair under a key
 * materializes before filtering, O(|L|·|R|) per key. Here the range becomes part of the
 * JOIN KEY (the standard time-bucketing rewrite):
 *
 *  - right rows land in exactly ONE bucket of width `w = hi - lo` (`floor(t/w)`, computed
 *    in exact integer arithmetic — no fp boundary drift);
 *  - each left row explodes to the ≤ 2 buckets its window can touch
 *    (`floor((t+lo)/w) .. floor((t+hi)/w)`);
 *  - one hash exchange on `(keys, bucket)`, then the exact BETWEEN filter on the
 *    surviving pairs. Every true pair co-locates in the right row's bucket exactly once,
 *    so no dedup pass is needed.
 *
 * At 100 TB the exchange carries each right row once and each left row twice, and the
 * per-task pair work is bounded by bucket co-occupancy (window-local density), not key
 * cardinality. A key that is hot WITHIN one window still concentrates — the standard
 * salting composes on top, and AQE skew-join splits oversized partitions.
 *
 * Right columns (except the keys) are emitted as `<prefix><name>`; left columns pass
 * through unchanged.
 */
object IntervalJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      lo: Long,
      hi: Long,
      prefix: String = "r_"): DataFrame = {
    // lo == hi is the valid degenerate "exact offset" window — bucket width clamps to 1
    // (each left row still explodes to <= 2 buckets: the offset's and its neighbor's)
    require(hi >= lo, s"intervalJoin: empty window [$lo, $hi]")
    val w = math.max(hi - lo, 1L)
    // exact floor division for longs (pmod keeps it correct for negative times):
    // (t - (t mod w)) is exactly divisible, so the double division is exact below 2^53
    def fdiv(c: org.apache.spark.sql.Column) = ((c - pmod(c, lit(w))) / w).cast("long")

    val bucketCol = "__ij_bucket"
    require(!left.columns.contains(bucketCol), s"intervalJoin: left already has $bucketCol")
    val prefClash = right.columns.filterNot(keys.contains).map(prefix + _)
      .filter(left.columns.contains)
    require(prefClash.isEmpty,
      s"intervalJoin: left columns collide with prefixed right outputs: ${prefClash.mkString(",")}")

    val lb = left.withColumn(bucketCol,
      explode(sequence(fdiv(col(timeCol) + lo), fdiv(col(timeCol) + hi))))
    val rPref = right.columns.foldLeft(right)((d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, prefix + c))
    val rb = rPref.withColumn(bucketCol, fdiv(col(prefix + timeCol)))
    lb.join(rb, keys :+ bucketCol)
      .drop(bucketCol)
      .filter(col(prefix + timeCol) >= col(timeCol) + lo &&
        col(prefix + timeCol) <= col(timeCol) + hi)
  }
}
