package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream joins with bounded state — the streaming counterparts of the batch
 * operators in [[graft.operators.IntervalJoin]] / [[graft.operators.AsOfJoin]].
 */
object StreamJoins {

  /**
   * Watermarked stream-stream INTERVAL join: pair left rows with right rows of the same
   * key whose event time falls in `[leftTs + lo, leftTs + hi]`. This is the native
   * Structured Streaming shape (`withWatermark` on both sides + a time-range join
   * condition): Spark derives each side's state-eviction bound from the range itself —
   * a left row is droppable once the right watermark passes `leftTs + hi`, so the left
   * side holds ≈ `watermark + hi` worth of rows and the right ≈ `watermark − lo` (for an
   * "about an hour later" join, that is an hour of left state — size the watermark with
   * `hi` in mind). Inner-join matches emit as soon as both sides arrive; state cleanup
   * lags by the watermark delay.
   *
   * Column names must be disjoint across the two sides (streams usually are after their
   * `select`s); the caller names key and timestamp columns explicitly.
   */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      loMs: Long,
      hiMs: Long,
      watermark: String = "30 seconds"): DataFrame = {
    // lo == hi is the exact-offset single-point window the batch IntervalJoin documents
    // as valid (Spark's range condition accepts an equality band); only inverted bounds
    // are truly empty
    require(hiMs >= loMs, s"intervalJoin: inverted window [$loMs, $hiMs]")
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) + expr(s"interval $loMs milliseconds") &&
          col(rightTs) <= col(leftTs) + expr(s"interval $hiMs milliseconds"))
  }
}
