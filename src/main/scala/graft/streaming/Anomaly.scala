package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming per-key anomaly detection — the alerting twin of the batch `ev_zscore`
 * family: each key (user, device, tenant …) carries running first/second moments as
 * `mapGroupsWithState` state, and an arriving value is scored against the moments of
 * STRICTLY EARLIER events only (then folded in), so a flagged event never influences
 * its own baseline and the decision is identical whether the stream arrives in one
 * batch or a thousand.
 *
 * Scale shape: state is 24 bytes per key (n, Σx, Σx²) — millions of keys fit one
 * executor's state store; the shuffle is the same user-keyed exchange every keyed
 * streaming op pays, and within a group the per-batch sort is bounded by that key's
 * batch arrivals. No watermark/timeout: running baselines never expire (an idle-key
 * TTL would bolt on via `GroupStateTimeout.ProcessingTimeTimeout` without changing
 * the scoring).
 *
 * Determinism: per batch each group's rows process in (ms, event_id) order and the
 * fold's float operations run in that same order — [[batchFlags]] replays the exact
 * computation with an expanding window, and the spec pins streaming ≡ batch across
 * multi-batch splits.
 */
object Anomaly {

  case class Obs(user_id: Long, event_id: Long, ms: Long, value: Double)
  case class Stats(n: Long, sum: Double, sumSq: Double)
  case class Flag(user_id: Long, event_id: Long, ms: Long, value: Double, z: Double)

  private def score(st: Stats, x: Double, zThr: Double, minN: Long): Option[Double] =
    if (st.n < minN) None
    else {
      val mean = st.sum / st.n
      val variance = st.sumSq / st.n - mean * mean
      if (variance <= 0) None
      else {
        val z = (x - mean) / math.sqrt(variance)
        if (math.abs(z) > zThr) Some(z) else None
      }
    }

  /** Streaming form: one state record per key, flags in Update mode. */
  def flags(events: Dataset[Obs], zThr: Double = 3.0, minN: Long = 10): Dataset[Flag] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Stats, Flag](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid, it, state: GroupState[Stats]) =>
          var st = state.getOption.getOrElse(Stats(0L, 0.0, 0.0))
          val out = Seq.newBuilder[Flag]
          it.toSeq.sortBy(o => (o.ms, o.event_id)).foreach { o =>
            score(st, o.value, zThr, minN)
              .foreach(z => out += Flag(uid, o.event_id, o.ms, o.value, z))
            st = Stats(st.n + 1, st.sum + o.value, st.sumSq + o.value * o.value)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Batch twin — the same strictly-earlier moments via an expanding window; the spec
    * gate for batch-split invariance. */
  def batchFlags(events: DataFrame, zThr: Double = 3.0, minN: Long = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mean = col("__s") / col("__n")
    val variance = col("__s2") / col("__n") - mean * mean
    val z = (col("value") - mean) / sqrt(variance)
    events
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("value")).over(w))
      .withColumn("__s2", sum(col("value") * col("value")).over(w))
      .filter(col("__n") >= minN && variance > 0 && abs(z) > zThr)
      .select(col("user_id"), col("event_id"), col("ms"), col("value"), z.as("z"))
  }
}
