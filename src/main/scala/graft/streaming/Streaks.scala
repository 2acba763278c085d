package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Streaming consecutive-day activity streaks — the incremental twin of the batch
 * `ev_streaks` gaps-and-islands operator: each user carries (lastDay, curLen, maxLen)
 * as `mapGroupsWithState` state, 24 bytes per key, and a batch's arrivals fold in
 * (distinct, ascending-day) order. The fold is associative over ordered batch splits,
 * so streaming ≡ batch whenever days arrive nondecreasing per user ACROSS batches —
 * the same in-order delivery contract the CDC operators state; a late (smaller) day is
 * ignored, exactly what a watermark would have dropped.
 *
 * Scale shape: one user-keyed exchange per batch (the price of any keyed stateful op),
 * per-group work bounded by that key's batch arrivals. State never expires (streaks are
 * lifetime metrics); an idle-key TTL would bolt on via ProcessingTimeTimeout.
 */
object Streaks {

  case class DayObs(user_id: Long, day: Long)
  case class StreakState(lastDay: Long, curLen: Long, maxLen: Long)
  case class StreakRow(user_id: Long, last_day: Long, cur_len: Long, max_len: Long)

  /** Streaming form: emits each touched user's updated streak row per batch (Update). */
  def streaks(days: Dataset[DayObs]): Dataset[StreakRow] = {
    import days.sparkSession.implicits._
    days.groupByKey(_.user_id)
      .mapGroupsWithState[StreakState, StreakRow](GroupStateTimeout.NoTimeout) {
        (uid, it, state: GroupState[StreakState]) =>
          var st = state.getOption.getOrElse(StreakState(Long.MinValue, 0L, 0L))
          it.map(_.day).toSeq.distinct.sorted.foreach { d =>
            if (d == st.lastDay + 1 && st.curLen > 0)
              st = StreakState(d, st.curLen + 1, math.max(st.maxLen, st.curLen + 1))
            else if (d > st.lastDay)
              st = StreakState(d, 1L, math.max(st.maxLen, 1L))
            // d <= lastDay: duplicate or late arrival — no-op (in-order contract)
          }
          state.update(st)
          StreakRow(uid, st.lastDay, st.curLen, st.maxLen)
      }
  }

  /** Batch twin: per-user max streak via gaps-and-islands (the ev_streaks kernel). */
  def batchMaxStreaks(userDays: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    userDays.select(col("user_id"), col("day")).distinct()
      .select(col("user_id"), (col("day") - row_number().over(w)).as("grp"))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("max_streak"))
  }
}
