package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Streaming Holt-Winters — the incremental twin of the batch `ev_holt_winters`
 * forecaster: each series key carries (level, trend, season[7], daysSeen) as
 * `mapGroupsWithState` state and folds new daily totals with the IDENTICAL truncating
 * BIGINT recursion (alpha=2/10, beta=1/10, gamma=3/10, counts in 1e-6 units), so the
 * streamed state after day N is bit-equal to the batch fold over the first N days —
 * the equivalence the spec pins across an arbitrary batch split. The first 7 days
 * buffer for initialization (level = week mean, trend = 0, season_i = y_i − level),
 * exactly the batch init.
 *
 * In-order contract (same as [[Streaks]]): per-key days must arrive nondecreasing
 * ACROSS batches; a late (≤ lastDay) observation is ignored — what a watermark would
 * have dropped. Within a batch, arrivals fold in (distinct, ascending-day) order, and
 * a DAY'S TOTAL must arrive whole within one batch (the upstream `foreachBatch`
 * aggregates at daily grain before feeding this op) — a split day's remainder would
 * read as a late arrival and drop.
 *
 * Scale shape: one key-hashed exchange per micro-batch; state is 10 longs per series
 * key — a million concurrent series is ~80 MB of state store. Emits the post-batch
 * h=1..7 forecasts per touched key (Update mode); a key short of 14 days emits an
 * empty forecast list (the batch query's minimum-history filter).
 */
object HoltWinters {

  case class DayCount(event_type: String, day: Long, y: Long)
  case class HwState(buf: Seq[Long], lvl: Long, tr: Long, s: Seq[Long], n: Long, lastDay: Long)
  case class HwRow(event_type: String, n_days: Long, forecasts: Seq[Long])

  private val Scale = 1000000L

  /** One fold step of the batch recursion — kept textually tiny so the twin's
    * equivalence to `ev_holt_winters`'s `aggregate` lambda is auditable by eye.
    *
    * `phiNum` is the DAMPED-TREND parameter as a /10 rational (Gardner & McKenzie
    * 1985): the trend enters level and its own update through φ·tr = (phiNum·tr)
    * div 10. phiNum = 10 gives φ = 1, and (10·tr) div 10 ≡ tr for every BIGINT, so
    * the undamped path is BIT-EQUAL to the original recursion — one fold serves both
    * forms (`ev_holt_winters` and `ev_holt_damped`). */
  private def step(st: HwState, yRaw: Long, phiNum: Long): HwState = {
    val y = yRaw * Scale
    val i = (st.n % 7).toInt
    val si = st.s(i)
    val phtr = (phiNum * st.tr) / 10
    val lvl2 = (2 * (y - si)) / 10 + (8 * (st.lvl + phtr)) / 10
    val tr2 = (lvl2 - st.lvl) / 10 + (9 * phtr) / 10
    val si2 = (3 * (y - lvl2)) / 10 + (7 * si) / 10
    st.copy(lvl = lvl2, tr = tr2, s = st.s.updated(i, si2), n = st.n + 1)
  }

  private def consume(st: HwState, day: Long, yRaw: Long, phiNum: Long): HwState = {
    if (day <= st.lastDay) st // late/duplicate: in-order contract drops it
    else if (st.n < 7) {
      val buf = st.buf :+ yRaw * Scale
      if (buf.length < 7) st.copy(buf = buf, n = st.n + 1, lastDay = day)
      else {
        val lvl0 = buf.sum / 7
        HwState(Nil, lvl0, 0L, buf.map(_ - lvl0), 7L, day)
      }
    } else step(st, yRaw, phiNum).copy(lastDay = day)
  }

  /** h=1..7 forecasts from a post-init state (empty before 14 days of history).
    * The damped trend contribution is the ITERATED-TRUNCATION sum Σ_{j=1..h} φ^j·tr
    * computed as ft_1 = (phiNum·tr) div 10, ft_{j+1} = (phiNum·ft_j) div 10 — each
    * step one exact integer op, so DuckDB replays it with `//`. phiNum = 10 keeps
    * ft_j ≡ tr and the sum collapses to h·tr, the original forecast. */
  def forecast(st: HwState, phiNum: Long = 10L): Seq[Long] =
    if (st.n < 14) Nil
    else {
      var ft = st.tr
      var acc = 0L
      (1 to 7).map { h =>
        ft = (phiNum * ft) / 10
        acc += ft
        st.lvl + acc + st.s(((st.n + h - 1) % 7).toInt)
      }
    }

  /** Streaming form: emits each touched series' post-batch forecasts (Update mode). */
  def holtWinters(daily: Dataset[DayCount], phiNum: Long = 10L): Dataset[HwRow] = {
    import daily.sparkSession.implicits._
    daily.groupByKey(_.event_type)
      .mapGroupsWithState[HwState, HwRow](GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[HwState]) =>
          var st = state.getOption.getOrElse(HwState(Nil, 0L, 0L, Nil, 0L, Long.MinValue))
          it.toSeq.groupBy(_.day).toSeq.sortBy(_._1).foreach { case (day, rows) =>
            st = consume(st, day, rows.map(_.y).sum, phiNum) // same-day arrivals are one total
          }
          state.update(st)
          HwRow(key, st.n, forecast(st, phiNum))
      }
  }
}
