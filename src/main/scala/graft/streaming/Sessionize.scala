package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming gap-based sessionization with custom state:
 * `KeyValueGroupedDataset.flatMapGroupsWithState` keeps one open session per user across
 * micro-batches, with a REAL event-time timeout: a watermark tracks event time, each open
 * session arms `setTimeoutTimestamp(end + gap)`, and when the watermark passes it the
 * timeout branch emits the session and removes its state — so an idle user's last session
 * is eventually emitted and state stays O(active users), bounded by expiry, instead of
 * accumulating a churning population forever. The stateful-streaming path a training-data
 * pipeline uses for clickstream / interaction-log shaping; the batch equivalent is the
 * `ev_sessionize` query.
 *
 * Spark checkpoints the state with the query, so the operator resumes exactly across
 * bounded runs just like the CDC checkpoint. (Timeouts fire in the first trigger after the
 * watermark passes them — in a bounded `AvailableNow` run a session going idle near the
 * end of the data is emitted by the NEXT chained run, the same resume semantics as the
 * rest of the pipeline.)
 */
object Sessionize {

  final case class Event(user_id: Long, ms: Long)
  final case class EventT(user_id: Long, ms: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start_ms: Long, end_ms: Long, n_events: Long)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long,
      closed: Boolean)

  def sessionize(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", watermarkDelay)
      .as[EventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[EventT], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // inactivity gap elapsed in event time: close and expire the idle session
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start_ms, s.end_ms, s.n_events, closed = true))
          } else {
            val sorted = batch.toSeq.sortBy(_.ms)
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              open match {
                case Some(s) if e.ms - s.end_ms <= gapMs =>
                  open = Some(s.copy(end_ms = e.ms, n_events = s.n_events + 1))
                case Some(s) =>
                  closed += SessionOut(user, s.start_ms, s.end_ms, s.n_events, closed = true)
                  open = Some(OpenSession(e.ms, e.ms, 1))
                case None =>
                  open = Some(OpenSession(e.ms, e.ms, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Convenience: run over a cdc-spool of `{"source":{"ts_ms":..},"after":{"user_id":..}}`
    * envelopes, emitting closed sessions to an in-memory/arbitrary sink via the caller. */
  def fromSpool(spool: DataFrame, gapMs: Long): Dataset[SessionOut] = {
    import spool.sparkSession.implicits._
    val events = spool.select(
      get_json_object(col("value"), "$.after.user_id").cast("long").as("user_id"),
      get_json_object(col("value"), "$.source.ts_ms").cast("long").as("ms"))
      .filter(col("user_id").isNotNull && col("ms").isNotNull)
      .as[Event]
    sessionize(events, gapMs)
  }
}
