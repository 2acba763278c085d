package graft.sources

import java.sql.Connection
import java.util.concurrent.atomic.AtomicLong

/**
 * §2.7 heartbeat keepalive: periodically executes an action statement on the source
 * connection during a run, so the database's replication slot / WAL retention keeps
 * advancing even when the synced tables are quiet. Reference:
 * `heartbeat.interval.ms` + `heartbeat.action.query`
 * (`ex_postgres_cdc/src/extractor/postgres_extractor.py:148-150`, default interval
 * `ex_postgres_cdc/src/configuration.py:98-101`, fixture
 * `ex_postgres_cdc/tests/sql_test_traits/heartbeat.sql`).
 */
class Heartbeat(conn: Connection, actionQuery: String, intervalMs: Long = Heartbeat.DefaultIntervalMs)
    extends AutoCloseable {

  private val beats = new AtomicLong(0)
  private val timer = new java.util.Timer("graft-heartbeat", true)

  timer.scheduleAtFixedRate(new java.util.TimerTask {
    override def run(): Unit =
      try { conn.createStatement().execute(actionQuery); beats.incrementAndGet() }
      catch { case _: java.sql.SQLException => () } // keepalive must never kill the run
  }, 0L, intervalMs)

  def beatCount: Long = beats.get()
  override def close(): Unit = timer.cancel()
}

object Heartbeat {
  /** Reference default `heartbeat.interval.ms` = 3000. */
  val DefaultIntervalMs = 3000L
}
