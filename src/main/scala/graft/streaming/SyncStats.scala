package graft.streaming

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * D8: run progress bookkeeping — record count, batch count, last-activity timestamp,
 * processing flag. The Spark-native form of the reference's `SyncStats` singleton
 * (`debezium_core/src/main/java/keboola/cdc/debezium/SyncStats.java:12-110`) and the
 * per-batch bookkeeping in `DbChangeConsumer.java:71-101`, driven here by the engine's
 * own `StreamingQueryListener` progress events instead of hand-rolled counters.
 */
class SyncStats extends StreamingQueryListener {
  private val records = new AtomicLong(0)
  private val batches = new AtomicLong(0)
  private val lastEventMs = new AtomicLong(0)
  private val processing = new AtomicBoolean(false)
  private val snapshotting = new AtomicBoolean(false)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    processing.set(true)
    // the idle clock starts at query start, not at epoch — an empty spool still waits
    // out maxWait before stopping (reference: engine start primes the last-record time)
    lastEventMs.compareAndSet(0, System.currentTimeMillis())
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val rows = e.progress.numInputRows
    if (rows > 0) {
      records.addAndGet(rows)
      batches.incrementAndGet()
      lastEventMs.set(System.currentTimeMillis())
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    processing.set(false)

  /** Snapshot-in-progress gate (`KeboolaNotification.java:24-34`): while an initial/blocking
    * snapshot runs, stop conditions must NOT fire even if the stream itself is idle
    * (`AbstractDebeziumTask.java:176-183`). Flipped by the snapshot phase of a composed run. */
  def setSnapshotInProgress(on: Boolean): Unit = {
    snapshotting.set(on)
    if (!on) lastEventMs.set(System.currentTimeMillis()) // snapshot end resets the idle clock
  }
  def snapshotInProgress: Boolean = snapshotting.get()

  def snapshot: SyncStats.Snapshot =
    SyncStats.Snapshot(records.get(), batches.get(), lastEventMs.get(), processing.get(),
      snapshotting.get())
}

object SyncStats {
  final case class Snapshot(records: Long, batches: Long, lastEventMs: Long, processing: Boolean,
      snapshotInProgress: Boolean = false)
}
