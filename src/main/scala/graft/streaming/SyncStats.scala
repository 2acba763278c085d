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

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    processing.set(true)

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

  def snapshot: SyncStats.Snapshot =
    SyncStats.Snapshot(records.get(), batches.get(), lastEventMs.get(), processing.get())
}

object SyncStats {
  final case class Snapshot(records: Long, batches: Long, lastEventMs: Long, processing: Boolean)
}
