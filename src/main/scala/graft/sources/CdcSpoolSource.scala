package graft.sources

import java.util
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `cdc-spool` — DataSourceV2 source for Debezium-style change-event spools: a directory of
 * JSONL files (one envelope per line), named so lexicographic order == arrival order.
 *
 * This is the Spark-native re-expression of the reference's embedded engine front-end
 * (`debezium_core/src/main/java/keboola/cdc/debezium/AbstractDebeziumTask.java:97-130` +
 * `DbChangeConsumer.java:68-102`): in production the spool is written by a Debezium engine
 * (or any CDC feed); here the source's job is the *streaming semantics*:
 *
 *  - **micro-batch offsets** over (file, line) positions, checkpointable/resumable — the
 *    analog of the reference's Debezium file offset store (`executor.py:326-328`);
 *  - **bounded runs** — `stopAtPos` caps `latestOffset` exactly like the reference's
 *    out-of-scope/target-binlog-position stop conditions (`DbChangeConsumer.java:133-162`,
 *    SURVEY §2.7); with `Trigger.AvailableNow` this makes one finite run per invocation;
 *  - **backpressure** — `maxEventsPerTrigger` mirrors `max.batch.size`
 *    (`mysql_extractor.py:166-167`).
 *
 * Emitted schema: `value STRING` (raw envelope JSON), `pos LONG` (global arrival index —
 * the total order behind `kbc__batch_event_order`, SURVEY §7.4.2). Parsing stays in the
 * query plan (`from_json`) where Catalyst prunes unused envelope fields.
 *
 * Supports BATCH_READ too, so the same spool can be read with `spark.read` for
 * `initial_only`-style snapshot runs (S2 analog).
 */
class CdcSpoolSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdc-spool"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CdcSpoolSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new CdcSpoolTable(opts.get("path"),
      Option(opts.get("maxEventsPerTrigger")).map(_.toLong),
      Option(opts.get("stopAtPos")).map(_.toLong),
      Option(opts.get("stopAtTsMs")).map(_.toLong))
  }
}

object CdcSpoolSource {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** Spool files in arrival order with cumulative line-count offsets. */
  private[sources] def listFiles(path: String): Seq[(String, Long)] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".jsonl")).map(_.getPath).sorted
    files.map { f =>
      val src = scala.io.Source.fromFile(f)
      try (f, src.getLines().size.toLong) finally src.close()
    }.toSeq
  }

  /** Lightweight `"ts_ms":<digits>` extraction from an envelope line (no full JSON parse)
    * — only used by the ts-based stop condition, once per line per run. */
  private[sources] def extractTsMs(line: String): Option[Long] = {
    val key = "\"ts_ms\":"
    val i = line.indexOf(key)
    if (i < 0) None
    else {
      var j = i + key.length
      while (j < line.length && line.charAt(j) == ' ') j += 1
      val start = j
      while (j < line.length && Character.isDigit(line.charAt(j))) j += 1
      if (j > start) Some(line.substring(start, j).toLong) else None
    }
  }

  /** Per-file stats: line count and the index of the first out-of-scope event (ts > cap). */
  private[sources] def scanFile(f: String, tsCap: Option[Long]): (Long, Option[Long]) = {
    val src = scala.io.Source.fromFile(f)
    try {
      var n = 0L
      var firstBad: Option[Long] = None
      for (line <- src.getLines()) {
        if (firstBad.isEmpty && tsCap.exists(cap => extractTsMs(line).exists(_ > cap)))
          firstBad = Some(n)
        n += 1
      }
      (n, firstBad)
    } finally src.close()
  }
}

class CdcSpoolTable(path: String, maxPerTrigger: Option[Long], stopAtPos: Option[Long],
    stopAtTsMs: Option[Long] = None)
    extends Table with SupportsRead {
  override def name(): String = s"cdc-spool($path)"
  override def schema(): StructType = CdcSpoolSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new CdcSpoolScan(path, maxPerTrigger, stopAtPos, stopAtTsMs)
}

class CdcSpoolScan(path: String, maxPerTrigger: Option[Long], stopAtPos: Option[Long],
    stopAtTsMs: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = CdcSpoolSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcSpoolMicroBatchStream(path, maxPerTrigger, stopAtPos, stopAtTsMs)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val files = CdcSpoolSource.listFiles(path)
      val offsets = files.map(_._2).scanLeft(0L)(_ + _)
      files.zipWithIndex.map { case ((f, n), i) =>
        CdcSpoolPartition(f, 0L, n, offsets(i)): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new CdcSpoolReaderFactory
  }
}

/** Offset = number of events consumed so far (global line position across the sorted spool). */
case class CdcSpoolOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class CdcSpoolMicroBatchStream(path: String, maxPerTrigger: Option[Long], stopAtPos: Option[Long],
    stopAtTsMs: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // Spool files are append-only-by-new-files; re-list on every latestOffset call so files
  // landing mid-run are picked up (the streaming-engine contract), but cache per-file stats.
  private val statCache = mutable.Map.empty[String, (Long, Option[Long])]
  // Frozen end target for Trigger.AvailableNow runs (the bounded-run model): everything
  // present when the run starts, clipped by the stop conditions (P7).
  private var availableNowTarget: Option[Long] = None

  private def filesWithOffsets(): (Seq[(String, Long)], Long) = {
    val dir = new java.io.File(path)
    val names = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".jsonl")).map(_.getPath).sorted.toSeq
    val files = names.map { f =>
      (f, statCache.getOrElseUpdate(f, CdcSpoolSource.scanFile(f, stopAtTsMs))._1)
    }
    (files, files.map(_._2).sum)
  }

  private def cappedTotal(): Long = {
    val (files, total) = filesWithOffsets()
    // P7 ts-based out-of-scope stop (DbChangeConsumer.java:133-162): consumption halts at
    // the first event whose source ts exceeds the cap — the reference's StopEngineException.
    val tsCap: Long = if (stopAtTsMs.isEmpty) total else {
      var base = 0L
      var cut = total
      var found = false
      for ((f, n) <- files if !found) {
        statCache(f)._2.foreach { bad => cut = base + bad; found = true }
        base += n
      }
      cut
    }
    math.min(tsCap, stopAtPos.fold(total)(math.min(total, _)))
  }

  override def initialOffset(): Offset = CdcSpoolOffset(0L)
  override def deserializeOffset(json: String): Offset = CdcSpoolOffset(json.trim.toLong)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(cappedTotal())

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.fold(ReadLimit.allAvailable())(m => ReadLimit.maxRows(m))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcSpoolOffset].pos
    val target = availableNowTarget.getOrElse(cappedTotal())
    val next = limit match {
      case mr: ReadMaxRows => math.min(target, from + mr.maxRows())
      case _               => target
    }
    CdcSpoolOffset(math.max(from, next))
  }

  override def reportLatestOffset(): Offset = CdcSpoolOffset(cappedTotal())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcSpoolOffset].pos
    val e = end.asInstanceOf[CdcSpoolOffset].pos
    val (files, _) = filesWithOffsets()
    val parts = Array.newBuilder[InputPartition]
    var base = 0L
    for ((f, n) <- files) {
      val lo = math.max(s - base, 0L)
      val hi = math.min(e - base, n)
      if (lo < hi) parts += CdcSpoolPartition(f, lo, hi, base)
      base += n
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = new CdcSpoolReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One spool file slice: lines [startLine, endLine); `base` = global pos of the file's line 0. */
case class CdcSpoolPartition(file: String, startLine: Long, endLine: Long, base: Long)
    extends InputPartition

class CdcSpoolReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcSpoolPartition]
    new PartitionReader[InternalRow] {
      private val source = scala.io.Source.fromFile(p.file)
      private val it = source.getLines().zipWithIndex
        .dropWhile(_._2 < p.startLine).takeWhile(_._2 < p.endLine)
      private var current: (String, Int) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current._1), p.base + current._2)
      override def close(): Unit = source.close()
    }
  }
}
