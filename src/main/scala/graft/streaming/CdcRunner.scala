package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.operators.Cdc
import graft.sinks.CsvManifestSink

/**
 * Bounded CDC run: `cdc-spool` micro-batch stream → per-table staging with dynamic schema →
 * LWW dedupe (or plain append) → CSV + manifest + state.
 *
 * Mirrors the reference's whole component lifecycle (SURVEY §3.1 steps 7–9,
 * `ex_postgres_cdc/src/component.py:80-152`):
 *  - one finite streaming run per invocation (`Trigger.AvailableNow`, offset cap in the
 *    source) — the reference's run-until-stop-condition model (`AbstractDebeziumTask.java:97-130`);
 *  - per micro-batch, events are grouped by table and appended to a staging parquet dir;
 *    each batch's schema is inferred from the events themselves, so schema drift mid-run
 *    just produces parquet files with wider schemas (E1–E3) — `mergeSchema` on readback
 *    replaces the reference's chunk tables + `ALTER TABLE ADD COLUMN`;
 *  - post-processing dedupes on `kbc__batch_event_order` := the source's global arrival
 *    position (a true total order, unlike `monotonically_increasing_id`) and exports
 *    CSV/manifest/state (K2–K7).
 *
 * At-least-once is absorbed exactly like the reference (§2.7): replayed events land in
 * staging twice but carry the same position, and the LWW dedupe keeps one winner.
 */
object CdcRunner {

  final case class RunConfig(
      spoolDir: String,
      workDir: String,                       // staging parquet + checkpoint live here across runs
      outDir: String,                        // out/tables/*.csv[, .manifest], state.json
      mode: String = "dedupe",               // "dedupe" | "append" (D4 policy)
      primaryKeys: Map[String, Seq[String]] = Map.empty, // per-table; empty -> D9 fallback
      /** Admission control, in offset units = spool bytes (`max.batch.size` analog). */
      maxBytesPerTrigger: Option[Long] = None,
      /** P7 position target, a byte position: global over the sorted spool, or within
        * `stopAtFile` when that is set (the MySQL `(file, pos)` binlog target captured via
        * `SHOW MASTER STATUS`, `ex_mysql_cdc/src/extractor/mysql_extractor.py:245-258`). */
      stopAtPos: Option[Long] = None,
      stopAtFile: Option[String] = None,
      /** S5: tables added since the last run — snapshotted from the full spool via the
        * source's batch path, bypassing the stream checkpoint (the `execute-snapshot`
        * signal analog, `db_components/debezium/executor.py:244-303`). Dedupe absorbs
        * any overlap with already-streamed events, like replays. */
      snapshotTables: Seq[String] = Nil,
      /** P5: `table.include.list` — None = all tables discovered in the stream. */
      includeTables: Option[Set[String]] = None,
      /** P7: max run duration — the reference's `COMPONENT_TIMEOUT`/`-md` stop condition
        * (`AbstractDebeziumTask.java:166-189`); the run is stopped cleanly at the batch
        * boundary and the checkpoint resumes next invocation. */
      maxDurationMs: Option[Long] = None,
      /** Input format. `false` (default): routed envelopes `{"table":…,"op":…,"after":…}`
        * with per-batch JSON schema inference. `true`: the reference engine's actual wire
        * format — SMT-unwrapped flat Connect events `{"schema":{"name":"<t>.<s>.<tbl>.Value",
        * "fields":[…]},"payload":{row + kbc__ columns}}` (`DbChangeConsumerTest.java:40-46`),
        * decoded by the schema block via [[graft.operators.EnvelopeDecoder]]. */
      wireFormat: Boolean = false)

  final case class RunResult(tables: Map[String, Long], lastPos: Long, outDir: String,
      stats: SyncStats.Snapshot)

  /** S5 helper: tables configured now but absent from the previous run's synced set
    * (reference diff `ex_postgres_cdc/src/component.py:189-201`). */
  def detectNewTables(configured: Seq[String], previouslySynced: Set[String]): Seq[String] =
    configured.filterNot(t => previouslySynced.contains(graft.operators.Cdc.safeTableId(t)))

  private val SystemFields = Set("table", "op", "before", "after", "source")

  def run(spark: SparkSession, cfg: RunConfig): RunResult = {
    val stagingRoot = s"${cfg.workDir}/staging"
    val stats = new SyncStats // D8: progress/record bookkeeping via StreamingQueryListener
    spark.streams.addListener(stats)

    val reader = spark.readStream.format("graft.sources.CdcSpoolSource")
      .option("path", cfg.spoolDir)
    cfg.maxBytesPerTrigger.foreach(m => reader.option("maxBytesPerTrigger", m.toString))
    cfg.stopAtPos.foreach(p => reader.option("stopAtPos", p.toString))
    cfg.stopAtFile.foreach(f => reader.option("stopAtFile", f))
    val stream = reader.load()

    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${cfg.workDir}/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (cfg.wireFormat) stageWireEvents(spark, batch, stagingRoot, cfg.includeTables)
        else stageEvents(spark, batch, stagingRoot, only = cfg.includeTables)
      }
      .start()
    cfg.maxDurationMs match {
      case Some(ms) => if (!query.awaitTermination(ms)) query.stop()
      case None     => query.awaitTermination()
    }
    // progress events arrive on an async listener bus; give the final batch's event a moment
    val deadline = System.currentTimeMillis() + 2000
    while (stats.snapshot.processing && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    spark.streams.removeListener(stats)

    // S5: blocking-snapshot signal for newly-added tables — full-spool batch read (no
    // checkpoint), filtered to the signalled tables, staged like any other events.
    if (cfg.snapshotTables.nonEmpty) {
      val batchDf = spark.read.format("graft.sources.CdcSpoolSource")
        .option("path", cfg.spoolDir).load()
      val wanted = cfg.snapshotTables.toSet
      if (cfg.wireFormat) stageWireEvents(spark, batchDf, stagingRoot, Some(wanted))
      else stageEvents(spark, batchDf, stagingRoot, only = Some(wanted))
    }

    // ---- post-process: union-of-epochs read, dedupe policy, export (SURVEY §3.1 steps 8-9)
    val stagingDir = new java.io.File(stagingRoot)
    val tableDirs = Option(stagingDir.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
    var counts = Map.empty[String, Long]
    var schemas = Map.empty[String, StructType]
    var lastPos = 0L
    val outTables = s"${cfg.outDir}/tables"
    for (td <- tableDirs) {
      val table = td.getName
      val staged = spark.read.option("mergeSchema", "true").parquet(td.getPath)
      val deduped =
        if (cfg.mode == "dedupe")
          Cdc.dedupeLastWins(staged, cfg.primaryKeys.getOrElse(table, Seq.empty))
        else staged.orderBy(col(Cdc.OrderCol)) // append mode keeps every event, ordered
      val payloadCols = deduped.columns.filterNot(c => Cdc.SystemCols.contains(c))
      val normalized = Cdc.normalizeColumns(
        deduped.select((payloadCols ++ Cdc.SystemCols.filter(deduped.columns.contains)).map(col): _*))
      // output contract: KBC__EVENT_TIMESTAMP_MS is epoch millis (§1.2) — the wire path
      // decodes the logical Timestamp to TimestampType, so convert back for export
      val ordered = (normalized.schema.find(_.name == "KBC__EVENT_TIMESTAMP_MS") match {
        case Some(f) if f.dataType == TimestampType =>
          normalized.withColumn("KBC__EVENT_TIMESTAMP_MS", unix_millis(col("KBC__EVENT_TIMESTAMP_MS")))
        case _ => normalized
      }).persist() // count + CSV write share one dedupe computation
      counts += table -> ordered.count()
      schemas += table -> ordered.schema
      val maxPos = staged.agg(max(col(Cdc.OrderCol))).collect().head.getLong(0)
      lastPos = math.max(lastPos, maxPos + 1)
      CsvManifestSink.writeCsv(ordered, outTables, table)
      ordered.unpersist()
      CsvManifestSink.writeManifest(ordered.schema, outTables, table,
        cfg.primaryKeys.getOrElse(table, Seq.empty), incremental = cfg.mode == "dedupe")
    }
    CsvManifestSink.writeState(cfg.outDir, lastPos, schemas)
    RunResult(counts, lastPos, cfg.outDir, stats.snapshot)
  }

  /** Group a (pos, value) event batch by table, infer each table's envelope schema from the
    * events (E1), unwrap, and append to that table's staging parquet. */
  private def stageEvents(spark: SparkSession, batch: DataFrame, stagingRoot: String,
      only: Option[Set[String]] = None): Unit = {
    import spark.implicits._
    // no isEmpty pre-check: it would cost an extra source scan (inflating numInputRows and
    // wall time); the cached distinct below handles empty batches for free
    val spooled0 = batch.select(col("pos"), col("value"),
      get_json_object(col("value"), "$.table").as("table"))
    val spooled = only.fold(spooled0)(w => spooled0.filter(col("table").isin(w.toSeq: _*))).cache()
    try {
      val tables = spooled.select("table").distinct().as[String].collect()
      for (table <- tables if table != null) {
        val sub = spooled.filter(col("table") === table)
        // E1: per-batch schema inference from the events themselves — the analog of the
        // reference reading `schema.fields` out of every envelope (DbChangeConsumer.java:116-129)
        val envSchema = spark.read.json(sub.select("value").as[String]).schema
        val parsed = sub
          .select(col("pos"), from_json(col("value"), ensureStates(envSchema)).as("j"))
          .select(col("pos"), col("j.*"))
        val rows = Cdc.unwrapEnvelope(parsed, passthrough = Seq("pos"))
          .withColumnRenamed("pos", Cdc.OrderCol)
        rows.write.mode("append").parquet(s"$stagingRoot/${Cdc.safeTableId(table)}")
      }
    } finally spooled.unpersist()
  }

  /**
   * Wire-format staging: SMT-unwrapped flat Connect events. Table id comes from
   * `schema.name` = `<topic>.<schema>.<table>.Value` with dots → underscores
   * (`AppendDbConverter.java:27`); the payload is decoded at the types declared by the
   * event's own `schema.fields` block (logical dates/timestamps included) — the sample is
   * the highest-position event, whose schema is the widest (schemas grow additively, E1/E3).
   */
  private def stageWireEvents(spark: SparkSession, batch: DataFrame, stagingRoot: String,
      only: Option[Set[String]]): Unit = {
    import spark.implicits._
    import graft.operators.EnvelopeDecoder
    val spooled0 = batch.select(col("pos"), col("value"),
      regexp_replace(get_json_object(col("value"), "$.schema.name"), "\\.Value$", "").as("table"))
    val spooled = only.fold(spooled0)(w => spooled0.filter(col("table").isin(w.toSeq: _*))).cache()
    try {
      val tables = spooled.select("table").distinct().as[String].collect()
      for (table <- tables if table != null) {
        val sub = spooled.filter(col("table") === table)
        val sampleJson = sub.orderBy(col("pos").desc).select("value").as[String].head()
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val schemaBlock = mapper.readTree(sampleJson).get("schema").toString
        val elements = EnvelopeDecoder.parseSchemaElements(schemaBlock)
        val rows = EnvelopeDecoder.decodePayload(sub, "value", elements, passthrough = Seq("pos"))
          .withColumnRenamed("pos", Cdc.OrderCol)
        rows.write.mode("append").parquet(s"$stagingRoot/${Cdc.safeTableId(table)}")
      }
    } finally spooled.unpersist()
  }

  /** Guarantee `before`/`after`/`op`/`source` exist with compatible struct types even when a
    * batch contains only inserts (no `before`) or only deletes (no `after`). */
  private def ensureStates(inferred: StructType): StructType = {
    val payload: DataType =
      inferred.fields.find(_.name == "after").map(_.dataType)
        .orElse(inferred.fields.find(_.name == "before").map(_.dataType))
        .getOrElse(StructType(Nil))
    val merged = (inferred.fields.find(_.name == "after").map(_.dataType),
        inferred.fields.find(_.name == "before").map(_.dataType)) match {
      case (Some(a: StructType), Some(b: StructType)) =>
        // union of both states' fields, after-first order
        StructType(a.fields ++ b.fields.filterNot(f => a.fieldNames.contains(f.name)))
      case _ => payload
    }
    val source = inferred.fields.find(_.name == "source").map(_.dataType)
      .getOrElse(StructType(Seq(StructField("ts_ms", LongType))))
    StructType(Seq(
      StructField("table", StringType),
      StructField("op", StringType),
      StructField("after", merged),
      StructField("before", merged),
      StructField("source", source)))
  }
}
