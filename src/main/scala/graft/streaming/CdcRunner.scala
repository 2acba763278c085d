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
      maxEventsPerTrigger: Option[Long] = None,
      stopAtPos: Option[Long] = None)

  final case class RunResult(tables: Map[String, Long], lastPos: Long, outDir: String)

  private val SystemFields = Set("table", "op", "before", "after", "source")

  def run(spark: SparkSession, cfg: RunConfig): RunResult = {
    import spark.implicits._

    val reader = spark.readStream.format("graft.sources.CdcSpoolSource")
      .option("path", cfg.spoolDir)
    cfg.maxEventsPerTrigger.foreach(m => reader.option("maxEventsPerTrigger", m.toString))
    cfg.stopAtPos.foreach(p => reader.option("stopAtPos", p.toString))
    val stream = reader.load()

    val stagingRoot = s"${cfg.workDir}/staging"
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${cfg.workDir}/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spooled = batch.select(col("pos"), col("value"),
            get_json_object(col("value"), "$.table").as("table")).cache()
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
      }
      .start()
    query.awaitTermination()

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
      val ordered = Cdc.normalizeColumns(
        deduped.select((payloadCols ++ Cdc.SystemCols.filter(deduped.columns.contains)).map(col): _*))
      counts += table -> ordered.count()
      schemas += table -> ordered.schema
      val maxPos = staged.agg(max(col(Cdc.OrderCol))).collect().head.getLong(0)
      lastPos = math.max(lastPos, maxPos + 1)
      CsvManifestSink.writeCsv(ordered, outTables, table)
      CsvManifestSink.writeManifest(ordered.schema, outTables, table,
        cfg.primaryKeys.getOrElse(table, Seq.empty), incremental = cfg.mode == "dedupe")
    }
    CsvManifestSink.writeState(cfg.outDir, lastPos, schemas)
    RunResult(counts, lastPos, cfg.outDir)
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
