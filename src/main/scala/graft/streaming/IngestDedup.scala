package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ops.DedupOps

/**
 * Continuous corpus ingestion with exact dedup — the streaming form of
 * [[graft.ops.DedupOps.incrementalDedup]]: a document stream is admitted micro-batch by
 * micro-batch against a persistent digest index, so each batch costs O(batch), never
 * O(corpus). The corpus itself is represented only by its digest index; ingested text is
 * never reread or reshuffled.
 *
 * Replay safety (foreachBatch re-runs a batch after a crash, §2.7 at-least-once) is by
 * IDEMPOTENCE, not coordination:
 *
 *  - admitted documents overwrite a per-batch directory (`batch=<id>`) — a replay
 *    rewrites the same rows, never appends beside them;
 *  - index entries carry their writer's batch id, and the probe EXCLUDES entries written
 *    by the batch being (re)applied — a replayed batch re-admits exactly what it admitted
 *    first time (its own digests can't reject it), so the overwrite converges instead of
 *    emptying the directory;
 *  - the index is append-only and duplicate digests are harmless: the probe is an
 *    anti-join against a SET of digests, so re-appending a batch's digests is a no-op
 *    semantically.
 *
 * Net effect: exactly-once admission with no transactional sink. At 100 TB, persist the
 * index bucketed by content_md5 ([[graft.sinks.Bucketing.writeBucketed]]) and the
 * per-batch probe is exchange-free on the index side; the per-batch parquet directories
 * compact like any staging table ([[graft.operators.StagingCatalog]]).
 */
object IngestDedup {

  val IndexSchema: StructType = StructType(Seq(
    StructField("content_md5", StringType), StructField("batch_id", LongType)))

  private def index(spark: SparkSession, indexDir: String): DataFrame = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(IndexSchema).parquet(indexDir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IndexSchema)
  }

  /** One idempotent batch application: admit novel docs, write them to `outDir/batch=<id>`,
    * append their digests to the index. Safe to call again with the same `batchId`. */
  def applyBatch(batch: DataFrame, batchId: Long, indexDir: String, outDir: String,
      textCol: String = "text", idCol: String = "doc_id"): Long = {
    val spark = batch.sparkSession
    val prior = index(spark, indexDir).filter(col("batch_id") =!= batchId)
    val admitted = DedupOps.incrementalDedup(batch, prior.select("content_md5"), textCol, idCol)
    val rows = batch.join(admitted.select(idCol), Seq(idCol), "left_semi")
    rows.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    admitted.select(col("content_md5"), lit(batchId).as("batch_id"))
      .write.mode("append").parquet(indexDir)
    spark.read.parquet(s"$outDir/batch=$batchId").count()
  }

  /** Wire the ingestion into a streaming query (bounded run: AvailableNow). */
  def start(docs: DataFrame, indexDir: String, outDir: String, checkpointDir: String,
      textCol: String = "text", idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, indexDir, outDir, textCol, idCol): Unit
      }
      .start()
}
