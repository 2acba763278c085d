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
    * append their digests to the index. Safe to call again with the same `batchId`.
    *
    * The index, output and checkpoint directories form ONE unit — restarting with a fresh
    * checkpoint against a used index would replay batch ids whose digests already exist
    * under other ids, silently re-admitting duplicates and overwriting old batch
    * directories. An index that is AHEAD of the incoming batch id proves exactly that,
    * and fails loudly instead. */
  def applyBatch(batch: DataFrame, batchId: Long, indexDir: String, outDir: String,
      textCol: String = "text", idCol: String = "doc_id"): Long = {
    val spark = batch.sparkSession
    val idx = index(spark, indexDir)
    val ahead = idx.agg(max(col("batch_id")).as("m")).collect().head
    if (!ahead.isNullAt(0) && ahead.getLong(0) > batchId)
      throw new IllegalStateException(
        s"digest index at $indexDir has batch_id ${ahead.getLong(0)} > incoming $batchId: " +
          "the stream's checkpoint was reset independently of the index — restore the " +
          "checkpoint or start a fresh index/output pair")
    val prior = idx.filter(col("batch_id") =!= batchId)
    // an at-least-once upstream can repeat an id (even with conflicting content); collapse
    // to ONE deterministic version per id first — min digest, so replays pick the same
    // version — which makes id functionally determine digest for everything below
    val hashed = batch.withColumn("content_md5", md5(col(textCol)))
    val minDigest = hashed.groupBy(col(idCol)).agg(min(col("content_md5")).as("content_md5"))
    val uniq = hashed.join(minDigest, Seq(idCol, "content_md5"), "left_semi")
      .dropDuplicates(idCol) // survivors of identical (id, digest) repeats are equal rows
    // admitted is tiny (ids + digests) and read three times below — keep it materialized
    // so the index probe and the batch digest scan run once, not per action
    val admitted = DedupOps.incrementalDedup(uniq, prior.select("content_md5"), textCol, idCol)
      .persist()
    try {
      val rows = uniq.join(admitted.select(idCol), Seq(idCol), "left_semi")
      rows.drop("content_md5").write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      admitted.select(col("content_md5"), lit(batchId).as("batch_id"))
        .write.mode("append").parquet(indexDir)
      admitted.count()
    } finally admitted.unpersist()
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

  // ---- NEAR-dup ingestion: same idempotence design over the MinHash signature index ----

  private val SigIndexSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", org.apache.spark.sql.types.ArrayType(LongType)),
    StructField("batch_id", LongType)))

  private def sigIndex(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(SigIndexSchema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], SigIndexSchema)
  }

  /**
   * One idempotent NEAR-dup batch application ([[graft.ops.DedupOps.nearDupAdmission]]
   * against the persisted signature index): O(batch) LSH screening per micro-batch, the
   * ingested corpus present only as its 512-byte/doc signatures. Identical replay
   * contract to [[applyBatch]] — per-batch overwrite, batch-tagged index rows excluded
   * from their own (re)application, loud failure when the index is ahead of the stream.
   * Determinism under replay holds because minhash, banding and the greedy intra-batch
   * tie-break are all pure functions of content.
   */
  def applyBatchNear(batch: DataFrame, batchId: Long, indexDir: String, outDir: String,
      textCol: String = "text", idCol: String = "doc_id", threshold: Double = 0.4): Long = {
    val spark = batch.sparkSession
    val idx = sigIndex(spark, indexDir)
    val ahead = idx.agg(max(col("batch_id")).as("m")).collect().head
    if (!ahead.isNullAt(0) && ahead.getLong(0) > batchId)
      throw new IllegalStateException(
        s"signature index at $indexDir has batch_id ${ahead.getLong(0)} > incoming $batchId: " +
          "the stream's checkpoint was reset independently of the index — restore the " +
          "checkpoint or start a fresh index/output pair")
    val prior = idx.filter(col("batch_id") =!= batchId).select(col("id"), col("sig"))
    val hashed = batch.withColumn("content_md5", md5(col(textCol)))
    val minDigest = hashed.groupBy(col(idCol)).agg(min(col("content_md5")).as("content_md5"))
    val uniq = hashed.join(minDigest, Seq(idCol, "content_md5"), "left_semi")
      .dropDuplicates(idCol).drop("content_md5")
    val admitted = DedupOps.nearDupAdmission(uniq, prior, textCol, idCol, threshold = threshold)
      .persist()
    try {
      val rows = uniq.join(admitted.select(col("id").as(idCol)), Seq(idCol), "left_semi")
      rows.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      admitted.select(col("id"), col("sig"), lit(batchId).as("batch_id"))
        .write.mode("append").parquet(indexDir)
      admitted.count()
    } finally admitted.unpersist()
  }

  /** Near-dup ingestion as a bounded streaming query (AvailableNow). */
  def startNear(docs: DataFrame, indexDir: String, outDir: String, checkpointDir: String,
      textCol: String = "text", idCol: String = "doc_id", threshold: Double = 0.4): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchNear(batch, batchId, indexDir, outDir, textCol, idCol, threshold): Unit
      }
      .start()
}
