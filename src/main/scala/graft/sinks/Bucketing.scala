package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Bucketed-table sink for co-located joins: write both sides of a recurring big join
 * bucketed (and sorted) by the join key, and every subsequent join between them is
 * exchange-free — the sort-merge join reads co-located buckets directly. This is the
 * standing answer to the reference's repeated per-run dedupe/merge passes at 100 TB:
 * pay the partitioning once at write time, not per query.
 *
 * The incremental-admission pattern ([[graft.streaming.IngestDedup]]) APPENDS to its
 * index every batch, so a long-lived index accretes one small file set per batch — the
 * classic small-file problem (100k batches × 32 tasks = 3.2M files; the namenode and
 * every scan's task-planning pay for each). [[compactBucketed]] / [[compactIndexDir]]
 * are the maintenance rewrite: same rows, same layout contract, target-sized files
 * (VERDICT r6 #7).
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted table at `path`, registered as `name`. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      keys: Seq[String], buckets: Int): Unit = {
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Append a batch to an existing bucketed table (same bucket spec required — Spark
    * validates it). Each append adds ≥1 file per non-empty bucket; compact
    * periodically. */
  def appendBucketed(df: DataFrame, name: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode("append")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(name)

  /**
   * Rewrite a bucketed table to 1 file per non-empty bucket, preserving the bucket
   * layout (and therefore every exchange-free join against it). The rewrite reads
   * through the BUCKETED scan — one task per bucket — so it is a pure per-bucket file
   * merge with ZERO shuffle; the sortBy re-establishes the per-bucket sort that
   * appends interleave. The swap is drop-both-tables → directory rename →
   * re-register (CREATE ... CLUSTERED BY ... LOCATION): file contents never pass
   * through the driver. NOT crash-atomic on object stores (rename there is a copy) —
   * at that scale run the rewrite through a transactional table format; on
   * HDFS-semantics filesystems the rename is atomic and the non-atomic window is the
   * two metastore DDLs.
   */
  def compactBucketed(spark: SparkSession, name: String, path: String,
      keys: Seq[String], buckets: Int): Unit = {
    val df = spark.table(name)
    val schemaDdl = df.schema.toDDL
    val tmpName = name + "_compact_tmp"
    val tmpPath = path + "_compact_tmp"
    // Force the BUCKETED scan (auto-bucketed-scan otherwise decides a plain
    // size-split scan is fine here, leaving each task a mixture of buckets — and an
    // explicit repartition on the bucket keys is elided as redundant against the
    // table's logical layout). With one bucket per scan task, the rewrite is a pure
    // per-bucket file merge: ZERO shuffle, one output file per non-empty bucket.
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAuto = spark.conf.getOption(autoKey)
    spark.conf.set(autoKey, "false")
    try {
      df.write.mode("overwrite")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .option("path", tmpPath)
        .format("parquet")
        .saveAsTable(tmpName)
    } finally prevAuto match {
      case Some(v) => spark.conf.set(autoKey, v)
      case None => spark.conf.unset(autoKey)
    }
    // both tables are external (explicit path) — drops remove metadata only
    spark.sql(s"DROP TABLE IF EXISTS $tmpName")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmpPath), new Path(path))
    val keyList = keys.mkString(", ")
    spark.sql(
      s"""CREATE TABLE $name ($schemaDdl) USING PARQUET
         |CLUSTERED BY ($keyList) SORTED BY ($keyList) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
  }

  /**
   * Compact a plain parquet index directory (the [[graft.streaming.IngestDedup]]
   * layout: per-batch appended part files + `_batch_<id>` marker files) down to
   * ⌈totalBytes / targetFileBytes⌉ files. Marker files and dot/underscore metadata are
   * untouched — admission bookkeeping survives the rewrite, and because every reader
   * supplies an explicit schema and the probe is a join, neither file names nor row
   * order carry meaning. Returns the number of data files after compaction.
   *
   * Ordering is read → write tmp (under `_compact_tmp`, invisible to parquet readers)
   * → delete old → move in: a crash before the delete leaves the index intact; a crash
   * between delete and move leaves the full compacted copy in `_compact_tmp` for
   * manual restore (documented non-atomicity — same caveat as [[compactBucketed]]).
   */
  def compactIndexDir(spark: SparkSession, dir: String, schema: StructType,
      targetFileBytes: Long = 128L << 20): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    def dataFiles() = fs.listStatus(p).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val before = dataFiles()
    if (before.length <= 1) return before.length
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new Path(p, "_compact_tmp")
    fs.delete(tmp, true)
    spark.read.schema(schema).parquet(dir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    before.foreach(s => fs.delete(s.getPath, false))
    val moved = fs.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .zipWithIndex
    moved.foreach { case (s, i) =>
      fs.rename(s.getPath, new Path(p, s"compact-$i-${s.getPath.getName}"))
    }
    fs.delete(tmp, true)
    moved.length
  }
}
