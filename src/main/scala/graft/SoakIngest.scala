package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Long-running ingest soak for [[graft.streaming.IngestDedup]] (VERDICT r7 #8 stretch):
 * split the `documents` corpus into many small sequential batches and measure
 * per-batch admission latency against index growth. The operator's 100 TB claim is
 * that each batch costs O(batch) — the index is probed via a join, never scanned into
 * the driver — so per-batch wall time must stay FLAT as the index accumulates, and
 * auto-compaction (the r8 file-count policy) must bound the index file count.
 *
 * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SoakIngest"`.
 * Prints one JSON line: per-batch seconds/admitted/index-files plus a flatness
 * verdict (mean of last quarter vs mean of second quarter — startup excluded).
 */
object SoakIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "40").toInt
    val autoCompact = sys.env.getOrElse("SPARK_GRAFT_SOAK_COMPACT", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint(eager = true) // one corpus read; batches slice the materialized frame
    val base = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val (idx, out) = (s"$base/index", s"$base/out")
    def idxFiles(): Int = {
      val d = new java.io.File(idx)
      if (!d.exists()) 0 else d.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    // warm-up outside the measured region (codegen + parquet writer path)
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val rows = (0 until nBatches).map { b =>
      val batch = docs.filter(col("doc_id") % nBatches === b)
      val t0 = System.nanoTime()
      val admitted = graft.streaming.IngestDedup.applyBatch(
        batch, b.toLong, idx, out, autoCompactFiles = autoCompact)
      val dt = (System.nanoTime() - t0) / 1e9
      (b, dt, admitted, idxFiles())
    }
    val q = nBatches / 4
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val early = mean(rows.slice(q, 2 * q).map(_._2)) // second quarter: post-startup
    val late = mean(rows.takeRight(q).map(_._2))
    val ratio = late / early
    val batchesJson = rows.map { case (b, s, a, f) =>
      f"""{"b":$b,"s":$s%.3f,"admitted":$a,"idx_files":$f}"""
    }.mkString("[", ",", "]")
    val line = f"""{"metric":"soak_ingest","n_batches":$nBatches,"auto_compact":$autoCompact,""" +
      f""""early_s":$early%.3f,"late_s":$late%.3f,"late_over_early":$ratio%.3f,""" +
      f""""max_idx_files":${rows.map(_._4).max},"batches":$batchesJson}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT", "/tmp/soak_ingest.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
