package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Long-running soak for [[graft.streaming.IncrementalCC]] (VERDICT r10 #8 stretch —
 * the ×100 scaling point): stream the lineitem co-purchase edge set into the label
 * store in many small sequential batches and measure per-batch admission latency as
 * the store deepens. The operator's 100 TB claim is that each batch costs
 * O(batch + affected components): the prior labels are probed via a join (never
 * scanned into the driver), star-contraction touches only the batch's nodes, and
 * auto-compaction keeps the redirect-chain depth and file count bounded — so
 * per-batch wall time must stay FLAT as the store accumulates.
 *
 * Run: `SPARK_GRAFT_SF_DIR=target/sf10 sbt "runMain graft.SoakCC"` after
 * `runMain graft.GenScale /root/testdata/sf0.1 target/sf10 100`. Batch count via
 * `SPARK_GRAFT_SOAK_BATCHES` — hold (edges ÷ batches) constant across scales so the
 * comparison isolates STATE depth, not batch size. Prints one JSON line:
 * per-batch seconds + the late/early flatness verdict (same shape as
 * [[SoakIngest]], so the SCALING.md rows read side by side).
 */
object SoakCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "40").toInt
    // quartile means below slice nBatches/4 elements; < 4 batches would average
    // empty slices (0/0 = NaN) and print a garbage flatness verdict
    require(nBatches >= 4, s"SPARK_GRAFT_SOAK_BATCHES must be >= 4 (got $nBatches)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = graft.ops.GraphOps.coOccurrenceEdges(li, "l_orderkey", "l_partkey",
      minCount = 2).localCheckpoint(eager = true) // edge build outside the measured loop
    val nEdges = edges.count()
    val store = java.nio.file.Files.createTempDirectory("graft_soak_cc").toString
    // warm-up outside the measured region (codegen + parquet writer path)
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val rows = (0 until nBatches).map { b =>
      val batch = edges.filter(pmod(col("u") + col("v"), lit(nBatches)) === b)
      val t0 = System.nanoTime()
      val appended = graft.streaming.IncrementalCC.applyBatch(batch, b.toLong, store)
      val dt = (System.nanoTime() - t0) / 1e9
      (b, dt, appended)
    }
    val q = nBatches / 4
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val early = mean(rows.slice(q, 2 * q).map(_._2)) // second quarter: post-startup
    val late = mean(rows.takeRight(q).map(_._2))
    val ratio = late / early
    val batchesJson = rows.map { case (b, s, a) =>
      f"""{"b":$b,"s":$s%.3f,"appended":$a}"""
    }.mkString("[", ",", "]")
    val line = f"""{"metric":"soak_cc","n_batches":$nBatches,"n_edges":$nEdges,""" +
      f""""early_s":$early%.3f,"late_s":$late%.3f,"late_over_early":$ratio%.3f,""" +
      f""""batches":$batchesJson}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT", "/tmp/soak_cc.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
    spark.stop()
  }
}
