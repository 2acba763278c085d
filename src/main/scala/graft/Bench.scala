package graft
import org.apache.spark.sql.SparkSession

object Bench {
  // Fixed data-independent calibration workload: xxhash64 over 2^25 longs, fully
  // codegen'd, no IO. Its wall time on a quiet box is a machine constant; under
  // co-located load it degrades roughly in proportion — so re-timing it immediately
  // before and after the sweep makes artifact contamination DETECTABLE (the r5 driver
  // artifact overstated every query ~2x because of concurrent machine load, and nothing
  // in the artifact could show it). CalibrationRef is the committed quiet-box time for
  // the repo's reference hardware (local[32]); a run where either calibration sample
  // exceeds 1.3x the reference is marked "tainted": true in BENCH.json so the consumer
  // knows the numbers measure the machine, not the queries. Re-pin on hardware change.
  private[graft] val CalibrationRef = 0.150 // seconds, quiet-box local[32], min-of-2
  private[graft] val TaintFactor = 1.3

  private def calibrate(spark: SparkSession): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: ANSI mode would throw on long overflow of summed hashes
      spark.range(1L << 25).selectExpr("xxhash64(id) AS h").selectExpr("bit_xor(h)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // min-of-2: robust to one-off GC/JIT blips, still load-sensitive (sustained
    // co-located load raises the minimum too)
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JVM/JIT, whole-stage codegen and the parquet reader path once, so the
    // per-query numbers measure steady-state execution rather than first-job startup.
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    try SparkEntry.queries("q_dim_join")(spark, sfDir).count() catch { case _: Throwable => () }
    // two unrecorded rounds: the first pays codegen compile, the second C2-tier JIT —
    // with one round the "before" sample measured warm-up, not machine load (observed
    // 0.17-0.21s before vs 0.08-0.12s after the sweep on a quiet box, tripping the
    // sentinel on cold-start rather than on co-located load, which is its one job)
    calibrate(spark)
    calibrate(spark)
    val calBefore = calibrate(spark)
    // optional subset scoping for local iteration (mirrors Verify's SPARK_GRAFT_ONLY)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.benchQueries.filter { case (n, _) => names(n) }
      case None => SparkEntry.benchQueries
    }
    // best of 2: the first execution of each query pays its whole-stage-codegen compile
    // (~1-3 s of JVM work unrelated to data volume); the second run measures the query.
    // benchQueries, not queries: the bench times the OPERATOR (pre-trained ANN models,
    // no in-plan exact audits) — graft.Verify runs the gated forms (VERDICT r3 #1).
    val results = selected.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // noop sink, NOT count(): count() lets the optimizer prune every projection the
        // count doesn't need, so map-shaped queries (unwrap, quality, normalize …) would
        // measure only the scan; the noop sink forces full evaluation of every column.
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      val first = once()
      val best = if (first < 0) first else math.min(first, once())
      // drop persisted frames between queries (outside the timed region): a query that
      // legitimately persists (the audio fingerprint stream) must not squeeze every
      // LATER query's executor memory — a full-sweep run once inflated the cdc tail 3×.
      // The explicit gc drains the previous query's garbage debt on our time, not the
      // next query's timed region (observed ±35% per-query swings across full sweeps
      // without it, with the calibration sentinel green — the pressure is JVM-internal).
      spark.catalog.clearCache()
      System.gc()
      name -> best
    }
    val calAfter = calibrate(spark)
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val tainted = math.max(calBefore, calAfter) > CalibrationRef * TaintFactor
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","calibration_before_s":$calBefore,"calibration_after_s":$calAfter""" +
      s""","calibration_ref_s":$CalibrationRef,"load_avg":$loadAvg,"tainted":$tainted}"""
    println(line)
    if (tainted) System.err.println(
      f"[bench] TAINTED: calibration ${math.max(calBefore, calAfter)}%.3fs vs ref ${CalibrationRef}s " +
        f"(>±${TaintFactor}x) — numbers reflect machine load, not query cost")
    // Also write the metric to a file: sbt's log decoration around stdout made the driver's
    // parse of round 1's bench output unreliable (BENCH_r01 parsed:null).
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    spark.stop()
  }
}
