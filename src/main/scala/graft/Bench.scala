package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    // best of 2: the first execution of each query pays its whole-stage-codegen compile
    // (~1-3 s of JVM work unrelated to data volume); the second run measures the query.
    // benchQueries, not queries: the bench times the OPERATOR (pre-trained ANN models,
    // no in-plan exact audits) — graft.Verify runs the gated forms (VERDICT r3 #1).
    val results = SparkEntry.benchQueries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // noop sink, NOT count(): count() lets the optimizer prune every projection the
        // count doesn't need, so map-shaped queries (unwrap, quality, normalize …) would
        // measure only the scan; the noop sink forces full evaluation of every column.
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      val first = once()
      name -> (if (first < 0) first else math.min(first, once()))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Also write the metric to a file: sbt's log decoration around stdout made the driver's
    // parse of round 1's bench output unreliable (BENCH_r01 parsed:null).
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    spark.stop()
  }
}
