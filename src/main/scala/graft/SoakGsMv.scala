package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Long-running soak for [[graft.streaming.GroupingSetsMv]] and its bucketed twin
 * [[graft.streaming.BucketedGroupingSetsMv]] (VERDICT r11 #4/#5): stream the events
 * table into both summary stores in many small sequential batches and measure
 * per-batch admission latency as the maintained grain deepens.
 *
 * Two claims under test, printed side by side:
 *  - FLAT store: per-batch cost is O(batch + grain) — flat late/early quarters at a
 *    fixed grain, with the amortized auto-compaction trip not re-inflating the tail
 *    (the r11 `ev_msprt_incremental` suspect).
 *  - BUCKETED store: per-batch cost is O(batch + DIRTY grain). Batches are keyed
 *    key-local (split by the same hash the store buckets on), so each batch dirties
 *    ~1/nBuckets of the key space and the rewrite surface stays a small constant
 *    share — the billion-key-grain story the flat store's docstring defers to.
 *
 * Grain: d1 = a wide synthetic key (user_id × day), d2 = event_type, measure =
 * value. At sf10 (GenScale copies=100) d1 reaches ~10⁵–10⁶ distinct keys — big
 * enough that O(grain) vs O(dirty-grain) separates.
 *
 * Run: `SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_SOAK_BATCHES=400
 * sbt "runMain graft.SoakGsMv"`. Prints ONE JSON line (SoakCC's shape).
 */
object SoakGsMv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "40").toInt
    require(nBatches >= 4, s"SPARK_GRAFT_SOAK_BATCHES must be >= 4 (got $nBatches)")
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_SOAK_BUCKETS", "16").toInt
    // grain multiplier: distinct k1 ~ |users| x grainMod. The sf10 run uses 97 (grain
    // ~1.4M keys — a 10x-deeper STATE than the sf0.1 run's 97k at mod 997, with the
    // same fixed batch size), keeping the flat store's O(grain)-per-batch rewrite
    // inside a soak-able wall-clock budget; the point is the SLOPE, not the absolute
    val grainMod = sys.env.getOrElse("SPARK_GRAFT_SOAK_GRAIN_MOD", "997").toInt
    // mode: both | flat | bkt (split runs across processes when wall clock is tight)
    val mode = sys.env.getOrElse("SPARK_GRAFT_SOAK_MODE", "both")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
    // wide grain: (user_id, value-cents bucket) — scales with the data like a
    // real per-entity metric key; d2 stays the low-cardinality lattice side
    val ev = evRaw.select(
      concat_ws(":", col("user_id"), pmod(col("event_id"), lit(grainMod))).as("k1"),
      col("event_type"), col("value"))
      .localCheckpoint(eager = true) // source build outside the measured loop
    val nRows = ev.count()
    val grain = ev.select(count_distinct(col("k1"))).head.getLong(0)
    val base = java.nio.file.Files.createTempDirectory("graft_soak_gsmv").toString
    // key-local batching: split on the store's OWN bucket hash at gid=1 shape
    // (gid 1, k1, d2 nulled — xxhash64 skips nulls). With nBatches a multiple of
    // nBuckets, h mod nBatches == b pins h mod nBuckets == b mod nBuckets, so batch
    // b's per-key lattice rows land in exactly ONE store bucket (plus the <= 4
    // d2/grand-total buckets every batch shares) — the regional/daily-locality
    // pattern where dirty-bucket rewrites beat the flat O(grain) rewrite.
    require(nBatches % nBuckets == 0,
      s"nBatches ($nBatches) must be a multiple of nBuckets ($nBuckets) for alignment")
    val splitHash = graft.streaming.BucketedGroupingSetsMv.bucketExpr(
      lit(1L), col("k1"), lit(null).cast("string"), nBatches)
    val withB = ev.withColumn("__b", splitHash)
      .localCheckpoint(eager = true)
    spark.range(1L << 20).selectExpr("sum(id)").collect() // warm-up outside the loop
    def soak(label: String, apply: (org.apache.spark.sql.DataFrame, Long) => Unit)
        : (Seq[(Int, Double)], Double, Double) = {
      val rows = (0 until nBatches).map { b =>
        val batch = withB.filter(col("__b") === b).drop("__b")
        val t0 = System.nanoTime()
        apply(batch, b.toLong)
        (b, (System.nanoTime() - t0) / 1e9)
      }
      val q = nBatches / 4
      def mean(xs: Seq[Double]) = xs.sum / xs.size
      val early = mean(rows.slice(q, 2 * q).map(_._2))
      val late = mean(rows.takeRight(q).map(_._2))
      (rows, early, late)
    }
    val zero = (Seq.empty[(Int, Double)], 0.0, 0.0)
    val (flatRows, flatEarly, flatLate) = if (mode == "bkt") zero else
      soak("flat", (b, id) =>
        graft.streaming.GroupingSetsMv.applyBatch(
          b, id, s"$base/flat", "k1", "event_type", "value"): Unit)
    val (bktRows, bktEarly, bktLate) = if (mode == "flat") zero else
      soak("bucketed", (b, id) =>
        graft.streaming.BucketedGroupingSetsMv.applyBatch(
          b, id, s"$base/bkt", "k1", "event_type", "value", nBuckets = nBuckets): Unit)
    def arr(rows: Seq[(Int, Double)]) =
      rows.map { case (b, s) => f"""{"b":$b,"s":$s%.3f}""" }.mkString("[", ",", "]")
    def ratio(a: Double, b: Double) = if (b == 0.0) "null" else f"${a / b}%.3f"
    val line =
      f"""{"metric":"soak_gsmv","n_batches":$nBatches,"n_rows":$nRows,"grain":$grain,""" +
      f""""n_buckets":$nBuckets,"grain_mod":$grainMod,"mode":"$mode",""" +
      f""""flat_early_s":$flatEarly%.3f,"flat_late_s":$flatLate%.3f,""" +
      s""""flat_late_over_early":${ratio(flatLate, flatEarly)},""" +
      f""""bkt_early_s":$bktEarly%.3f,"bkt_late_s":$bktLate%.3f,""" +
      s""""bkt_late_over_early":${ratio(bktLate, bktEarly)},""" +
      s""""bkt_over_flat_late":${ratio(bktLate, flatLate)},""" +
      s""""flat_batches":${arr(flatRows)},"bkt_batches":${arr(bktRows)}}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT", "/tmp/soak_gsmv.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
