package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Long-running soak for [[graft.streaming.GroupingSetsMv]] and its bucketed twin
 * [[graft.streaming.BucketedGroupingSetsMv]] (VERDICT r11 #4/#5, r12 #3): stream the
 * events table into both summary stores in many sequential batches and measure
 * per-batch admission latency as the maintained grain deepens.
 *
 * Two batch-key distributions, selected by `SPARK_GRAFT_SOAK_SPREAD`:
 *
 *  - `local` (bulk-load locality): batches are split on the store's OWN bucket hash,
 *    so each batch dirties ~1 per-key bucket (plus the <= 4 shared lattice buckets) —
 *    the regional/daily-locality best case where dirty-bucket rewrites maximally beat
 *    the flat O(grain) rewrite. This was the r12 measurement; the r12 verdict
 *    correctly called it a best-case dirty fraction.
 *
 *  - `uniform` (steady-state trickle, the honest case): the full table is LOADED
 *    first (unmeasured), then the measured batches are small uniform-random key
 *    subsets (~grain/trickleMod keys each, fresh salt per batch — no correlation
 *    with the store's bucket hash). Expected dirty buckets = n·(1−e^(−U/n)) for U
 *    batch keys over n buckets, so the rewrite surface is bounded by
 *    min(U, nBuckets)·grain/nBuckets: at nBuckets=16 and U≫16 every bucket is dirty
 *    and the store degenerates to the flat rewrite plus manifest overhead, while at
 *    nBuckets ≫ U the per-bucket state, not locality engineering, bounds the
 *    rewrite. Run at SPARK_GRAFT_SOAK_BUCKETS ∈ {16, 256} to locate the crossover.
 *
 * Grain: d1 = a wide synthetic key (user_id × event_id mod grainMod), d2 =
 * event_type, measure = value. At sf10 (GenScale copies=100) with grainMod 97 the
 * grain reaches ~7.2M distinct keys — big enough that O(grain) vs O(dirty-grain)
 * separates.
 *
 * Run: `SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_SOAK_BATCHES=48
 * SPARK_GRAFT_SOAK_SPREAD=uniform sbt "runMain graft.SoakGsMv"`. Prints ONE JSON
 * line (SoakCC's shape).
 */
object SoakGsMv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default 48: a multiple of the default bucket count (40 % 16 != 0 made a bare
    // runMain crash at startup — ADVICE r12)
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "48").toInt
    require(nBatches >= 4, s"SPARK_GRAFT_SOAK_BATCHES must be >= 4 (got $nBatches)")
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_SOAK_BUCKETS", "16").toInt
    // grain multiplier: distinct k1 ~ |users| x grainMod. The sf10 run uses 97 (grain
    // ~1.4M keys — a 10x-deeper STATE than the sf0.1 run's 97k at mod 997, with the
    // same fixed batch size), keeping the flat store's O(grain)-per-batch rewrite
    // inside a soak-able wall-clock budget; the point is the SLOPE, not the absolute
    val grainMod = sys.env.getOrElse("SPARK_GRAFT_SOAK_GRAIN_MOD", "997").toInt
    // mode: both | flat | bkt (split runs across processes when wall clock is tight)
    val mode = sys.env.getOrElse("SPARK_GRAFT_SOAK_MODE", "both")
    // spread: local (bucket-aligned batches, bulk-load best case) | uniform
    // (load-then-trickle with uniform-random batch keys, the steady-state case)
    val spread = sys.env.getOrElse("SPARK_GRAFT_SOAK_SPREAD", "local")
    // uniform-spread trickle density: each measured batch touches ~grain/trickleMod
    // distinct keys (default 65536 → ~110 keys/batch at the 7.2M-key sf10 grain)
    val trickleMod = sys.env.getOrElse("SPARK_GRAFT_SOAK_TRICKLE_MOD", "65536").toInt
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
    spark.range(1L << 20).selectExpr("sum(id)").collect() // warm-up outside the loop

    // batch plan: (batchId, frame, measured). `local` splits the whole table on the
    // store's own bucket hash (each measured batch loads AND updates); `uniform`
    // loads the whole table in 4 unmeasured bulk batches, then measures nBatches
    // small trickle batches of uniformly-spread keys.
    val batches: Seq[(Long, () => org.apache.spark.sql.DataFrame, Boolean)] =
      if (spread == "local") {
        // key-local batching: split on the store's OWN bucket hash at gid=1 shape
        // (gid 1, k1, d2 nulled — xxhash64 skips nulls). With nBatches a multiple of
        // nBuckets, h mod nBatches == b pins h mod nBuckets == b mod nBuckets, so batch
        // b's per-key lattice rows land in exactly ONE store bucket (plus the <= 4
        // d2/grand-total buckets every batch shares).
        require(nBatches % nBuckets == 0,
          s"nBatches ($nBatches) must be a multiple of nBuckets ($nBuckets) for alignment")
        val splitHash = graft.streaming.BucketedGroupingSetsMv.bucketExpr(
          lit(1L), col("k1"), lit(null).cast("string"), nBatches)
        val withB = ev.withColumn("__b", splitHash).localCheckpoint(eager = true)
        (0 until nBatches).map(b =>
          (b.toLong, () => withB.filter(col("__b") === b).drop("__b"), true))
      } else {
        require(spread == "uniform", s"unknown SPARK_GRAFT_SOAK_SPREAD '$spread'")
        val loadSplit = pmod(xxhash64(lit(7L), col("k1")), lit(4)).cast("int")
        val withL = ev.withColumn("__l", loadSplit).localCheckpoint(eager = true)
        val load = (0 until 4).map(b =>
          (b.toLong, () => withL.filter(col("__l") === b).drop("__l"), false))
        // trickle batch b: a fresh uniform ~grain/trickleMod key subset per batch —
        // a DIFFERENT salt each batch and a different hash arity than bucketExpr,
        // so batch membership is decorrelated from the store's bucket assignment
        val trickle = (0 until nBatches).map { b =>
          ((4 + b).toLong,
            () => ev.filter(
              pmod(xxhash64(lit(1000L + b), col("k1")), lit(trickleMod)) === 0),
            true)
        }
        load ++ trickle
      }

    def soak(apply: (org.apache.spark.sql.DataFrame, Long) => Int)
        : (Seq[(Int, Double, Int)], Double, Double) = {
      val rows = batches.flatMap { case (id, mk, measured) =>
        val batch = mk()
        val t0 = System.nanoTime()
        val dirty = apply(batch, id)
        val dt = (System.nanoTime() - t0) / 1e9
        if (measured) Some((id.toInt, dt, dirty)) else None
      }
      val q = rows.size / 4
      def mean(xs: Seq[Double]) = xs.sum / xs.size
      val early = mean(rows.slice(q, 2 * q).map(_._2))
      val late = mean(rows.takeRight(q).map(_._2))
      (rows, early, late)
    }
    val zero = (Seq.empty[(Int, Double, Int)], 0.0, 0.0)
    val (flatRows, flatEarly, flatLate) = if (mode == "bkt") zero else
      soak((b, id) => {
        graft.streaming.GroupingSetsMv.applyBatch(
          b, id, s"$base/flat", "k1", "event_type", "value")
        -1 // the flat store has no dirty-bucket notion
      })
    val (bktRows, bktEarly, bktLate) = if (mode == "flat") zero else
      soak((b, id) =>
        graft.streaming.BucketedGroupingSetsMv.applyBatch(
          b, id, s"$base/bkt", "k1", "event_type", "value", nBuckets = nBuckets))
    def arr(rows: Seq[(Int, Double, Int)]) =
      rows.map { case (b, s, d) => f"""{"b":$b,"s":$s%.3f,"dirty":$d}""" }
        .mkString("[", ",", "]")
    def ratio(a: Double, b: Double) = if (b == 0.0) "null" else f"${a / b}%.3f"
    val meanDirty =
      if (bktRows.isEmpty) "null"
      else f"${bktRows.map(_._3).sum.toDouble / bktRows.size}%.1f"
    val line =
      f"""{"metric":"soak_gsmv","n_batches":$nBatches,"n_rows":$nRows,"grain":$grain,""" +
      f""""n_buckets":$nBuckets,"grain_mod":$grainMod,"mode":"$mode","spread":"$spread",""" +
      f""""trickle_mod":$trickleMod,"mean_dirty":$meanDirty,""" +
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
