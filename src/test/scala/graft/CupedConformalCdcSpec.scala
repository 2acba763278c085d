package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.ops.SampleOps
import graft.functions.TextFunctions

/** CUPED, split-conformal, and content-defined chunking (the round-10 additions). */
class CupedConformalCdcSpec extends SparkSpec {
  import spark.implicits._

  // ---- CUPED ------------------------------------------------------------------------------

  /** (unit, isPre, value) rows; arm = unit % 2. */
  private def cupedRows(rows: Seq[(Long, Boolean, Double)]) =
    SampleOps.cuped(rows.toDF("u", "p", "v"),
      col("u"), pmod(col("u"), lit(2)), col("p"), col("v"))

  test("cuped: perfectly correlated covariate gives var_reduction 1 and flattens Y_adj") {
    // Y = 2X per unit: rho^2 = 1, theta = 2, and Y_adj = 2*mean(X) for EVERY unit,
    // so both arms' adjusted means coincide at 2*mean(X)
    val units = (1L to 40L)
    val rows = units.flatMap { u =>
      val x = (u % 7 + 1).toDouble // varied covariate
      Seq((u, true, x), (u, false, 2 * x))
    }
    val out = cupedRows(rows).collect().sortBy(_.getAs[Long]("arm"))
    assert(out.length == 2)
    val meanX = units.map(u => (u % 7 + 1).toDouble).sum / units.size
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("theta") - 2.0) < 1e-6)
      assert(math.abs(r.getAs[Double]("var_reduction") - 1.0) < 1e-6)
      assert(math.abs(r.getAs[Double]("mean_y_adj") - 2 * meanX) < 1e-4)
    }
  }

  test("cuped: a constant treatment effect survives adjustment unbiased") {
    // Y = X + noise + 5*arm: the adjusted lift must recover ~5 even though the raw
    // arm means are contaminated by the (deterministic) covariate imbalance
    val rows = (1L to 200L).flatMap { u =>
      val x = ((u * 2654435761L) % 100).toDouble + 1 // deterministic pseudo-random X
      val eff = if (u % 2 == 1) 5.0 else 0.0
      Seq((u, true, x), (u, false, x + eff))
    }
    val out = cupedRows(rows).collect().sortBy(_.getAs[Long]("arm"))
    val liftAdj = out(1).getAs[Double]("mean_y_adj") - out(0).getAs[Double]("mean_y_adj")
    assert(math.abs(liftAdj - 5.0) < 0.25, s"adjusted lift $liftAdj should be ~5")
    // theta on Y = X + const is ~1
    assert(math.abs(out.head.getAs[Double]("theta") - 1.0) < 0.05)
  }

  test("cuped: units with no pre-period rows enter with X = 0") {
    val rows = Seq((1L, false, 10.0), (2L, true, 4.0), (2L, false, 6.0),
      (3L, false, 2.0), (4L, true, 8.0), (4L, false, 12.0))
    val out = cupedRows(rows).collect()
    assert(out.map(_.getAs[Long]("n_units")).sum == 4) // all four units kept
  }

  private def cupedMultiRows(rows: Seq[(Long, Boolean, Double)]) =
    SampleOps.cupedMulti(rows.toDF("u", "p", "v"),
      col("u"), pmod(col("u"), lit(2)), col("p"), col("v"))

  test("cupedMulti: the count covariate captures signal value alone misses; R2 >= cuped's") {
    // Y = 3 * (# pre-period events) + small value term: the pre-period VALUE sum is a
    // noisy proxy (every pre event has value 1, so x1 == x2 * 100 cents... make them
    // differ: pre values vary but count drives Y)
    val rows = (1L to 120L).flatMap { u =>
      val k = (u % 5 + 1).toInt                       // pre-period activity count 1..5
      val pre = (1 to k).map(j => (u, true, ((u * 31 + j * 17) % 7 + 1).toDouble))
      val y = 3.0 * k + ((u * 13) % 3).toDouble * 0.1 // count-driven outcome
      pre :+ ((u, false, y))
    }
    val multi = cupedMultiRows(rows).collect().sortBy(_.getAs[Long]("arm"))
    val single = cupedRows(rows).collect().sortBy(_.getAs[Long]("arm"))
    assert(multi.length == 2 && single.length == 2)
    val r2m = multi.head.getAs[Double]("var_reduction")
    val r2s = single.head.getAs[Double]("var_reduction")
    assert(r2m >= r2s - 1e-9, s"two covariates must not fit worse: multi=$r2m single=$r2s")
    assert(r2m > 0.9, s"count-driven outcome should be largely explained: $r2m")
    // theta_count ~ 3 (dollars per pre-event); adjusted means near-coincide when the
    // outcome is covariate-driven with no treatment effect
    assert(math.abs(multi.head.getAs[Double]("theta_count") - 3.0) < 0.3,
      s"theta_count=${multi.head.getAs[Double]("theta_count")}")
    val liftAdj = multi(1).getAs[Double]("mean_y_adj") - multi(0).getAs[Double]("mean_y_adj")
    assert(math.abs(liftAdj) < 0.2, s"no planted effect, adjusted lift should vanish: $liftAdj")
  }

  test("cupedMulti: collinear covariates yield NULL thetas, never Infinity") {
    // every pre event has value 10.0 -> x1 == 1000 * x2 exactly: det = 0
    val rows = (1L to 40L).flatMap { u =>
      val k = (u % 3 + 1).toInt
      (1 to k).map(_ => (u, true, 10.0)) :+ ((u, false, k * 2.0))
    }
    val out = cupedMultiRows(rows).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("theta_value")), "collinear det=0 must yield NULL")
      assert(r.isNullAt(r.fieldIndex("mean_y_adj")))
      assert(!r.isNullAt(r.fieldIndex("mean_y")), "raw mean still reported")
    }
  }

  // ---- split conformal --------------------------------------------------------------------

  test("conformalSplit: q_hat is the ceil((n+1)(1-alpha))-th smallest calibration residual") {
    val rows = (1L to 500L).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v = ((i * 48271L) % 1000).toDouble / 10.0
      (i, g, v)
    }
    val df = rows.toDF("id", "g", "v")
    val out = SampleOps.conformalSplit(df, col("g"), col("v"),
      pmod(col("id"), lit(2)) === 0).head()

    // brute-force replica on the cents grid
    val cents = rows.map { case (i, g, v) => (i, g, math.round(v * 100)) }
    val cal = cents.filter(_._1 % 2 == 0)
    val yhat = cal.groupBy(_._2).map { case (g, xs) =>
      g -> xs.map(_._3).sum / xs.size } // floor division of positive longs
    val calR = cal.map { case (_, g, c) => math.abs(c - yhat(g)) }.sorted
    val k = ((calR.size + 1) * 9 + 9) / 10
    val q = calR(k - 1)
    assert(out.getAs[Long]("n_cal") == cal.size)
    assert(math.abs(out.getAs[Double]("q_hat") - q / 100.0) < 1e-9)
    val test0 = cents.filter(_._1 % 2 == 1)
    val covered = test0.count { case (_, g, c) => math.abs(c - yhat(g)) <= q }
    assert(math.abs(out.getAs[Double]("coverage") - covered.toDouble / test0.size) < 1e-6)
  }

  test("conformalSplit: exchangeable data lands near the target coverage") {
    val rows = (1L to 2000L).map { i =>
      (i, "g", ((i * 2654435761L) % 500).toDouble / 7.0)
    }
    val out = SampleOps.conformalSplit(rows.toDF("id", "g", "v"),
      col("g"), col("v"), pmod(col("id"), lit(2)) === 0).head()
    assert(out.getAs[Boolean]("coverage_near_target"),
      s"coverage ${out.getAs[Double]("coverage")} should be within 0.05 of 0.9")
  }

  test("conformalSplitGrouped: per-group q_hat matches the per-group brute force") {
    val rows = (1L to 800L).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v = ((i * 48271L) % 1000).toDouble / 10.0 * (if (g == "a") 3 else 1)
      (i, g, v)
    }
    val out = SampleOps.conformalSplitGrouped(rows.toDF("id", "g", "v"),
      col("g"), col("v"), pmod(col("id"), lit(2)) === 0)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val cents = rows.map { case (i, g, v) => (i, g, math.round(v * 100)) }
    for (g <- Seq("a", "b")) {
      val cal = cents.filter(x => x._1 % 2 == 0 && x._2 == g)
      val yhat = cal.map(_._3).sum / cal.size
      val rs = cal.map(x => math.abs(x._3 - yhat)).sorted
      val q = rs(((rs.size + 1) * 9 + 9) / 10 - 1)
      assert(math.abs(out(g).getAs[Double]("q_hat") - q / 100.0) < 1e-9, s"group $g")
      val tst = cents.filter(x => x._1 % 2 == 1 && x._2 == g)
      val cov = tst.count(x => math.abs(x._3 - yhat) <= q).toDouble / tst.size
      assert(math.abs(out(g).getAs[Double]("coverage") -
        math.rint(cov * 1e6) / 1e6) < 1e-9, s"group $g coverage")
    }
  }

  test("trimmedMeans: exact against a sorted-drop reference; outlier immunity") {
    // group "a": clean grid + huge planted outliers the 5% trim must fully absorb
    val clean = (1L to 100L).map(i => ("a", (i % 10 + 1).toDouble))
    val outliers = (1L to 4L).map(i => ("a", 99999.0)) // 4 < k = 104/20 = 5
    val df = (clean ++ outliers).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val out = SampleOps.trimmedMeans(df, col("g"), col("v")).head()
    // reference: sort cents, drop k each side, average
    val cents = (clean ++ outliers).map(x => math.round(x._2 * 100)).sorted
    val k = cents.size / 20
    val kept = cents.drop(k).dropRight(k)
    val ref = kept.sum.toDouble / kept.size / 100.0
    assert(out.getAs[Long]("k_trim") == k)
    assert(math.abs(out.getAs[Double]("mean_trimmed") - math.rint(ref * 1e4) / 1e4) < 1e-9)
    // the outliers moved the raw mean far above the trimmed one
    assert(out.getAs[Double]("mean_raw") > 3 * out.getAs[Double]("mean_trimmed"))
    // winsorized reference: clamp tails to the surviving extremes, average all n
    val lo = kept.head; val hi = kept.last
    val wref = (kept.sum + k * (lo + hi)).toDouble / cents.size / 100.0
    assert(math.abs(out.getAs[Double]("mean_winsorized") - math.rint(wref * 1e4) / 1e4) < 1e-9)
    // winsorize bounds the outliers' pull (no ordering vs trimmed is implied in
    // general — the clamped pairs can average below the interior mean)
    assert(out.getAs[Double]("mean_raw") > out.getAs[Double]("mean_winsorized"))
  }

  test("ratioJackknife: matches the delete-one brute force; CI brackets the ratio") {
    def q12(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    val days = (0L until 10L).map { d =>
      (d, (100 + 13 * d).toDouble, (50 + (d * 7) % 11).toDouble) } // (day, rev, views)
    val rows = days.flatMap { case (d, rev, vw) =>
      Seq((d, rev, 0.0), (d, 0.0, vw)) } // split across rows like real events
    val out = SampleOps.ratioJackknife(rows.toDF("b", "rev", "vw"),
      col("b"), col("rev"), col("vw")).head()

    val nc = days.map(x => math.round(x._2 * 100))
    val dc = days.map(x => math.round(x._3 * 100))
    val (tn, td) = (nc.sum, dc.sum)
    val ri = days.indices.map(i => q12((tn - nc(i)).toDouble / (td - dc(i))))
    val rbar = ri.reduce(_ add _).doubleValue() / ri.size
    val sd2 = ri.map(r => q12((r.doubleValue() - rbar) * (r.doubleValue() - rbar)))
      .reduce(_ add _)
    val se = math.sqrt((ri.size - 1).toDouble / ri.size * sd2.doubleValue())
    val r = tn.toDouble / td
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(out.getAs[Long]("n_blocks") == 10)
    assert(math.abs(out.getAs[Double]("ratio") - r6(r)) < 1e-12)
    assert(math.abs(out.getAs[Double]("jk_se") - r6(se)) < 1e-12)
    assert(out.getAs[Double]("ci_lo") < out.getAs[Double]("ratio"))
    assert(out.getAs[Double]("ratio") < out.getAs[Double]("ci_hi"))
  }

  // ---- mSPRT ------------------------------------------------------------------------------

  test("msprtDaily: matches a Scala replica day by day; huge effect rejects, null does not") {
    // arm 0 ~ grid around 100, arm 1 ~ grid around 100 + effect
    def data(effect: Double) = (1L to 600L).map { i =>
      val day = i % 10
      val a = i % 2
      val v = 100.0 + ((i * 48271L) % 41).toDouble - 20.0 + (if (a == 1) effect else 0.0)
      (day, a, v)
    }
    val big = SampleOps.msprtDaily(data(60.0).toDF("day", "a", "v"),
      col("day"), col("a"), col("v")).collect().sortBy(_.getAs[Long]("day"))
    assert(big.last.getAs[Boolean]("rejected"), "a 60-unit lift must reject")
    // monotone: always-valid p never increases
    big.map(_.getAs[Double]("log10_p")).sliding(2).foreach {
      case Array(p1, p2) => assert(p2 <= p1 + 1e-12)
      case _ =>
    }

    val nul = SampleOps.msprtDaily(data(0.0).toDF("day", "a", "v"),
      col("day"), col("a"), col("v")).collect().sortBy(_.getAs[Long]("day"))
    assert(!nul.last.getAs[Boolean]("rejected"), "no effect must not reject")

    // exact replica of day 9 (full data) for the effect case
    val rows = data(60.0).map { case (d, a, v) => (d, a, math.round(v * 100)) }
    val (na, nb) = (rows.count(_._2 == 0).toLong, rows.count(_._2 == 1).toLong)
    val (sa1, sb1) = (rows.filter(_._2 == 0).map(_._3).sum, rows.filter(_._2 == 1).map(_._3).sum)
    val sa2 = rows.filter(_._2 == 0).map(r => BigInt(r._3) * r._3).sum
    val sb2 = rows.filter(_._2 == 1).map(r => BigInt(r._3) * r._3).sum
    val (ma, mb) = (sa1.toDouble / na, sb1.toDouble / nb)
    val s2p = (sa2.toDouble + sb2.toDouble - na * ma * ma - nb * mb * mb) / (na + nb - 2)
    val v9 = s2p * (1.0 / na + 1.0 / nb)
    val dh = ma - mb
    val lp = math.min(0.0,
      -(0.5 * math.log10(v9 / (v9 + 250000.0)) +
        dh * dh * 250000.0 / (2.0 * v9 * (v9 + 250000.0)) * 0.4342944819032518))
    // running min ends at the day-9 value iff it is the minimum; assert bound instead
    assert(big.last.getAs[Double]("log10_p") <= math.rint(lp * 1e6) / 1e6 + 1e-9)
  }

  test("msprt: wave-merged associative moments reproduce the one-shot rows exactly") {
    import org.apache.spark.sql.types.DecimalType
    val rows = (1L to 400L).map { i =>
      (i, i % 8, i % 2, 50.0 + ((i * 48271L) % 31).toDouble) }
    val df = rows.toDF("id", "day", "a", "v")
    val oneShot = SampleOps.msprtDaily(df, col("day"), col("a"), col("v")).collect()

    // two disjoint waves, each aggregated alone, merged by key-sum (what the
    // maintained GroupingSetsMv state computes), then the shared finisher
    def mom(w: org.apache.spark.sql.DataFrame) = w
      .select(col("day"), col("a").as("__a"),
        (col("v").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      .groupBy(col("day"), col("__a"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum((col("c").cast(DecimalType(19, 0)) * col("c").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0))).as("s2"))
    val merged = mom(df.filter(col("id") % 2 === 0))
      .unionByName(mom(df.filter(col("id") % 2 === 1)))
      .groupBy(col("day"), col("__a"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).cast(DecimalType(38, 0)).as("s2"))
    val inc = SampleOps.msprtFromDailyMoments(merged).collect()
    assert(oneShot.map(_.toString).sorted.toSeq == inc.map(_.toString).sorted.toSeq)
  }

  test("e-BH: wave-merged associative moments reproduce the one-shot rows exactly") {
    import org.apache.spark.sql.types.DecimalType
    val rows = (1L to 900L).map { i =>
      val metric = s"m${i % 3}"
      val lift = if (i % 3 == 0 && i % 2 == 1) 40.0 else 0.0
      (i, metric, i % 2, 50.0 + ((i * 48271L) % 31).toDouble + lift)
    }
    val df = rows.toDF("id", "m", "a", "v")
    val oneShot = SampleOps.ebhFdr(df, col("m"), col("a"), col("v")).collect()
    def mom(w: org.apache.spark.sql.DataFrame) = w
      .select(col("m").as("metric"), col("a").as("__a"),
        (col("v").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      .groupBy(col("metric"), col("__a"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum((col("c").cast(DecimalType(19, 0)) * col("c").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0))).as("s2"))
    val merged = mom(df.filter(col("id") % 2 === 0))
      .unionByName(mom(df.filter(col("id") % 2 === 1)))
      .groupBy(col("metric"), col("__a"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).cast(DecimalType(38, 0)).as("s2"))
    val inc = SampleOps.ebhFromMoments(merged).collect()
    assert(oneShot.map(_.toString).sorted.toSeq == inc.map(_.toString).sorted.toSeq)
    // the planted m0 lift is the (single) discovery in both forms
    assert(oneShot.filter(_.getAs[Boolean]("discovery"))
      .map(_.getAs[String]("metric")).toSeq == Seq("m0"))
  }

  // ---- densest subgraph ---------------------------------------------------------------------

  test("densestSubgraph: peeling isolates the planted clique; flags exactly one best round") {
    // K5 (density 10/5 = 2.0) + a 30-node path (density ~1) glued by one edge:
    // the whole graph's density < 2, peeling strips the path, the best round is the clique
    val clique = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i.toLong, j.toLong)
    val path = (10L until 39L).map(i => (i, i + 1))
    val edges = (clique ++ path :+ (5L, 10L)).toDF("u", "v")
    val out = graft.ops.GraphOps.densestSubgraph(edges, maxRounds = 8).collect()
    val best = out.filter(_.getAs[Boolean]("is_best"))
    assert(best.length == 1, s"exactly one best round, got ${best.length}")
    assert(best.head.getAs[Double]("density") == 2.0)
    assert(best.head.getAs[Long]("n_nodes") == 5 && best.head.getAs[Long]("n_edges") == 10)
    // round 0 is the full graph
    val r0 = out.find(_.getAs[Int]("round") == 0).get
    assert(r0.getAs[Long]("n_nodes") == 35 && r0.getAs[Long]("n_edges") == 40)
    // the loud-fail budget: a graph needing more peels than the budget must raise
    intercept[Exception] {
      graft.ops.GraphOps.densestSubgraph(edges, maxRounds = 1).collect()
    }
  }

  // ---- Gear content-defined chunking --------------------------------------------------------

  private def chunksOf(blob: Array[Byte], min: Int = 16, bits: Int = 4, max: Int = 128) = {
    val df = Seq(Tuple1(blob)).toDF("b")
      .select(explode(TextFunctions.gearChunks(col("b"), min, bits, max)).as("c"))
      .select(col("c.off"), col("c.len"), col("c.hash"))
    df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
  }

  private def pseudoBytes(n: Int, seed: Long): Array[Byte] = {
    var z = seed
    Array.fill(n) {
      z = z * 6364136223846793005L + 1442695040888963407L
      (z >>> 56).toByte
    }
  }

  test("gearChunks: exact coverage, contiguity, and size bounds on random payloads") {
    for (seed <- 1L to 5L; n <- Seq(1, 15, 16, 100, 1000, 4096)) {
      val blob = pseudoBytes(n, seed)
      val cs = chunksOf(blob)
      assert(cs.map(_._2).sum == n, "chunks must cover every byte")
      assert(cs.head._1 == 0)
      cs.sliding(2).foreach {
        case Array((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2, "contiguous offsets")
        case _ =>
      }
      cs.init.foreach { case (_, l, _) => assert(l >= 16 && l <= 128) }
      assert(cs.last._2 <= 128)
    }
  }

  test("gearChunks: identical payloads chunk identically; shifted payloads re-sync") {
    val blob = pseudoBytes(4000, 42L)
    val again = chunksOf(blob)
    assert(chunksOf(blob).toSeq == again.toSeq)

    val shifted = "header!".getBytes ++ blob
    val a = chunksOf(blob).map(c => (c._3, c._2)) // (hash, len) multiset
    val b = chunksOf(shifted).map(c => (c._3, c._2)).toSet
    val sharedBytes = a.filter(b.contains).map(_._2).sum
    assert(sharedBytes.toDouble / blob.length > 0.5,
      s"shifted copy should share >50% of bytes, got ${sharedBytes.toDouble / blob.length}")
  }

  test("ChunkStore: maintained census == one-shot; replay is census-idempotent; reset guards") {
    import graft.streaming.ChunkStore
    import graft.ops.MultimodalOps
    val blobs = (1L to 60L).map(i => (i, pseudoBytes(200 + (i % 300).toInt, i)))
      .toDF("id", "blob")
    val store = java.nio.file.Files.createTempDirectory("graft-cs-test").toString
    try {
      for (b <- 0 to 1)
        ChunkStore.applyBatch(blobs.filter(col("id") % 2 === b), b.toLong, store)
      val census = ChunkStore.census(spark, store).head()
      val oneShot = MultimodalOps.cdcChunks(blobs, "blob", "id")
        .select(col("chunk_hash"), col("len")).distinct()
        .agg(count(lit(1)), sum(col("len").cast("long"))).head()
      assert(census.getLong(0) == oneShot.getLong(0))
      assert(census.getLong(1) == oneShot.getLong(1))

      // crash-replay of the newest batch: census must not change
      ChunkStore.applyBatch(blobs.filter(col("id") % 2 === 1), 1L, store)
      val replayed = ChunkStore.census(spark, store).head()
      assert(replayed.getLong(0) == census.getLong(0) &&
        replayed.getLong(1) == census.getLong(1))

      // checkpoint reset against a surviving store fails loudly
      intercept[IllegalStateException] {
        ChunkStore.applyBatch(blobs.filter(col("id") % 2 === 0), 0L, store)
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
  }

  test("gearChunks: maxLen forces a cut even when the mask never fires") {
    // constant payload: the gear hash sequence is fixed; pick maskBits high enough
    // that no boundary fires and every chunk must be exactly maxLen (except the tail)
    val blob = Array.fill[Byte](1000)(7)
    val cs = chunksOf(blob, min = 16, bits = 30, max = 64)
    assert(cs.init.forall(_._2 == 64))
    assert(cs.map(_._2).sum == 1000)
  }
}
