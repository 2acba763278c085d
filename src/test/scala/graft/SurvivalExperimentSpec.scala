package graft

import org.apache.spark.sql.functions._
import graft.ops.SampleOps

/** Kaplan–Meier product-limit, difference-in-differences, and e-BH FDR
  * (the round-10 experimentation additions). */
class SurvivalExperimentSpec extends SparkSpec {
  import spark.implicits._

  // ---- Kaplan–Meier -----------------------------------------------------------------------

  test("kaplanMeier: hand-computed product-limit with censoring") {
    // units 1..10; activity days chosen so lifespans are {0,0,2,2,2,5,5,9,9,9};
    // observation end = day 9, 3-day censor tail => units whose LAST day >= 7 are
    // censored. Construct: unit u active on [f_u, l_u].
    val rows = Seq(
      (1L, 0L), (1L, 0L), // t=0, last=0 -> uncensored
      (2L, 1L), (2L, 1L), // t=0, last=1 -> uncensored
      (3L, 0L), (3L, 2L), // t=2, last=2 -> uncensored
      (4L, 1L), (4L, 3L), // t=2, last=3 -> uncensored
      (5L, 5L), (5L, 7L), // t=2, last=7 -> CENSORED
      (6L, 0L), (6L, 5L), // t=5, last=5 -> uncensored
      (7L, 2L), (7L, 7L), // t=5, last=7 -> CENSORED
      (8L, 0L), (8L, 9L), // t=9, last=9 -> CENSORED
      (9L, 0L), (9L, 9L), // t=9, CENSORED
      (10L, 0L), (10L, 9L) // t=9, CENSORED
    ).toDF("u", "d")
    val out = SampleOps.kaplanMeier(rows, col("u"), col("d"))
      .collect().sortBy(_.getAs[Long]("t"))
    // grid: t=0 (n_at=2, churn=2), t=2 (n_at=3, churn=2), t=5 (n_at=2, churn=1),
    //       t=9 (n_at=3, churn=0); n_risk desc-cum: t=0:10, t=2:8, t=5:5, t=9:3
    assert(out.map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
      r.getAs[Long]("n_churn"))).toSeq ==
      Seq((0L, 10L, 2L), (2L, 8L, 2L), (5L, 5L, 1L), (9L, 3L, 0L)))
    // product-limit at e12: 1e12*8/10=8e11; *6/8=6e11; *4/5=4.8e11; *3/3 unchanged
    assert(out.map(_.getAs[Long]("s_e12")).toSeq ==
      Seq(800000000000L, 600000000000L, 480000000000L, 480000000000L))
    assert(math.abs(out(2).getAs[Double]("survival") - 0.48) < 1e-9)
  }

  test("kaplanMeier: no censoring matches the empirical survivor function") {
    // all units die well before the tail: S(t) = fraction with lifespan > t
    val rows = (1L to 20L).flatMap { u =>
      val span = u % 4 // lifespans 0..3, 5 units each
      Seq((u, 0L), (u, span))
    } ++ Seq((99L, 0L), (99L, 30L)) // one long-lived censored unit pins the window end
    val out = SampleOps.kaplanMeier(rows.toDF("u", "d"), col("u"), col("d"))
      .filter(col("t") <= 3).collect().sortBy(_.getAs[Long]("t"))
    // 21 units at risk at t=0; uncensored deaths 5 at each of t=0..3
    val expected = Seq(16.0 / 21, (16.0 / 21) * (11.0 / 16),
      (16.0 / 21) * (11.0 / 16) * (6.0 / 11),
      (16.0 / 21) * (11.0 / 16) * (6.0 / 11) * (1.0 / 6))
    out.zip(expected).foreach { case (r, e) =>
      assert(math.abs(r.getAs[Double]("survival") - e) < 1e-4,
        s"t=${r.getAs[Long]("t")}")
    }
  }

  test("kaplanMeier: fully censored population keeps survival at 1") {
    // every unit is still active in the tail window: zero churn, the product stays 1e12
    val rows = (1L to 8L).flatMap(u => Seq((u, 0L), (u, 10L + (u % 3))))
    val out = SampleOps.kaplanMeier(rows.toDF("u", "d"), col("u"), col("d")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_churn") == 0L)
      assert(r.getAs[Long]("s_e12") == 1000000000000L)
      assert(r.getAs[Double]("survival") == 1.0)
    }
  }

  test("skyline2d and prefix sums: degenerate inputs") {
    // single point is its own frontier
    val one = SampleOps.skyline2d(Seq((7L, 3L, 9L)).toDF("id", "g", "c"),
      col("g"), col("c"), Seq(col("id"))).collect()
    assert(one.map(_.getAs[Long]("id")).toSeq == Seq(7L))
    // empty input: prefix sums return an empty frame with the _cum columns present
    val empty = graft.operators.Cdc.assignPrefixSums(
      Seq.empty[(Long, Long)].toDF("k", "x"), Seq(col("k")), Seq("x"))
    assert(empty.columns.contains("x_cum") && empty.count() == 0)
    // single partition: identical to the sequential fold
    val sp = graft.operators.Cdc.assignPrefixSums(
      Seq((3L, 1L), (1L, 2L), (2L, 4L)).toDF("k", "x").coalesce(1),
      Seq(col("k")), Seq("x"))
      .orderBy(col("k")).collect().map(_.getAs[Long]("x_cum")).toSeq
    assert(sp == Seq(2L, 6L, 7L))
  }

  // ---- Difference-in-differences ----------------------------------------------------------

  test("diffInDiff: planted treatment effect recovered exactly, trends removed") {
    // base level 10, common post-period trend +3, treatment effect +5 post-only
    val rows = (1L to 100L).flatMap { u =>
      val treat = u % 2 == 1
      val base = 10.0 + (u % 7) // unit heterogeneity (cancels within cells? no — but
      // identical unit mix in both periods, so pre/post differencing removes it)
      Seq((u, treat, false, base),
        (u, treat, true, base + 3.0 + (if (treat) 5.0 else 0.0)))
    }.toDF("u", "tr", "po", "v")
    val out = SampleOps.diffInDiff(rows, lit("all"), col("tr"), col("po"), col("v"))
      .collect()
    assert(out.length == 2) // 'all' + rollup 'ALL'
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("did") - 5.0) < 1e-9)
      assert(r.getAs[Long]("n_treat_pre") == 50L)
      assert(r.getAs[Long]("n_ctrl_post") == 50L)
    }
  }

  test("diffInDiff: per-group rows plus ALL rollup, null means on empty cells") {
    val rows = Seq(
      ("a", true, false, 1.0), ("a", true, true, 2.0),
      ("a", false, false, 1.0), ("a", false, true, 1.0),
      ("b", true, false, 4.0) // group b missing 3 cells
    ).toDF("g", "tr", "po", "v")
    val out = SampleOps.diffInDiff(rows, col("g"), col("tr"), col("po"), col("v"))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out.keySet == Set("a", "b", "ALL"))
    assert(math.abs(out("a").getAs[Double]("did") - 1.0) < 1e-9)
    assert(out("b").isNullAt(out("b").fieldIndex("did"))) // undefined, never a fake 0
  }

  // ---- e-BH -------------------------------------------------------------------------------

  test("ebhFdr: strong effect discovered, null metrics survive, k ranks by e-value") {
    // metric "lift": arm 1 pays +50 over arm 0 (n=400/arm) — overwhelming evidence;
    // "null1"/"null2": identical arms. Deterministic value wiggle keeps variance > 0.
    val rows =
      (1L to 800L).map { i =>
        ("lift", i % 2, 100.0 + (i % 5) + (if (i % 2 == 1) 50.0 else 0.0))
      } ++ (1L to 800L).map { i => ("null1", i % 2, 100.0 + (i % 5)) } ++
        (1L to 800L).map { i => ("null2", i % 2, 100.0 + (i % 7)) }
    val out = SampleOps.ebhFdr(rows.toDF("m", "a", "v"),
      col("m"), col("a"), col("v")).collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    assert(out("lift").getAs[Boolean]("discovery"))
    assert(out("lift").getAs[Long]("k") == 1L) // largest e-value
    assert(!out("null1").getAs[Boolean]("discovery"))
    assert(!out("null2").getAs[Boolean]("discovery"))
    assert(out("lift").getAs[Double]("log10_e") >
      out("null1").getAs[Double]("log10_e"))
  }

  test("ebhFdr: e-BH closure — discovery set is exactly ranks 1..k_hat") {
    // two strong metrics, one null: discoveries must be a prefix of the e-ranking
    val rows =
      (1L to 600L).map { i =>
        ("m1", i % 2, 10.0 + (i % 3) + (if (i % 2 == 1) 40.0 else 0.0))
      } ++ (1L to 600L).map { i =>
        ("m2", i % 2, 10.0 + (i % 3) + (if (i % 2 == 1) 30.0 else 0.0))
      } ++ (1L to 600L).map { i => ("m0", i % 2, 10.0 + (i % 3)) }
    val out = SampleOps.ebhFdr(rows.toDF("m", "a", "v"),
      col("m"), col("a"), col("v")).collect()
    val discovered = out.filter(_.getAs[Boolean]("discovery")).map(_.getAs[Long]("k")).sorted
    assert(discovered.sameElements(1L to discovered.length)) // contiguous prefix
    assert(discovered.length == 2)
  }

  // ---- Lorenz deciles ---------------------------------------------------------------------

  test("ev_lorenz via the entry: 9 one-event users + 1 nine-event user, exact decile shares") {
    // write a tiny events table and run the declared query against it
    val dir = java.nio.file.Files.createTempDirectory("graft-lorenz").toString
    val rows = ((1L to 9L).map(u => (u * 100, u)) ++
      (1L to 9L).map(i => (9000L + i, 10L)))
      .map { case (eid, uid) =>
        (eid, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), uid, "view", 1.0, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_lorenz")(spark, dir).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_users_cum"), r.getAs[Long]("events_cum"),
          r.getAs[Double]("share")))).toMap
    // N=10, total=18: decile d<=9 holds d events; the top decile adds the 9-event user
    assert(out(5) == ((5L, 5L, math.rint(5.0 / 18 * 1e6) / 1e6)))
    assert(out(9) == ((9L, 9L, 0.5)))
    assert(out(10) == ((10L, 18L, 1.0)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("ev_qini via the entry: planted uplift of 50 dollars per treated user") {
    // 100 users, distinct scores (user_id dollars pre-period), post outcome
    // 100 + 50*treated dollars: per decile prefix (10d users, 5d per arm)
    // qini = yt - yc*nt/nc = (150*5d - 100*5d) dollars = 250d
    val dir = java.nio.file.Files.createTempDirectory("graft-qini").toString
    val pre = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val post = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val rows = (1L to 100L).flatMap { u =>
      val y = if (u % 2 == 1) 150.0 else 100.0
      Seq((u * 2, pre, u, "view", u.toDouble, "{}"),
        (u * 2 + 1, post, u, "purchase", y, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_qini")(spark, dir).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_included"), r.getAs[Long]("n_treat"),
          r.getAs[Double]("qini_dollars")))).toMap
    (1L to 10L).foreach { d =>
      assert(out(d) == ((10 * d, 5 * d, 250.0 * d)), s"decile $d: ${out(d)}")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("ev_shapley_attribution via the entry: hand-computed two-channel game") {
    // v({a})=0.4 (4/10 convert), v({b})=0.2, v({a,b})=0.8, v(empty)=0 (unobserved)
    // phi_a = 1/2*(v(a)-v(0)) + 1/2*(v(ab)-v(b)) = 0.2 + 0.3 = 0.5
    // phi_b = 1/2*(v(b)-v(0)) + 1/2*(v(ab)-v(a)) = 0.1 + 0.2 = 0.3
    val dir = java.nio.file.Files.createTempDirectory("graft-shapley").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var eid = 0L
    def ev(u: Long, tpe: String) = { eid += 1; (eid, ts0, u, tpe, 1.0, "{}") }
    val rows =
      (1L to 10L).map(u => ev(u, "a")) ++ (1L to 4L).map(u => ev(u, "purchase")) ++
      (11L to 20L).map(u => ev(u, "b")) ++ (11L to 12L).map(u => ev(u, "purchase")) ++
      (21L to 30L).flatMap(u => Seq(ev(u, "a"), ev(u, "b"))) ++
      (21L to 28L).map(u => ev(u, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_shapley_attribution")(spark, dir).collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Double]("shapley")).toMap
    assert(math.abs(out("a") - 0.5) < 1e-6, s"got $out")
    assert(math.abs(out("b") - 0.3) < 1e-6, s"got $out")
    // efficiency: credits sum to v(grand coalition) - v(empty)
    assert(math.abs(out.values.sum - 0.8) < 1e-6)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  // ---- skyline ----------------------------------------------------------------------------

  test("skyline2d: hand-computed frontier, ties kept, higher-gain-equal-cost dominates") {
    // (gain, cost): frontier must be (1,10) (3,20)x2 (5,50); (2,10) dominates (1,10)?
    // no — (2,10) IS in the data? use: points where domination chains are explicit
    val rows = Seq(
      (1L, 1L, 10L),  // frontier iff nothing with gain>1 at cost<=10
      (2L, 1L, 12L),  // dominated by id 1 (same gain, higher cost)
      (3L, 3L, 20L),  // frontier
      (4L, 3L, 20L),  // tie of id 3 — both kept
      (5L, 2L, 20L),  // dominated by id 3 (higher gain, same cost)
      (6L, 5L, 50L),  // frontier (highest gain)
      (7L, 4L, 60L)   // dominated by 6 (higher gain, lower cost)
    ).toDF("id", "g", "c")
    val out = SampleOps.skyline2d(rows, col("g"), col("c"), Seq(col("id")))
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(out == Seq(1L, 3L, 4L, 6L), s"got $out")
    // equal cost at HIGHER gain dominates: add (8, 5, 10) — wipes ids 1, 3, 4
    val out2 = SampleOps.skyline2d(
      rows.union(Seq((8L, 5L, 10L)).toDF("id", "g", "c")),
      col("g"), col("c"), Seq(col("id")))
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(out2 == Seq(8L), s"got $out2")
  }

  // ---- Cochran–Mantel–Haenszel ------------------------------------------------------------

  test("cmhTest: MH odds ratio recovers the common per-stratum OR a pooled table distorts") {
    // both strata have OR = (90*2)/(10*8) = 2.25, but exposure and outcome rates are
    // mirrored across strata: the POOLED table reads OR = 92*92/(18*18) ~ 26 — the
    // Simpson-style mix distortion CMH exists to remove
    def rows(s: Long, e: Boolean, y: Boolean, n: Int) =
      Seq.fill(n)((s, e, y))
    val df = (rows(1, true, true, 90) ++ rows(1, true, false, 10) ++
      rows(1, false, true, 8) ++ rows(1, false, false, 2) ++
      rows(2, true, true, 2) ++ rows(2, true, false, 8) ++
      rows(2, false, true, 10) ++ rows(2, false, false, 90))
      .toDF("s", "e", "y")
    val out = SampleOps.cmhTest(df, col("s"), col("e"), col("y")).head()
    assert(out.getAs[Long]("n_strata") == 2L)
    assert(math.abs(out.getAs[Double]("or_mh") - 2.25) < 1e-9, s"got $out")
    // chi2 vs the driver-side formula over the same cells
    def term(a: Double, b: Double, c: Double, d: Double) = {
      val n = a + b + c + d
      (a - (a + b) * (a + c) / n, (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)))
    }
    val (t1, v1) = term(90, 10, 8, 2); val (t2, v2) = term(2, 8, 10, 90)
    val st = BigDecimal(t1).setScale(12, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(t2).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val sv = BigDecimal(v1).setScale(12, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(v2).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val chi2 = math.rint((math.abs(st.toDouble) - 0.5) * (math.abs(st.toDouble) - 0.5)
      / sv.toDouble * 1e6) / 1e6
    assert(math.abs(out.getAs[Double]("chi2_cmh") - chi2) < 1e-9,
      s"got ${out.getAs[Double]("chi2_cmh")}, expected $chi2")
  }

  test("ev_granger via the entry: planted lag-1 dependence dominates the reverse direction") {
    // purchases on day t = clicks on day t-1 EXACTLY: the unrestricted model's
    // residual collapses in the clicks->purchases direction; the reverse gains
    // little (clicks are hash-pseudo-random)
    val dir = java.nio.file.Files.createTempDirectory("graft-granger").toString
    def clicksOn(t: Long): Int = (5 + ((t * 2654435761L) % 23)).toInt
    var eid = 0L
    val rows = (0L until 60L).flatMap { t =>
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val dayTs = new java.sql.Timestamp(ts.getTime + t * 86400000L)
      val clicks = (1 to clicksOn(t)).map { _ =>
        eid += 1; (eid, dayTs, eid % 50, "click", 1.0, "{}")
      }
      // +1 on alternate days keeps rssU > 0 (a PERFECT fit leaves F undefined/NULL)
      val purchases = if (t == 0) Seq.empty
        else (1 to clicksOn(t - 1) + (t % 2).toInt).map { _ =>
          eid += 1; (eid, dayTs, eid % 50, "purchase", 1.0, "{}")
        }
      clicks ++ purchases
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_granger")(spark, dir).collect()
      .map(r => r.getAs[String]("direction") -> r.getAs[Double]("f_stat")).toMap
    val fwd = out("clicks->purchases"); val rev = out("purchases->clicks")
    assert(fwd > 100.0, s"planted causality missed: fwd=$fwd rev=$rev")
    assert(fwd > 10 * math.max(rev, 0.1), s"direction not separated: fwd=$fwd rev=$rev")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("breslowDay: zero on homogeneous strata, large on reversed odds ratios") {
    def rows(s: Long, e: Boolean, y: Boolean, n: Int) = Seq.fill(n)((s, e, y))
    // identical 2x2 in both strata (OR 2.25 everywhere): fitted == observed, chi2 ~ 0
    def stratum(s: Long) = rows(s, true, true, 90) ++ rows(s, true, false, 40) ++
      rows(s, false, true, 50) ++ rows(s, false, false, 50)
    val homo = SampleOps.breslowDay((stratum(1) ++ stratum(2)).toDF("s", "e", "y"),
      col("s"), col("e"), col("y")).head()
    assert(homo.getAs[Long]("df") == 1L)
    assert(homo.getAs[Double]("chi2_bd") < 1e-6, s"homogeneous strata: $homo")
    // stratum 1 OR = 4, stratum 2 OR = 1/4: strongly heterogeneous
    val hetero = SampleOps.breslowDay(
      (rows(1, true, true, 80) ++ rows(1, true, false, 20) ++
        rows(1, false, true, 50) ++ rows(1, false, false, 50) ++
        rows(2, true, true, 20) ++ rows(2, true, false, 80) ++
        rows(2, false, true, 50) ++ rows(2, false, false, 50)).toDF("s", "e", "y"),
      col("s"), col("e"), col("y")).head()
    assert(hetero.getAs[Double]("chi2_bd") > 10.0, s"reversed ORs must reject: $hetero")
  }

  // ---- Kolmogorov–Smirnov -----------------------------------------------------------------

  test("ksTest: equal-mean variance drift rejected, identical samples accepted, naive D match") {
    // group a: values 100±5 pattern; group b: same mean 100, spread ±40 — a t-test
    // is blind here, KS is not
    val rows = (1L to 800L).flatMap { i =>
      Seq(("a", 100.0 + (i % 11).toDouble - 5.0),
        ("b", 100.0 + ((i % 9).toDouble - 4.0) * 10.0))
    }.toDF("g", "v")
    val out = SampleOps.ksTest(rows, col("g"), col("v"), "a", "b").head()
    assert(out.getAs[Boolean]("reject_05"), s"variance drift missed: $out")
    // naive replica of D on the same cents quantization
    def cdfD(va: Seq[Long], vb: Seq[Long]): Double = {
      val grid = (va ++ vb).distinct.sorted
      grid.map { x =>
        math.abs(va.count(_ <= x).toDouble / va.size - vb.count(_ <= x).toDouble / vb.size)
      }.max
    }
    val va = (1L to 800L).map(i => ((100.0 + (i % 11) - 5.0) * 100).round)
    val vb = (1L to 800L).map(i => ((100.0 + ((i % 9) - 4.0) * 10.0) * 100).round)
    assert(math.abs(out.getAs[Double]("d") - cdfD(va, vb)) < 1e-6)
    // identical samples: D = 0, never rejected
    val same = (1L to 400L).flatMap(i =>
      Seq(("a", (i % 13).toDouble), ("b", (i % 13).toDouble))).toDF("g", "v")
    val out2 = SampleOps.ksTest(same, col("g"), col("v"), "a", "b").head()
    assert(out2.getAs[Long]("d_num") == 0L && !out2.getAs[Boolean]("reject_05"))
  }

  // ---- linear-time MMD drift --------------------------------------------------------------

  /** ids 0..n-1 with vector builder f(id). */
  private def embRows(n: Int, dim: Int)(f: (Long, Int) => Float) =
    (0L until n).map(i => (i, Array.tabulate(dim)(j => f(i, j)))).toDF("id", "v")

  test("mmdDrift: parity-interleaved identical distributions read as no drift") {
    // deterministic pseudo-random unit-scale vectors, identical law for even/odd ids
    val df = embRows(400, 16) { (i, j) =>
      (((i / 4) * 31 + j * 17) % 13 - 6).toFloat / 10f // period-13 pattern, |x| <= 0.6
    }
    val out = graft.ops.VectorOps.mmdDrift(df, col("id"), col("v"), dim = 16)
      .head()
    assert(out.getAs[Long]("n_pairs") == 100L)
    assert(!out.getAs[Boolean]("drift"),
      s"null split flagged drift: mmd2=${out.getAs[Double]("mmd2")}")
  }

  test("mmdDrift: a planted mean shift on the odd stream is detected") {
    // odd ids (the Y stream) get a +0.4 shift on every coordinate
    val df = embRows(400, 16) { (i, j) =>
      val base = (((i / 4) * 31 + j * 17) % 13 - 6).toFloat / 20f
      if (i % 2 == 1) base + 0.4f else base
    }
    val out = graft.ops.VectorOps.mmdDrift(df, col("id"), col("v"), dim = 16)
      .head()
    assert(out.getAs[Boolean]("drift"),
      s"planted shift missed: mmd2=${out.getAs[Double]("mmd2")}")
    assert(out.getAs[Double]("mmd2") > 0.001)
  }

  test("mmdDrift: matches the naive driver-side estimator exactly") {
    val n = 80; val dim = 8; val scale = 1000
    def vec(i: Long): Array[Float] =
      Array.tabulate(dim)(j => (((i * 37 + j * 11) % 19 - 9).toFloat / 25f))
    val real = (0L until n).map(i => (i, vec(i))).toDF("id", "v")
    val out = graft.ops.VectorOps.mmdDrift(real, col("id"), col("v"), dim = dim)
      .head()
    // naive replication of the same quantized integer pipeline
    def q(a: Array[Float]): Array[Long] =
      a.map(x => math.floor(x.toDouble * scale).toLong)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (p, r) => p * r }.sum
    val hs = (0 until n.toInt / 4).map { g =>
      val (x1, y1, x2, y2) =
        (q(vec(4L * g)), q(vec(4L * g + 1)), q(vec(4L * g + 2)), q(vec(4L * g + 3)))
      BigInt(dot(x1, x2)).pow(2) + BigInt(dot(y1, y2)).pow(2) -
        BigInt(dot(x1, y2)).pow(2) - BigInt(dot(x2, y1)).pow(2)
    }
    val denom = { val b = dim.toDouble * scale * scale; b * b }
    val expected = BigDecimal(hs.sum.toDouble / (hs.length * denom))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Long]("n_pairs") == n / 4)
    assert(math.abs(out.getAs[Double]("mmd2") - expected) < 1e-9,
      s"got ${out.getAs[Double]("mmd2")}, expected $expected")
  }
}
