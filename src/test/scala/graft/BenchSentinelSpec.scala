package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sentinel v2 logic (VERDICT r6 #1): endpoint-only calibration shipped a 9.5x
  * mid-sweep outlier with tainted:false. These specs inject synthetic load patterns
  * into the pure span/outlier functions and assert the transient is flagged. */
class BenchSentinelSpec extends AnyFunSuite {
  private val ref = Bench.CalibrationRef
  private val taint = Bench.TaintFactor
  private val quiet = ref * 0.8
  private val loaded = ref * 3.0

  test("quiet sweep: no suspect spans") {
    val samples = Seq((0, quiet), (25, quiet), (50, quiet), (60, quiet))
    assert(Bench.suspectSpans(samples, ref, taint).isEmpty)
  }

  test("mid-sweep transient (the r6 failure mode): both adjacent spans flagged, endpoints clean") {
    // load arrives somewhere in (25,50], seen by the sample at 50, gone by 75:
    // queries 25..74 are unreliable — the deviating sample taints the span on BOTH
    // sides (load may have arrived before or left after the sample was taken).
    val samples = Seq((0, quiet), (25, quiet), (50, loaded), (75, quiet), (90, quiet))
    val s = Bench.suspectSpans(samples, ref, taint)
    assert(s == (25 until 75).toSet)
    // endpoint-only view would have said tainted:false — exactly the blind spot
    assert(samples.head._2 <= ref * taint && samples.last._2 <= ref * taint)
  }

  test("load at the very start: first span flagged via the before-sample") {
    val samples = Seq((0, loaded), (25, quiet), (50, quiet))
    assert(Bench.suspectSpans(samples, ref, taint) == (0 until 25).toSet)
  }

  test("sustained load across several samples: union of spans") {
    val samples = Seq((0, quiet), (25, loaded), (50, loaded), (75, quiet))
    assert(Bench.suspectSpans(samples, ref, taint) == (0 until 75).toSet)
  }

  test("single-sample degenerate input: no spans, no crash") {
    assert(Bench.suspectSpans(Seq((0, loaded)), ref, taint).isEmpty)
    assert(Bench.suspectSpans(Nil, ref, taint).isEmpty)
  }

  test("history outliers: >3x committed value and above the floor") {
    val hist = Map("a" -> 0.76, "b" -> 0.10, "c" -> 0.50, "d" -> 2.0)
    val sweep = Seq(
      "a" -> 6.999, // the r6 doc_bpe_encode case: 9.2x history -> requery
      "b" -> 0.25, // 2.5x but under the 0.3s floor -> noise, skip
      "c" -> 0.60, // 1.2x -> fine
      "d" -> 2.1, // fine
      "e" -> 9.0) // no history -> cannot judge, skip
    assert(Bench.historyOutliers(sweep, hist) == Seq("a"))
  }

  test("span triage: history clears span members that measured fine; keeps slow + unknown") {
    val hist = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val sweep = Seq(
      "a" -> 1.1, // in span, matches history -> cleared
      "b" -> 2.0, // in span, 2x history -> confirmed suspect
      "c" -> 1.2, // not in span -> untouched either way
      "d" -> 0.5) // in span, NO history -> stays suspect (cannot adjudicate)
    val spans = Set(0, 1, 3)
    assert(Bench.confirmSuspects(spans, sweep, hist) == Set(1, 3))
    // no history at all: every span member stays (the conservative default)
    assert(Bench.confirmSuspects(spans, sweep, Map.empty) == spans)
  }

  test("history outliers: zero/negative history values never divide into a flag") {
    val hist = Map("a" -> 0.0, "b" -> -1.0)
    assert(Bench.historyOutliers(Seq("a" -> 5.0, "b" -> 5.0), hist).isEmpty)
  }

  // --- sentinel v3: aggregate drift (VERDICT r7 #1) --------------------------------
  // The r7 driver artifact: +23% total, load_avg 5.58, 12 entries >2x history, yet
  // tainted:false — steady moderate load stays under the 1.3x calibration line and the
  // 3x per-query requery factor. These specs replay that shape through the pure
  // sentinelPlan and assert the aggregate path now catches it.

  private def uniformSweep(n: Int, histVal: Double, inflate: Double): (Seq[(String, Double)], Map[String, Double]) = {
    val names = (1 to n).map(i => s"q$i")
    (names.map(_ -> histVal * inflate), names.map(_ -> histVal).toMap)
  }

  test("v3: uniformly 1.6x-inflated sweep under quiet calibration triggers the aggregate requery path") {
    val (sweep, hist) = uniformSweep(100, histVal = 1.0, inflate = 1.6)
    val calm = Seq((0, quiet), (50, quiet), (100, quiet))
    val p = Bench.sentinelPlan(calm, sweep, hist)
    // v2 alone would requery nothing: no span deviates, nothing is >3x history
    assert(Bench.suspectSpans(calm, ref, taint).isEmpty)
    assert(Bench.historyOutliers(sweep, hist).isEmpty)
    // v3: median ratio 1.6 > 1.25 -> every entry >1.5x history goes to isolated re-run
    assert(p.aggregateDrift)
    assert(p.medianRatio.exists(m => math.abs(m - 1.6) < 1e-9))
    assert(p.requery.size == Bench.RequeryBudget && p.overBudget)
  }

  test("v3: the r7 shape — moderate median drift, a tail of >1.5x entries, budget respected") {
    // 60 entries near history (1.2x, under the per-entry requery line), 20 at 2.3x:
    // median 1.2x... make it 1.3x so the median crosses the 1.25 line like r7's +23%.
    val base = (1 to 60).map(i => s"ok$i" -> 1.3)
    val slow = (1 to 20).map(i => s"slow$i" -> 2.3)
    val hist = (base ++ slow).map { case (n, _) => n -> 1.0 }.toMap
    val sweep = base ++ slow
    val calm = Seq((0, quiet), (40, quiet), (80, quiet))
    val p = Bench.sentinelPlan(calm, sweep, hist)
    assert(p.aggregateDrift)
    // only the confirmed >1.5x tail is re-run (20 entries), not the 1.3x bulk
    assert(p.requery.toSet == slow.map(_._1).toSet)
    assert(!p.overBudget)
  }

  test("v3: one legitimate 10x regression among quiet entries does NOT move the median") {
    val (okSweep, hist0) = uniformSweep(60, histVal = 1.0, inflate = 1.02)
    val sweep = okSweep :+ ("regressed" -> 10.0)
    val hist = hist0 + ("regressed" -> 1.0)
    val p = Bench.sentinelPlan(Seq((0, quiet), (61, quiet)), sweep, hist)
    assert(!p.aggregateDrift) // median ~1.02: the fleet is fine
    assert(p.requery == Seq("regressed")) // but the outlier still re-runs (v2 path)
  }

  test("v3: median abstains below DriftMinSamples comparable entries (scoped local runs)") {
    val (sweep, hist) = uniformSweep(Bench.DriftMinSamples - 1, 1.0, 2.0)
    assert(Bench.medianHistoryRatio(sweep, hist).isEmpty)
    val p = Bench.sentinelPlan(Seq((0, quiet), (19, quiet)), sweep, hist)
    assert(!p.aggregateDrift)
  }

  test("v3: sub-floor entries and history-less entries excluded from the median") {
    // 25 tiny entries wildly inflated but under the 0.3s floor on both sides + 25
    // genuine entries at 1.0x -> median 1.0, no drift
    val tiny = (1 to 25).map(i => s"t$i" -> 0.09)
    val real = (1 to 25).map(i => s"r$i" -> 1.0)
    val hist = (tiny.map { case (n, _) => n -> 0.03 } ++ real).toMap
    val m = Bench.medianHistoryRatio(tiny ++ real, hist)
    assert(m.exists(v => math.abs(v - 1.0) < 1e-9))
  }

  test("v3: failed queries (t = -1) never enter the drift median (ADVICE r8)") {
    // 30 genuinely-drifted entries at 1.4x + 25 failures carrying t = -1: admitting
    // the failures would inject ratio -1.0 below the sorted median and mask the drift
    val drifted = (1 to 30).map(i => s"d$i" -> 1.4)
    val failed = (1 to 25).map(i => s"f$i" -> -1.0)
    val hist = (drifted.map { case (n, _) => n -> 1.0 } ++
      failed.map { case (n, _) => n -> 1.0 }).toMap
    val m = Bench.medianHistoryRatio(drifted ++ failed, hist)
    assert(m.exists(v => math.abs(v - 1.4) < 1e-9),
      s"failures polluted the median: $m")
    val p = Bench.sentinelPlan(Seq((0, quiet), (55, quiet)), drifted ++ failed, hist)
    assert(p.aggregateDrift, "drift masked by failed entries")
  }

  test("RequeryBudget overflow taints (VERDICT r7 #3): suspect set beyond budget -> overBudget") {
    // two separated transients each suspect 2 spans of 50 with no history to clear
    // them: 200 suspects >> budget 64
    val names = (0 until 200).map(i => s"q$i")
    val sweep = names.map(_ -> 1.0)
    val samples = Seq((0, quiet), (50, loaded), (100, quiet), (150, loaded), (200, quiet))
    val p = Bench.sentinelPlan(samples, sweep, Map.empty)
    assert(p.overBudget)
    assert(p.requery.size == Bench.RequeryBudget)
    // and the requery list is a prefix of the wanted set, never beyond the budget
    assert(p.requery.toSet.subsetOf(names.toSet))
  }

  test("v3: failed queries (t<0) never enter the requery list even under drift") {
    val (okSweep, hist0) = uniformSweep(30, 1.0, 1.6)
    val sweep = okSweep :+ ("broken" -> -1.0)
    val hist = hist0 + ("broken" -> 1.0)
    val p = Bench.sentinelPlan(Seq((0, quiet), (31, quiet)), sweep, hist)
    assert(p.aggregateDrift && !p.requery.contains("broken"))
  }

  test("loadHistory parses the committed artifact shape and tolerates garbage") {
    val dir = java.nio.file.Files.createTempDirectory("benchhist")
    val good = dir.resolve("BENCH.json")
    java.nio.file.Files.writeString(good,
      """{"metric":"total","value":1.5,"unit":"sec","queries":{"q1":0.5,"q2":1.0},"sf":"x"}""")
    assert(Bench.loadHistory(good.toString) == Map("q1" -> 0.5, "q2" -> 1.0))
    val bad = dir.resolve("garbage.json")
    java.nio.file.Files.writeString(bad, "not json at all")
    assert(Bench.loadHistory(bad.toString).isEmpty)
    assert(Bench.loadHistory(dir.resolve("missing.json").toString).isEmpty)
  }

  test("history-reset convention (VERDICT r12 #3b): re-specified entries get fresh-entry semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-reset")
    val f = dir.resolve("BENCH.json")
    java.nio.file.Files.writeString(f,
      """{"queries":{"q_old_spec":5.8,"q_normal":1.0}}""")
    // dropping the re-specified entry removes it from history entirely, so the
    // sentinel treats its new-spec time as a first run: no outlier requery (a
    // 0.34s run vs 5.8s old-spec history is NOT a 0.059 drift signal), and the
    // drift median never sees the stale ratio
    val h = Bench.loadHistory(f.toString, respecified = Set("q_old_spec"))
    assert(h == Map("q_normal" -> 1.0))
    val sweep = Seq("q_old_spec" -> 0.34, "q_normal" -> 1.05)
    assert(Bench.historyOutliers(sweep, h).isEmpty)
    assert(Bench.medianHistoryRatio(sweep, h, minSamples = 1) == Some(1.05))
    // an empty reset set leaves history untouched (the default round-to-round path)
    assert(Bench.loadHistory(f.toString, respecified = Set.empty).size == 2)
  }
}
