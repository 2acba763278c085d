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
}
