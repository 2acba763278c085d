package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.ops.SampleOps

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonBootstrapCi: degenerate on constant values; brackets the mean otherwise") {
    // constant value: every replica mean IS the value -> ci_lo = mean = ci_hi exactly
    val const = (1L to 400L).map(i => (i, 25.0)).toDF("id", "v")
    val c = graft.ops.SampleOps.poissonBootstrapCi(const, col("id"), col("v")).head()
    assert(c.getAs[Double]("mean") == 25.0)
    assert(c.getAs[Double]("ci_lo") == 25.0 && c.getAs[Double]("ci_hi") == 25.0)

    // spread values: the interval must bracket the point estimate and have positive width
    val spread = (1L to 400L).map(i => (i, (i % 97).toDouble + 1)).toDF("id", "v")
    val s = graft.ops.SampleOps.poissonBootstrapCi(spread, col("id"), col("v")).head()
    assert(s.getAs[Double]("ci_lo") < s.getAs[Double]("mean"))
    assert(s.getAs[Double]("mean") < s.getAs[Double]("ci_hi"))
    assert(s.getAs[Long]("n_rows") == 400L)

    // the xxh64 scale draw satisfies the same invariants (values differ — different PRNG)
    val f = graft.ops.SampleOps.poissonBootstrapCi(spread, col("id"), col("v"),
      md5Draw = false).head()
    assert(f.getAs[Double]("ci_lo") < f.getAs[Double]("mean"))
    assert(f.getAs[Double]("mean") < f.getAs[Double]("ci_hi"))
  }

  test("ev_qte: a tail-only effect moves p90 and leaves the median flat") {
    // arm 0 (even users): values 1..100; arm 1 (odd): same except the top 15 values
    // (86..100) shifted +50 — interpolated p90 (pos 89.1 of 0..99) sits fully inside
    // the shifted region, while p75 (pos 74.25) and below are untouched
    val base = java.nio.file.Files.createTempDirectory("graft-qte-spec").toString
    val rows = (1 to 100).flatMap { i =>
      val shifted = if (i > 85) i + 50.0 else i.toDouble
      Seq((i.toLong * 2, 0L + i * 2, i.toDouble), (i.toLong * 2 + 1, 1L + i * 2, shifted))
    }.zipWithIndex.map { case ((uid, _, v), n) =>
      (n.toLong, new java.sql.Timestamp(1000L * n), uid, "view", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val qte = SparkEntry.queries("ev_qte")(spark, base).collect()
      .map(r => r.getAs[String]("quantile") -> r.getAs[Double]("qte")).toMap
    assert(qte("p50") == 0.0, s"median must be untouched: $qte")
    assert(qte("p25") == 0.0 && qte("p10") == 0.0 && qte("p75") == 0.0,
      s"lower quantiles untouched: $qte")
    assert(qte("p90") >= 40.0, s"p90 must carry the planted tail shift: $qte")
    // the maintained twin produces the identical rows on the same input
    val inc = SparkEntry.queries("ev_qte_incremental")(spark, base).collect()
      .map(r => (r.getAs[String]("quantile"), r.getAs[Double]("q_control"),
        r.getAs[Double]("q_treatment"), r.getAs[Double]("qte"))).sortBy(_._1).toSeq
    val one = SparkEntry.queries("ev_qte")(spark, base).collect()
      .map(r => (r.getAs[String]("quantile"), r.getAs[Double]("q_control"),
        r.getAs[Double]("q_treatment"), r.getAs[Double]("qte"))).sortBy(_._1).toSeq
    assert(inc == one, s"maintained QTE diverged:\n inc=$inc\n one=$one")
  }

  test("poissonBootstrapDiffCi: planted effect detected, null effect spans zero") {
    // arm 1 = arm 0 shifted by +5: effect = 5 exactly, CI brackets it, significant
    val planted = ((1L to 400L).map(i => (i * 2, 0, (i % 83).toDouble + 1)) ++
      (1L to 400L).map(i => (i * 2 + 1, 1, (i % 83).toDouble + 6))).toDF("id", "a", "v")
    val p = graft.ops.SampleOps.poissonBootstrapDiffCi(planted, col("a"), col("id"), col("v")).head()
    assert(p.getAs[Double]("effect") == 5.0)
    assert(p.getAs[Double]("ci_lo") <= 5.0 && 5.0 <= p.getAs[Double]("ci_hi"))
    assert(p.getAs[Boolean]("significant"), s"planted +5 effect must be significant: $p")
    // identical arms: effect 0, the interval must span zero -> not significant
    val nullEff = ((1L to 400L).map(i => (i * 2, 0, (i % 83).toDouble + 1)) ++
      (1L to 400L).map(i => (i * 2 + 1, 1, (i % 83).toDouble + 1))).toDF("id", "a", "v")
    val n = graft.ops.SampleOps.poissonBootstrapDiffCi(nullEff, col("a"), col("id"), col("v")).head()
    assert(n.getAs[Double]("ci_lo") <= 0.0 && 0.0 <= n.getAs[Double]("ci_hi"))
    assert(!n.getAs[Boolean]("significant"), s"null effect flagged significant: $n")
  }

  test("poissonBootstrapCiGrouped: per-group CIs bracket their means; degenerate group collapses") {
    // group A constant (degenerate CI), group B spread — one scan serves both
    val df = ((1L to 400L).map(i => ("A", i, 10.0)) ++
      (1L to 400L).map(i => ("B", i + 1000, (i % 83).toDouble + 1))).toDF("g", "id", "v")
    val rows = graft.ops.SampleOps.poissonBootstrapCiGrouped(df, col("g"), col("id"), col("v"))
      .collect().map(r => r.getAs[String]("metric") -> r).toMap
    val a = rows("A")
    assert(a.getAs[Double]("mean") == 10.0 &&
      a.getAs[Double]("ci_lo") == 10.0 && a.getAs[Double]("ci_hi") == 10.0)
    val b = rows("B")
    assert(b.getAs[Double]("ci_lo") < b.getAs[Double]("mean"))
    assert(b.getAs[Double]("mean") < b.getAs[Double]("ci_hi"))
    assert(b.getAs[Long]("n_rows") == 400L && b.getAs[Long]("n_replicas") == 40L)
  }

  test("srmCheck: balanced split passes, a planted 60/40 imbalance is detected") {
    // 500 units split 250/250: chi2 = 0, no SRM
    val even = (0L until 500L).map(u => (u, "e")).toDF("user_id", "x")
    val ok = graft.ops.SampleOps.srmCheck(even, col("user_id"), pmod(col("user_id"), lit(2))).head()
    assert(ok.getAs[Long]("n_a") == 250L && ok.getAs[Long]("n_b") == 250L)
    assert(ok.getAs[Double]("chi2") == 0.0 && !ok.getAs[Boolean]("srm_detected"))
    // 300 vs 200: chi2 = 100^2/500 = 20 >> 3.84 — detected; duplicate rows per unit
    // must not inflate the distinct-unit counts
    val planted = ((0L until 300L).map(u => (u * 2, "dup")) ++
      (0L until 300L).map(u => (u * 2, "dup2")) ++ // same 300 arm-0 units twice
      (0L until 200L).map(u => (u * 2 + 1, "b"))).toDF("user_id", "x")
    val bad = graft.ops.SampleOps.srmCheck(planted, col("user_id"), pmod(col("user_id"), lit(2))).head()
    assert(bad.getAs[Long]("n_a") == 300L && bad.getAs[Long]("n_b") == 200L)
    assert(math.abs(bad.getAs[Double]("chi2") - 20.0) < 1e-9)
    assert(bad.getAs[Boolean]("srm_detected"))
  }

  test("powerMde: closed-form MDE on a known two-arm variance; filters sub-2 arms") {
    // arm 0: values 1..100, arm 1: values 1..100 (same variance), one metric
    val df = ((1L to 100L).map(i => ("m", 0, i.toDouble)) ++
      (1L to 100L).map(i => ("m", 1, i.toDouble))).toDF("m", "a", "v")
    val r = graft.ops.SampleOps.powerMde(df, col("m"), col("a"), col("v")).head()
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("n_b") == 100L)
    // pooled s^2 of 1..100 (both arms identical) = var = 841.6666...; in cents^2 it
    // scales by 100^2; mde_abs = 2.801585 * sqrt(s2 * (2/100)) back in units
    val s2 = (1 to 100).map(x => math.pow(x - 50.5, 2)).sum * 2 / 198.0
    val expect = (1.959964 + 0.841621) * math.sqrt(s2 * 0.02)
    assert(math.abs(r.getAs[Double]("mde_abs") - expect) < 1e-3,
      s"mde_abs=${r.getAs[Double]("mde_abs")} expect=$expect")
    assert(math.abs(r.getAs[Double]("mean") - 50.5) < 1e-9)
    // a metric with a 1-row arm is excluded (variance undefined)
    val tiny = Seq(("t", 0, 1.0), ("t", 1, 2.0), ("t", 0, 3.0)).toDF("m", "a", "v")
    assert(graft.ops.SampleOps.powerMde(tiny, col("m"), col("a"), col("v")).count() == 0)
  }

  test("dsirSample: target-domain lookalikes out-rank off-domain docs; k and determinism hold") {
    // target lang 'en' docs share a vocabulary; 'xx' raw docs either mimic it (should
    // score HIGH) or use a disjoint vocabulary (should score LOW)
    val en = (0L until 30L).map(i => (i, "en", s"the quick brown fox jumps over lazy dog $i"))
    val mimic = (100L until 110L).map(i => (i, "xx", s"the quick brown fox jumps high $i"))
    val off = (200L until 230L).map(i => (i, "xx", s"zzz qqq www kkk jjj vvv $i unrelated"))
    val df = (en ++ mimic ++ off).toDF("doc_id", "lang", "text")
    val out = graft.ops.SampleOps.dsirSample(df, k = 40).collect()
    assert(out.length == 40)
    val picked = out.map(_.getAs[Long]("doc_id")).toSet
    val w = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log10_w")).toMap
    // every mimic doc must out-weigh every off-domain doc
    val mimicW = w.filter(x => x._1 >= 100 && x._1 < 110).values
    val offW = w.filter(_._1 >= 200).values
    assert(mimicW.nonEmpty && (offW.isEmpty || mimicW.min > offW.max),
      s"mimic weights $mimicW must dominate off-domain $offW")
    // deterministic: the same call returns the same membership
    val again = graft.ops.SampleOps.dsirSample(df, k = 40).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again == picked)
  }
}

class SampleAndAsOfSpec extends SparkSpec {
  import spark.implicits._

  // ---- as-of join -------------------------------------------------------------------------

  private lazy val trades = Seq(
    (1L, "A", 10L), (2L, "A", 25L), (3L, "A", 31L), (4L, "B", 5L), (5L, "C", 50L)
  ).toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", 5L, 100.0), ("A", 25L, 110.0), ("A", 40L, 120.0), ("B", 9L, 50.0)
  ).toDF("sym", "t", "px")

  test("asofBackward: latest right row at or before each left time, per key") {
    val out = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(out(1L).contains(100.0)) // t=10: quote@5
    assert(out(2L).contains(110.0)) // t=25: inclusive match of the equal-time quote
    assert(out(3L).contains(110.0)) // t=31: quote@40 is in the future
    assert(out(4L).isEmpty)         // t=5: no quote yet for B
    assert(out(5L).isEmpty)         // no quotes at all for C
  }

  test("asofBackward: tolerance nulls out stale matches; struct carry keeps rows atomic") {
    val out = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", Seq("px", "t"),
      tolerance = Some(lit(6L)))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(out(1L).contains(100.0)) // 10-5=5 <= 6 -> kept
    assert(out(2L).contains(110.0)) // 0 back
    assert(out(3L).contains(110.0)) // 31-25=6 <= 6 -> kept
    val outTight = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", Seq("px"),
      tolerance = Some(lit(3L)))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(outTight(1L).isEmpty && outTight(3L).isEmpty && outTight(2L).contains(110.0))
  }

  test("asofBackward: NULL keys never match (SQL equi-join semantics)") {
    val l = Seq((Some("A"), 10L, 1L), (None, 10L, 2L))
      .toDF("sym", "t", "trade_id").select(col("sym"), col("t"), col("trade_id"))
    val r = Seq((Some("A"), 5L, 100.0), (None, 5L, 666.0))
      .toDF("sym", "t", "px").select(col("sym"), col("t"), col("px"))
    val out = AsOfJoin.asofBackward(l, r, Seq("sym"), "t", Seq("px"))
      .collect().map(x => x.getAs[Long]("trade_id") -> Option(x.getAs[Any]("asof_px"))).toMap
    assert(out(1L).contains(100.0))
    assert(out(2L).isEmpty) // NULL key: no match, matching the ASOF JOIN oracle
  }

  test("asofBackward: reserved/output name collisions fail loudly (ADVICE r3)") {
    val clash1 = trades.withColumn("__side", lit(0))
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(clash1, quotes, Seq("sym"), "t", Seq("px"))
    }
    assert(e1.getMessage.contains("__side"))
    val clash2 = trades.withColumn("asof_px", lit(0.0))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(clash2, quotes, Seq("sym"), "t", Seq("px"))
    }
    assert(e2.getMessage.contains("asof_px"))
  }

  test("asofBackward preserves every left row exactly once") {
    val out = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.select("trade_id").distinct().count() == trades.count())
  }

  // ---- sampling / packing / contamination --------------------------------------------------

  private lazy val docs = Seq(
    (1L, "aaa bbb ccc ddd eee", "en", "s1"),
    (2L, "fff ggg hhh iii jjj", "en", "s1"),
    (3L, "kkk lll mmm nnn ooo", "de", "s1"),
    (4L, "ppp qqq rrr sss ttt", "de", "s2"),
    (5L, "uuu vvv www xxx yyy", "zh", "s2")
  ).toDF("doc_id", "text", "lang", "source")

  test("stratifiedSample: rate 100 keeps all, rate 0 drops all, membership is content-pure") {
    val all = SampleOps.stratifiedSample(docs, rates = Map("en" -> 100, "de" -> 100, "zh" -> 100))
    assert(all.count() == 5)
    val none = SampleOps.stratifiedSample(docs, rates = Map("en" -> 0, "de" -> 0, "zh" -> 0))
    assert(none.count() == 0)
    // same text, different partitioning -> same decision
    val a = SampleOps.stratifiedSample(docs, defaultPct = 40).select("doc_id").collect().toSet
    val b = SampleOps.stratifiedSample(docs.repartition(7), defaultPct = 40)
      .select("doc_id").collect().toSet
    assert(a == b)
  }

  test("quotaSample: per-group cap with deterministic tie-break") {
    val scored = docs.withColumn("score", col("doc_id") % 2 * 10.0) // ties within groups
    val out = SampleOps.quotaSample(scored, groupCol = "source", orderCol = "score", quota = 1)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("doc_id")).toMap
    // s1: scores (1->10, 2->0, 3->10); tie between 1 and 3 -> lowest doc_id wins
    assert(out("s1") == 1L)
    // s2: scores (4->0, 5->10)
    assert(out("s2") == 5L)
  }

  test("packGreedy: bins cut at the budget boundary, per stratum, in id order") {
    val sized = Seq(
      (1L, "en", 1000L), (2L, "en", 1000L), (3L, "en", 100L), (4L, "en", 5000L),
      (5L, "de", 10L)
    ).toDF("doc_id", "lang", "n_tokens")
    val out = SampleOps.packGreedy(sized, tokenCol = "n_tokens", budget = 2048L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_id")).toMap
    assert(out(1L) == 0L) // before=0
    assert(out(2L) == 0L) // before=1000
    assert(out(3L) == 0L) // before=2000 (straddles; greedy keeps it in bin 0's tail)
    assert(out(4L) == 1L) // before=2100 -> bin 1
    assert(out(5L) == 0L) // separate stratum restarts
  }

  test("mixtureSample: binding stratum kept whole, others downsample toward target shares") {
    val rnd = new scala.util.Random(19)
    val docs = (1L to 3000L).map { id =>
      val lang = if (id % 4 == 0) "de" else if (id % 4 == 1) "fr" else "en" // en ~50% of rows
      (id, s"doc $id ${rnd.nextInt(1 << 20)}", lang, 100L)
    }.toDF("doc_id", "text", "lang", "n_chars")
    val out = SampleOps.mixtureSample(docs, Map("en" -> 0.4, "de" -> 0.3, "fr" -> 0.3))
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val in = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // binding stratum = min T/w: de and fr tie (~750 each / 0.3) — both fully kept
    assert(kept("de") == in("de") && kept("fr") == in("fr"))
    // en downsamples to ~ w_en * O / T_en = 0.4 * 2500 / 1500 of its docs (uniform tokens)
    val expectedEn = 0.4 * (in("de") / 0.3) / in("en")
    assert(math.abs(kept("en").toDouble / in("en") - expectedEn) < 0.05,
      s"en keep rate ${kept("en").toDouble / in("en")} vs target $expectedEn")
    // unlisted strata never pass; membership is deterministic across re-runs
    assert(!kept.contains("zh"))
    assert(SampleOps.mixtureSample(docs, Map("en" -> 0.4, "de" -> 0.3, "fr" -> 0.3))
      .collect().map(_.getLong(0)).toSet == out.collect().map(_.getLong(0)).toSet)
  }

  test("packGreedy: sharded two-level prefix == single-window form, incl. one-language skew") {
    import org.apache.spark.sql.expressions.Window
    // a skewed corpus: one language holds ~90% of rows (the case that used to serialize)
    val rnd = new scala.util.Random(11)
    val rows = (1L to 3000L).map { id =>
      (id, if (id % 10 == 0) "de" else "en", (rnd.nextInt(500) + 1).toLong)
    }
    val sized = rows.toDF("doc_id", "lang", "n_tokens")
    def bins(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("tokens_before"), r.getAs[Long]("bin_id"))).toMap
    // reference: the exact single-window global prefix sum
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = bins(sized
      .withColumn("tokens_before", (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .withColumn("bin_id", expr("tokens_before div 2048")))
    // sharded forms: shard counts above, at, and below the row count must all agree
    for (shards <- Seq(2, 7, 32)) {
      val got = bins(SampleOps.packGreedy(sized, tokenCol = "n_tokens", budget = 2048L,
        shards = shards))
      assert(got == reference, s"sharded packGreedy(shards=$shards) diverged")
    }
  }

  test("contamination: overlap fraction vs the benchmark shingle inventory") {
    val corpus = Seq(
      (1L, "one two three four five"),   // shares trigrams with bench doc
      (2L, "alpha beta gamma delta")     // no overlap
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "zero one two three four")).toDF("doc_id", "text")
    val out = SampleOps.contamination(corpus, bench)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"))).toMap
    // doc 1 trigrams: {one two three, two three four, three four five}; bench contains
    // the first two -> 2/3
    assert(out(1L) == (3L, 2L))
    assert(!out.contains(2L)) // clean docs don't surface
  }

  test("uniformTakeK: exactly k, repartition-invariant membership, heap plan not global sort") {
    val docs = (1L to 200L).map(i => (i, s"document number $i with content")).toDF("doc_id", "text")
    val q = SampleOps.uniformTakeK(docs, k = 25)
    val a = q.collect().map(_.getLong(0)).toSet
    assert(a.size == 25)
    val b = SampleOps.uniformTakeK(docs.repartition(7), k = 25).collect().map(_.getLong(0)).toSet
    assert(a == b, "membership must survive re-partitioning")
    // k=25 of 200: supersets nest — the k=10 carve-out is inside the k=25 one
    val c = SampleOps.uniformTakeK(docs, k = 10).collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a), "smaller carve-outs must nest inside larger ones")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected per-task heap + driver merge:\n$p")
  }

  test("bloomContamination: flags superset of exact screen, no false negatives, deterministic") {
    val corpus = Seq(
      (1L, "one two three four five"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three aaa bbb ccc ddd")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "zero one two three four")).toDF("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame, cnt: String) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long](cnt)).toMap
    val exact = m(SampleOps.contamination(corpus, bench), "n_contaminated")
    val flagged = m(SampleOps.bloomContamination(corpus, bench), "n_flagged")
    // Bloom guarantee: every exactly-contaminated shingle flags
    assert(exact.forall { case (id, ne) => flagged.getOrElse(id, 0L) >= ne },
      s"false negative: exact=$exact flagged=$flagged")
    assert(flagged == m(SampleOps.bloomContamination(corpus, bench), "n_flagged"),
      "filter must be deterministic across builds")
    // at fpp=0.01 on a handful of probes, over-reporting a clean doc is (pinned-seed)
    // absent: the flag map IS the exact map here
    assert(flagged == exact, s"exact=$exact flagged=$flagged")
  }

  test("percentileBuckets: deciles of a uniform ramp land ~10% per bucket, monotone") {
    val rows = (1L to 100L).map(i => (i, i * 10)).toDF("doc_id", "n_chars")
    val out = SampleOps.percentileBuckets(rows, valueCol = "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bucket")).toMap
    assert(out(1L) == 0 && out(100L) == 9)
    assert((1L until 100L).forall(i => out(i) <= out(i + 1))) // monotone in the value
    val sizes = out.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.forall(s => s >= 9 && s <= 11)) // ~uniform deciles
  }

  test("shuffleShards: deterministic, balanced-ish, dense per-shard order") {
    val docs = (1L to 200L).toDF("doc_id")
    val a = SampleOps.shuffleShards(docs, nShards = 4, seed = "s1").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("ord")))
    val b = SampleOps.shuffleShards(docs.repartition(7), nShards = 4, seed = "s1").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("ord")))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1))) // repartition-invariant
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet == Set(0, 1, 2, 3))
    byShard.values.foreach { rows => // ord is a dense 1..n permutation within each shard
      assert(rows.map(_._3).sorted.sameElements(1L to rows.size))
      assert(rows.size > 20) // uniform hash: no shard starves (expected 50 each)
    }
    // a different seed is a genuinely different epoch order
    val c = SampleOps.shuffleShards(docs, nShards = 4, seed = "s2").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("ord")))
    assert(!a.sortBy(_._1).sameElements(c.sortBy(_._1)))
  }

  test("weightedTakeK: heavy rows over-represented; bounded top-k plan; zero-weight excluded") {
    val docs = (1L to 1000L).map(i =>
      (i, s"text body number $i", if (i <= 100) 500L else 10L)).toDF("doc_id", "text", "n_chars")
    val picked = SampleOps.weightedTakeK(docs, k = 100).collect().map(_.getLong(0))
    assert(picked.length == 100 && picked.distinct.length == 100)
    // heavy rows are 10% of the population but carry 50000/59000 of the weight
    val heavy = picked.count(_ <= 100)
    assert(heavy > 40, s"heavy class underrepresented: $heavy/100")
    // determinism under re-partitioning (content-hash randomness, not rand())
    val again = SampleOps.weightedTakeK(docs.repartition(7), k = 100).collect().map(_.getLong(0))
    assert(picked.sorted.sameElements(again.sorted))
    val withZero = docs.withColumn("n_chars",
      when(col("doc_id") === 1L, 0L).otherwise(col("n_chars")))
    assert(!SampleOps.weightedTakeK(withZero, k = 100).collect().map(_.getLong(0)).contains(1L))
    val p = SampleOps.weightedTakeK(docs, k = 100).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"weighted take lost its bounded top-k:\n$p")
  }

  test("temperatureMixture: low alpha flattens shares toward the low-resource stratum") {
    // lang 'big' has ~16x the tokens of 'small'
    val docs = ((1L to 800L).map(i => (i, s"big doc number $i text", "big", 100L)) ++
      (1001L to 1050L).map(i => (i, s"small doc number $i text", "small", 100L)))
      .toDF("doc_id", "text", "lang", "n_chars")
    val out3 = SampleOps.temperatureMixture(docs, alpha = 0.3).collect()
    val by3 = out3.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // the binding stratum under alpha<1 is the SMALL one: kept whole
    assert(by3("small") == 50, s"small lang must be kept whole: $by3")
    // big lang downsampled to hit p_big/p_small = 16^0.3 ~ 2.3 -> ~115 docs, far below
    // its natural 800; sampling noise is content-hash driven, allow a wide band
    assert(by3("big") < 200 && by3("big") > 60, s"big lang must flatten: $by3")
    // alpha=1 reproduces natural proportions: every doc of both strata survives
    val out1 = SampleOps.temperatureMixture(docs, alpha = 1.0).collect()
    assert(out1.length == 850, s"alpha=1 must keep natural proportions, got ${out1.length}")
    // content-hash determinism under re-partitioning
    val again = SampleOps.temperatureMixture(docs.repartition(7), alpha = 0.3)
      .collect().map(_.getLong(0)).sorted
    assert(again.sameElements(out3.map(_.getLong(0)).sorted))
  }

  test("groupedExactPercentiles == Spark's Percentile built-in, per key") {
    val rng = new scala.util.Random(7)
    val df = (1 to 400).map { i =>
      (s"k${i % 3}", (rng.nextInt(200) - 40).toLong) }.toDF("k", "v")
    val got = SampleOps.groupedExactPercentiles(df, "k", col("v"),
        Seq(("p25", 0.25), ("p50", 0.5), ("p95", 0.95))).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val exp = df.groupBy("k")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.95))").as("p")).collect()
      .map(r => r.getString(0) -> {
        val p = r.getSeq[Double](1); ((p(0), p(1), p(2))) }).toMap
    assert(got == exp)
    // the histogram form must never plan the Percentile value-map buffer
    val plan = SampleOps.groupedExactPercentiles(df, "k", col("v"), Seq(("p50", 0.5)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("percentile("), s"Percentile buffer leaked into:\n$plan")
  }

  // -- isotonicCalibration ----------------------------------------------------------------

  /** Reference PAV: pool-adjacent-violators with exact cross-multiplied comparisons;
    * the fitted value of a pooled block is its y/w in one double division — the same
    * sums and the same single division the minimax form ends at. */
  private def pavRef(ws: Seq[Long], ys: Seq[Long]): Seq[Double] = {
    val st = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    for ((w, y) <- ws.zip(ys)) {
      var (bw, by, bc) = (w, y, 1)
      while (st.nonEmpty && st.last._2 * bw >= by * st.last._1) {
        val (pw, py, pc) = st.remove(st.size - 1)
        bw += pw; by += py; bc += pc
      }
      st += ((bw, by, bc))
    }
    st.toSeq.flatMap { case (w, y, c) => Seq.fill(c)(y.toDouble / w) }
  }

  test("isotonicCalibration == PAV reference on random grids; fit is monotone (property)") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 5) {
      val nBins = 6 + rnd.nextInt(8)
      val binW = (0 until nBins).map(_ => 1L + rnd.nextInt(7))
      val binY = binW.map(w => rnd.nextInt(w.toInt + 1).toLong)
      // raw rows: bin b with w rows, y of them labelled 1
      val rows = (0 until nBins).flatMap { b =>
        (0L until binW(b)).map(r => (b.toLong, if (r < binY(b)) 1L else 0L))
      }
      val got = graft.ops.SampleOps.isotonicCalibration(
          rows.toDF("score", "label"), col("score"), col("label"))
        .collect().map(r => (r.getLong(0), r.getDouble(4))).sortBy(_._1)
      val want = pavRef(binW, binY)
      assert(got.length == nBins)
      got.zip(want).foreach { case ((b, iso), ref) =>
        assert(math.abs(iso - BigDecimal(ref).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"trial $trial bin $b: minimax $iso != PAV ${ref}")
      }
      got.sliding(2).foreach {
        case Array((b1, v1), (b2, v2)) =>
          assert(v1 <= v2 + 1e-12, s"trial $trial: fit not monotone at $b1->$b2: $v1 > $v2")
        case _ =>
      }
    }
  }

  test("isotonicCalibration: a clean violation pools exactly (worked example)") {
    // rates by bin: 0/2, 2/2, 1/2, 2/2 — bins 1..2 violate (1.0 then 0.5) and pool
    // to 3/4; bin 3 stays 1.0. Expected fit: 0, 0.75, 0.75, 1.0
    val rows = Seq(
      (0L, 0L), (0L, 0L),
      (1L, 1L), (1L, 1L),
      (2L, 1L), (2L, 0L),
      (3L, 1L), (3L, 1L)).toDF("score", "label")
    val got = graft.ops.SampleOps.isotonicCalibration(rows, col("score"), col("label"))
      .collect().map(r => (r.getLong(0), r.getDouble(4))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 0.0), (1L, 0.75), (2L, 0.75), (3L, 1.0)), s"$got")
  }
}
