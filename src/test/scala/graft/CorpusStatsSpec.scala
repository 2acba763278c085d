package graft

import org.apache.spark.sql.functions.col
import graft.ops.TextOps

/** Burstiness, distinct-n diversity and fightin'-words log-odds vs naive references. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    s.toLowerCase.split(TextOps.TokenRegex).filter(_.nonEmpty).toSeq

  private val docs = Seq(
    (1L, "src0", "a a a a b c"),
    (2L, "src0", "a b b c c d"),
    (3L, "src1", "d d d d d e"),
    (4L, "src1", "a b c d e f"))

  test("burstiness == naive VMR / tf-over-df reference") {
    val n = docs.size
    val perDoc = docs.map { case (_, _, t) => tok(t).groupBy(identity).view.mapValues(_.size).toMap }
    val vocab = perDoc.flatMap(_.keys).distinct.sorted
    val expected = vocab.flatMap { w =>
      val cs = perDoc.map(_.getOrElse(w, 0))
      val tf = cs.sum.toLong
      val df = cs.count(_ > 0).toLong
      val sc2 = cs.map(c => c.toLong * c).sum
      if (tf < 2) None
      else Some(w -> ((tf, df,
        BigDecimal(tf.toDouble / df).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal((n * sc2 - tf * tf).toDouble / (n * tf))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }.toMap
    val out = TextOps.burstiness(docs.toDF("doc_id", "source", "text"), minTf = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out == expected)
  }

  test("distinctNgrams == naive per-source type/occurrence ratios") {
    val bySource = docs.groupBy(_._2)
    val expected = bySource.map { case (src, ds) =>
      val unis = ds.flatMap { case (_, _, t) => tok(t) }
      val bigs = ds.flatMap { case (_, _, t) =>
        val w = tok(t); if (w.size >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Nil }
      src -> ((unis.size.toLong, unis.distinct.size.toLong,
        BigDecimal(unis.distinct.size.toDouble / unis.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        bigs.size.toLong, bigs.distinct.size.toLong,
        BigDecimal(bigs.distinct.size.toDouble / bigs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val out = TextOps.distinctNgrams(docs.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(out == expected)
  }

  test("fightinWords == naive Monroe et al. log-odds z-ranking") {
    val counts = docs.flatMap { case (_, src, t) => tok(t).map(w => (w, src == "src0")) }
    val vocab = counts.map(_._1).distinct
    val y1 = vocab.map(w => w -> counts.count(c => c._1 == w && c._2).toLong).toMap
    val y2 = vocab.map(w => w -> counts.count(c => c._1 == w && !c._2).toLong).toMap
    val n1 = y1.values.sum; val n2 = y2.values.sum; val v = vocab.size
    def lg(x: Double) = math.log(x) / math.log(10.0)
    val scored = vocab.map { w =>
      val d = lg((y1(w) + 0.5) / (n1 + v * 0.5 - y1(w) - 0.5)) -
        lg((y2(w) + 0.5) / (n2 + v * 0.5 - y2(w) - 0.5))
      val z = d / math.sqrt(1.0 / (y1(w) + 0.5) + 1.0 / (y2(w) + 0.5))
      (w, BigDecimal(z).setScale(8, BigDecimal.RoundingMode.HALF_UP))
    }.sortBy { case (w, z) => (-z, w) }
    val expectedOrder = scored.take(3).map(_._1)
    val out = TextOps.fightinWords(docs.toDF("doc_id", "source", "text"),
        targetSource = "src0", topK = 3)
      .orderBy("rank").collect().map(_.getString(0)).toSeq
    assert(out == expectedOrder)
    // sanity: the src0-heavy token 'a' must outrank the src1-heavy token 'd'
    assert(out.indexOf("a") >= 0 && !expectedOrder.contains("d"))
  }

  test("ev_gini histogram form == naive sorted-rank Gini; 0 for uniform activity") {
    import java.sql.Timestamp
    def giniOf(counts: Seq[Int]): Double = {
      val rows = counts.zipWithIndex.flatMap { case (c, u) =>
        (0 until c).map(i =>
          (u.toLong * 1000 + i, new Timestamp(1700000000000L + i * 1000), u.toLong, "view", 1.0, "{}"))
      }
      val base = java.nio.file.Files.createTempDirectory("graft-gini").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$base/events.parquet")
      SparkEntry.queries("ev_gini")(spark, base).head().getAs[Double]("gini")
    }
    assert(giniOf(Seq(5, 5, 5, 5)) == 0.0, "uniform activity must give Gini 0")
    // naive reference for [1,2,3,4]: sorted ascending, G = 2*Σ i*c_i/(n*T) - (n+1)/n
    val cs = Seq(1, 2, 3, 4)
    val s = cs.sorted.zipWithIndex.map { case (c, i) => (i + 1).toLong * c }.sum
    val expected = BigDecimal(2.0 * s / (cs.size.toLong * cs.sum) - (cs.size + 1.0) / cs.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(giniOf(cs) == expected)
  }

  /** Events fixture: one event per (user, day) pair given as (user, day). */
  private def eventsFixture(rows: Seq[(Long, Long)]): String = {
    import java.sql.Timestamp
    val base = java.nio.file.Files.createTempDirectory("graft-evfix").toString
    rows.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, new Timestamp(d * 86400000L), u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    base
  }

  test("ev_cusum: a flat series has zero CUSUM everywhere; a planted level shift peaks at the shift") {
    val flat = eventsFixture((0L until 14L).map(d => (d % 3, d))) // 1 event/day
    val rows = SparkEntry.queries("ev_cusum")(spark, flat).collect()
    assert(rows.forall(_.getAs[Long]("s_scaled") == 0L), "flat series must have S=0")
    // days 0-6: 1/day; days 7-13: 3/day -> most negative S at day 6 (pre-shift trough)
    val shifted = eventsFixture(
      (0L until 7L).map(d => (0L, d)) ++
        (7L until 14L).flatMap(d => Seq((0L, d), (1L, d), (2L, d))))
    val peak = SparkEntry.queries("ev_cusum")(spark, shifted)
      .filter(col("is_peak")).head()
    assert(peak.getAs[Long]("day") == 6L, s"changepoint must sit at the shift: $peak")
  }

  test("ev_forecast_backtest: perfectly weekly-periodic series backtests to zero error") {
    val base = eventsFixture((0L until 28L).flatMap(d =>
      (0L until (d % 7) + 1).map(u => (u, d)))) // count(day) = dow+1, exactly periodic
    val r = SparkEntry.queries("ev_forecast_backtest")(spark, base).head()
    assert(r.getAs[Long]("n_days") == 21L)
    assert(r.getAs[Double]("mae") == 0.0 && r.getAs[Double]("mape") == 0.0)
  }

  test("ev_holt_winters: constant series forecasts itself exactly; fold matches JVM reference") {
    // constant 5/day over 28 days: level = 5e6 exactly, trend/seasons 0 -> every
    // horizon forecasts 5e6 (all the truncating divisions are exact on multiples of 10)
    val flat = eventsFixture((0L until 28L).flatMap(d => (0L until 5L).map(u => (u, d))))
    val f = SparkEntry.queries("ev_holt_winters")(spark, flat).collect()
    assert(f.length == 7)
    assert(f.forall(_.getAs[Long]("forecast_e6") == 5000000L), f.toSeq.toString)

    // arbitrary deterministic series vs a JVM reference of the identical recursion
    val counts = (0L until 21L).map(d => (d * 3 % 5) + 1)
    val varied = eventsFixture(
      (0L until 21L).flatMap(d => (0L until counts(d.toInt)).map(u => (u, d))))
    def hwRef(cs: Seq[Long]): Map[Int, Long] = {
      val y = cs.map(_ * 1000000L)
      val lvl0 = y.take(7).sum / 7
      var lvl = lvl0; var tr = 0L; var t = 7
      val s = y.take(7).map(_ - lvl0).toArray
      for (yy <- y.drop(7)) {
        val i = t % 7; val si = s(i)
        val l2 = (2 * (yy - si)) / 10 + (8 * (lvl + tr)) / 10
        val t2 = (l2 - lvl) / 10 + (9 * tr) / 10
        s(i) = (3 * (yy - l2)) / 10 + (7 * si) / 10
        lvl = l2; tr = t2; t += 1
      }
      (1 to 7).map(h => h -> (lvl + h * tr + s((t + h - 1) % 7))).toMap
    }
    val got = SparkEntry.queries("ev_holt_winters")(spark, varied).collect()
      .map(r => r.getAs[Int]("horizon") -> r.getAs[Long]("forecast_e6")).toMap
    assert(got == hwRef(counts), s"got $got expected ${hwRef(counts)}")
  }

  test("ev_survival_hazard: everyone active at the end is censored — zero hazard mass") {
    // all users span the full window -> lifespan = max, all censored
    val allActive = eventsFixture((0L until 5L).flatMap(u => Seq((u, 0L), (u, 20L))))
    val rows = SparkEntry.queries("ev_survival_hazard")(spark, allActive).collect()
    assert(rows.forall(_.getAs[Long]("n_churn") == 0L), s"censored users can't churn: ${rows.toSeq}")
    // one early-vanishing user churns at its lifespan with everyone still at risk above it
    val churn = eventsFixture(
      (0L until 4L).flatMap(u => Seq((u, 0L), (u, 20L))) ++ Seq((9L, 0L), (9L, 5L)))
    val h = SparkEntry.queries("ev_survival_hazard")(spark, churn).collect()
      .map(r => r.getAs[Long]("t") -> ((r.getAs[Long]("n_risk"), r.getAs[Long]("n_churn")))).toMap
    assert(h(5L) == ((5L, 1L)), s"lifespan-5 churner against the full risk set: $h")
    assert(h(20L) == ((4L, 0L)), s"survivors censored: $h")
  }

  test("llrPairs: matches a naive driver-side G2 and out-ranks hapax flukes") {
    // 20x "alpha beta" (real collocation), 1x "gamma delta" (two hapaxes, PMI's
    // blind spot), filler bigrams to thicken the margins
    val docs = (1L to 20L).map(i => (i, "alpha beta")) ++
      Seq((21L, "gamma delta")) ++
      (22L to 61L).map(i => (i, s"p${i % 7} q${(i + 3) % 7}")) // margins untouched
    val out = TextOps.llrPairs(docs.toDF("doc_id", "text"), minCount = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // naive recomputation from scratch
    val bigrams = docs.flatMap { case (_, t) => tok(t).sliding(2).filter(_.size == 2)
      .map(_.mkString(" ")) }
    val k11 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ra = bigrams.groupBy(_.split(" ")(0)).view.mapValues(_.size.toLong).toMap
    val cb = bigrams.groupBy(_.split(" ")(1)).view.mapValues(_.size.toLong).toMap
    val nn = bigrams.size.toLong
    def xlx(x: Long): Double = if (x >= 1) x.toDouble * math.log10(x.toDouble) else 0.0
    def g2(pair: String): Double = {
      val Array(a, b) = pair.split(" ")
      val (k, r, c) = (k11(pair), ra(a), cb(b))
      BigDecimal(2.0 * (xlx(k) + xlx(r - k) + xlx(c - k) + xlx(nn - r - c + k)
        - xlx(r) - xlx(nn - r) - xlx(c) - xlx(nn - c) + xlx(nn)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { case (pair, v) =>
      assert(math.abs(v - g2(pair)) < 1e-9, s"$pair: got $v expected ${g2(pair)}")
    }
    assert(out("alpha beta") > out("gamma delta") + 5,
      s"collocation must dominate the hapax fluke: $out")
    out.values.foreach(v => assert(v >= -1e-9, s"G2 is non-negative, got $v"))
  }

  test("rake: hand-computed phrase scores, stopword splits, truncating e6 word scores") {
    // doc 1: phrases [deep learning], [deep network]; doc 2: [learning] x2
    // freq: deep=2, learning=3, network=1; deg: deep=4, learning=2+1+1=4, network=2
    // s_e6: deep=2_000_000, learning=4_000_000 div 3=1_333_333, network=2_000_000
    val docs = Seq(
      (1L, "deep learning of the deep network"),
      (2L, "learning is learning")).toDF("doc_id", "text")
    val out = TextOps.rake(docs, topK = 10).collect()
    val byPhrase = out.map(r => r.getAs[String]("phrase") ->
      ((r.getAs[Long]("score_e6"), r.getAs[Long]("n_occurrences")))).toMap
    assert(byPhrase("deep network") == ((4000000L, 1L)))
    assert(byPhrase("deep learning") == ((3333333L, 1L)))
    assert(byPhrase("learning") == ((1333333L, 2L)))
    // ranking: deep network > deep learning > learning
    assert(out.map(_.getAs[String]("phrase")).toSeq ==
      Seq("deep network", "deep learning", "learning"))
  }
}
