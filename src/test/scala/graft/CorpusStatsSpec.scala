package graft

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
}
