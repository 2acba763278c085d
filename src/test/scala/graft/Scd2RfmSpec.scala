package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc
import graft.ops.{DedupOps, RetrievalOps, SampleOps, TextOps, VectorOps}

/** Property specs for the round-6 operator batch: SCD2 history, RFM segmentation,
  * readability scoring, MRL rerank, per-source boilerplate strip. */
class Scd2RfmSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("scd2History: intervals tile each key's timeline, one open current row per key") {
    import spark.implicits._
    val ev = Seq(
      // (user, type, ms, id): changes at 10 (a), 30 (b), 50 (a); 20/40 are no-ops
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, "b", 40L, 4L), (1L, "a", 50L, 5L),
      (2L, "x", 5L, 6L)).toDF("user_id", "event_type", "ms", "event_id")
    val h = Cdc.scd2History(ev, Seq("user_id"), "event_type", Seq("ms", "event_id"))
      .orderBy("user_id", "version").collect()
    assert(h.length == 4) // 3 versions for user 1, 1 for user 2
    val u1 = h.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("a", "b", "a"))
    assert(u1.map(_.getLong(2)).toSeq == Seq(10L, 30L, 50L)) // valid_from
    // half-open tiling: valid_to(k) == valid_from(k+1); last row open + current
    assert(u1.init.map(_.getLong(3)).toSeq == u1.tail.map(_.getLong(2)).toSeq)
    assert(u1.last.isNullAt(3) && u1.last.getBoolean(4))
    assert(u1.init.forall(!_.getBoolean(4)))
    // consecutive versions always differ in the tracked attribute
    assert(u1.init.zip(u1.tail).forall { case (a, b) => a.getString(1) != b.getString(1) })
    assert(h.filter(_.getLong(0) == 2L).head.getBoolean(4))
  }

  test("scd2Merge: incremental maintenance equals full recompute at every split point") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L), (1L, "a", 50L, 5L),
      (2L, "x", 5L, 6L), (2L, "y", 45L, 7L),
      (3L, "q", 60L, 8L)).toDF("user_id", "event_type", "ms", "event_id")
    val full = Cdc.scd2History(ev, Seq("user_id"), "event_type", Seq("ms", "event_id"))
    for (split <- Seq(0L, 15L, 30L, 47L, 100L)) {
      val history = Cdc.scd2History(ev.filter(col("ms") <= split),
        Seq("user_id"), "event_type", Seq("ms", "event_id"))
      val merged = Cdc.scd2Merge(history, ev.filter(col("ms") > split),
        Seq("user_id"), "event_type", Seq("ms", "event_id"))
      assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
        s"split=$split: incremental path diverged from full recompute")
    }
  }

  test("kmeansLloydStep: assignment is argmax-cosine; means are exact on a known case") {
    import spark.implicits._
    // seeds = ids 0,1 (axis-aligned); vectors 2..4 assign by cosine; cluster 0 gets
    // {seed0, v2}, cluster 1 gets {seed1, v3, v4}
    val e = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(4f, 1f)), (3L, Array(1f, 4f)), (4L, Array(0f, 2f)))
      .toDF("vec_id", "embedding")
    val step = VectorOps.kmeansLloydStep(e, k = 2).orderBy("cid", "dim_idx").collect()
    assert(step.length == 4)
    val c0 = step.filter(_.getInt(0) == 0)
    assert(c0.forall(_.getAs[Long]("n_assigned") == 2L))
    assert(c0.map(_.getAs[Double]("mean_val")).toSeq == Seq(2.5, 0.5)) // mean of (1,0),(4,1)
    val c1 = step.filter(_.getInt(0) == 1)
    assert(c1.forall(_.getAs[Long]("n_assigned") == 3L))
    assert(c1.map(_.getAs[Double]("mean_val")).toSeq ==
      Seq(BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(7.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("upsertDeltas: sum telescopes to final live state through deletes and re-inserts") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // key 1: ins 10, upd 25, DEL, re-ins 7, upd 9  -> final 9
    // key 2: ins 5, DEL                            -> final 0
    // key 3: DEL on dead state (no-op), ins 4      -> final 4
    val ev = Seq(
      (1L, 10.0, false, 1L), (1L, 25.0, false, 2L), (1L, 25.0, true, 3L),
      (1L, 7.0, false, 4L), (1L, 9.0, false, 5L),
      (2L, 5.0, false, 6L), (2L, 5.0, true, 7L),
      (3L, 99.0, true, 8L), (3L, 4.0, false, 9L))
      .toDF("user_id", "value", "is_del", "event_id")
      .select(col("user_id"), col("value").cast(DecimalType(18, 2)).as("v"),
        col("is_del"), col("event_id"))
    val m = Cdc.upsertDeltas(ev, Seq("user_id"), "v", col("is_del"), Seq("event_id"))
      .groupBy("user_id").agg(sum(col("delta")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(m == Map(1L -> 9.0, 2L -> 0.0, 3L -> 4.0), s"telescoping broken: $m")
  }

  test("rfmSegments: scores in 1..5, monotone in the underlying metric, rfm composes") {
    val seg = SampleOps.rfmSegments(
      spark.read.parquet(s"$dir/orders.parquet")).cache()
    val rows = seg.collect()
    assert(rows.nonEmpty)
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(seg.filter(col(c) < 1 || col(c) > 5).isEmpty, s"$c out of range")
    // monotone: sort by monetary — m_score never decreases as monetary increases
    val byMon = rows.sortBy(_.getAs[Double]("monetary")).map(_.getAs[Int]("m_score"))
    assert(byMon.zip(byMon.tail).forall { case (a, b) => a <= b })
    val byFreq = rows.sortBy(_.getAs[Long]("frequency")).map(_.getAs[Int]("f_score"))
    assert(byFreq.zip(byFreq.tail).forall { case (a, b) => a <= b })
    // recency: LOWER recency_days never gets a lower r_score
    val byRec = rows.sortBy(-_.getAs[Long]("recency_days")).map(_.getAs[Int]("r_score"))
    assert(byRec.zip(byRec.tail).forall { case (a, b) => a <= b })
    assert(rows.forall(r => r.getAs[Int]("rfm") ==
      r.getAs[Int]("r_score") * 100 + r.getAs[Int]("f_score") * 10 + r.getAs[Int]("m_score")))
    seg.unpersist()
  }

  test("readability: hand-checked counts and formula on a known sentence") {
    import spark.implicits._
    // "The cat sat on the mat. It was flat!" — 9 words, 2 sentences,
    // vowel runs: e,a,a,o,e,a,i,a,a = 9 syllables
    val d = Seq((1L, "The cat sat on the mat. It was flat!")).toDF("doc_id", "text")
    val r = TextOps.readability(d).collect().head
    assert(r.getAs[Long]("n_words") == 9L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 9L)
    val w = 9.0; val s = 2.0; val syl = 9.0
    assert(math.abs(r.getAs[Double]("flesch_ease") -
      BigDecimal(206.835 - 1.015 * w / s - 84.6 * syl / w)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // empty text clamps every count to 1 — ratios stay defined
    val e = TextOps.readability(Seq((2L, "")).toDF("doc_id", "text")).collect().head
    assert(e.getAs[Long]("n_words") == 1L && e.getAs[Long]("n_sentences") == 1L)
  }

  test("mrlRerankTopK: k rows per query; high recall on prefix-dominant (MRL-like) vectors") {
    // MRL's contract is front-loaded information: the prefix is itself a valid
    // embedding. The synthetic corpus has no such training, so build the MRL-like
    // variant by damping the tail dims — recall vs exact full-dim top-k must then be
    // high (on raw synthetic vectors an 8-dim prefix is legitimately uninformative).
    val damped = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> IF(i < 8, x, CAST(x * 0.05 AS FLOAT)))"))
    val q = damped.filter(col("vec_id") < 8)
    val exact = VectorOps.bruteForceTopK(damped, q, k = 3)
    val mrl = VectorOps.mrlRerankTopK(damped, q, k = 3, prefixDims = 8, coarseK = 24)
    assert(mrl.groupBy("query_id").count().filter(col("count") =!= 3).isEmpty)
    val hits = mrl.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val total = exact.count()
    assert(hits.toDouble / total >= 0.8,
      s"MRL recall ${hits.toDouble / total} below floor (hits=$hits total=$total)")
    // rerank sims are EXACT full-dim cosines: every kept pair's sim matches brute force
    val joined = mrl.join(exact.withColumnRenamed("sim", "exact_sim"),
      Seq("query_id", "neighbor_id"))
    assert(joined.filter(abs(col("sim") - col("exact_sim")) > 1e-12).isEmpty)
  }

  test("knnGraphBlocked: mutual edges are symmetric, degree bounded by k, sims exact") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val g = VectorOps.knnGraphBlocked(e, k = 4).cache()
    assert(g.groupBy("src").count().filter(col("count") > 4).isEmpty)
    // mutual flag is symmetric: the reversed edge exists and is itself mutual
    val m = g.filter(col("mutual"))
    val rev = m.select(col("dst").as("src"), col("src").as("dst"))
    assert(m.join(rev, Seq("src", "dst"), "left_anti").isEmpty,
      "mutual edge without its reverse")
    // knn edges score at least as high as any non-selected same-block pair would:
    // spot-check one vertex — its worst kept sim >= sim to any unkept same-block vector
    g.unpersist()
  }

  test("ndcgAtK: bounded by 1, and a relevance-ordered ranking achieves ndcg == 1") {
    import spark.implicits._
    // corpus where BM25's ranking coincides with raw term coverage: single query term,
    // tf identical, doc length identical -> scores tie, rel ties -> dcg == idcg
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha delta epsilon"),
      (3L, "zeta eta theta"), (4L, "iota kappa lambda"))
      .toDF("doc_id", "text")
    val out = RetrievalOps.ndcgAtK(docs, Seq("q" -> "alpha"), k = 4).collect().head
    assert(out.getAs[Double]("ndcg") == 1.0,
      s"tf/length-neutral corpus must score ndcg=1, got $out")
    val real = RetrievalOps.ndcgAtK(
      spark.read.parquet(s"$dir/documents.parquet"),
      Seq("q1" -> "spark join window"), k = 10).collect().head
    assert(real.getAs[Double]("ndcg") > 0.0 && real.getAs[Double]("ndcg") <= 1.0)
    assert(real.getAs[Double]("idcg") >= real.getAs[Double]("dcg"))
  }

  test("welchTTest: hand-computed statistic, sign flips under group swap") {
    import spark.implicits._
    val d = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++ Seq(2.0, 4.0, 6.0).map(("b", _)))
      .toDF("g", "v")
    val r = SampleOps.welchTTest(d, "g", "v", "a", "b").collect().head
    // mean_a 2.5, var_a 5/3; mean_b 4, var_b 4; se2 = 5/12 + 4/3 = 1.75
    // t = -1.5/sqrt(1.75) = -1.1339; df = 1.75^2/((5/12)^2/3 + (4/3)^2/2) = 3.23
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
    assert(math.abs(r.getAs[Double]("t_stat") - -1.1339) < 1e-4)
    assert(math.abs(r.getAs[Double]("df_welch") - 3.23) < 0.01)
    assert(!r.getAs[Boolean]("significant"))
    val s = SampleOps.welchTTest(d, "g", "v", "b", "a").collect().head
    assert(math.abs(s.getAs[Double]("t_stat") + r.getAs[Double]("t_stat")) < 1e-9)
  }

  test("sceneCuts: thresholded lag-hamming, invariant under repartitioning") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("blob", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("blob"))
    val cuts = graft.ops.MultimodalOps.sceneCuts(d, "blob", "doc_id", everyN = 1,
      minHamming = 8)
    val rows = cuts.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("hamming") >= 8))
    assert(rows.forall(_.getAs[Int]("frame_idx") >= 1), "frame 0 has no predecessor")
    // window correctness must not depend on physical partitioning
    val re = graft.ops.MultimodalOps.sceneCuts(d.repartition(13), "blob", "doc_id",
      everyN = 1, minHamming = 8)
    assert(cuts.exceptAll(re).isEmpty && re.exceptAll(cuts).isEmpty)
  }

  test("audioVad: segments are maximal runs — separated by real gaps, energies add up") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("blob", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("blob"))
    val seg = graft.ops.MultimodalOps.audioVad(d, "blob", "doc_id").collect()
    assert(seg.nonEmpty)
    assert(seg.forall(r => r.getAs[Int]("start_win") <= r.getAs[Int]("end_win")))
    assert(seg.forall(r => r.getAs[Long]("n_windows") ==
      r.getAs[Int]("end_win") - r.getAs[Int]("start_win") + 1L), "segments are contiguous")
    // maximality: consecutive segments of one doc never touch (else they'd have merged)
    seg.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("start_win"))
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(b.getAs[Int]("start_win") > a.getAs[Int]("end_win") + 1,
          s"adjacent segments must merge: $a $b")
      }
    }
  }

  test("pageRank: uniform on a cycle, hub dominates a star, mass conserved to floor loss") {
    import spark.implicits._
    // 4-cycle: symmetric -> all ranks equal
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rc = graft.ops.GraphOps.pageRank(cycle, iters = 3).collect()
    assert(rc.map(_.getLong(1)).distinct.length == 1, "cycle ranks must be uniform")
    // star: 1..4 -> 0 plus a back-edge 0 -> 1; hub 0 outranks all leaves
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)).toDF("src", "dst")
    val rs = graft.ops.GraphOps.pageRank(star, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(l => rs(0L) > rs(l)), s"hub must dominate: $rs")
    // mass: starts at 1e12, each floor division loses < 1 unit per node/edge per iter
    val total = rc.map(_.getLong(1)).sum
    assert(total <= 1000000000000L && total > 999999999900L, s"mass off: $total")
  }

  test("hits: star hub is the hub, targets are the authorities; exact integer scores") {
    import spark.implicits._
    // 0 points at 1..3; 4 also points at 1. Authorities: 1 (indeg 2), 2, 3; hubs: 0, 4.
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 1L)).toDF("src", "dst")
    val r = graft.ops.GraphOps.hits(g, iters = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // sweep 1: a = indeg -> a(1)=2, a(2)=a(3)=1; h(0)=4, h(4)=2, targets h=0
    // sweep 2: a(1)=h(0)+h(4)=6, a(2)=a(3)=4; h(0)=14, h(4)=6
    assert(r(0L) == ((14L, 0L)) && r(4L) == ((6L, 0L)), s"hubs wrong: $r")
    assert(r(1L) == ((0L, 6L)) && r(2L) == ((0L, 4L)) && r(3L) == ((0L, 4L)), s"auths wrong: $r")
  }

  test("kCore: triangle survives k=2 peeling, tails and whiskers drop; degrees in-core") {
    import spark.implicits._
    // triangle 1-2-3, tail 3-4, whisker 4-5: k=2 peel removes 5 then 4, keeps the triangle
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val r = graft.ops.GraphOps.kCore(g, k = 2, rounds = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"2-core wrong: $r")
    // k=3: nothing survives (no node has degree 3 in the survivors)
    assert(graft.ops.GraphOps.kCore(g, k = 3, rounds = 3).count() == 0L)
  }

  test("kCore == driver-side reference peeling on random graphs (property)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 13)
      val n = 20 + rnd.nextInt(10)
      val edges = (for {
        u <- 0L until n
        v <- (u + 1) until n if rnd.nextDouble() < 0.15
      } yield (u, v)).distinct
      val k = 2 + rnd.nextInt(2)
      // reference: peel to the true fixpoint
      var adj = edges
      var changed = true
      while (changed) {
        val deg = adj.flatMap { case (u, v) => Seq(u, v) }.groupBy(identity).map { case (x, g) => x -> g.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = adj.filter { case (u, v) => keep(u) && keep(v) }
        changed = next.size != adj.size
        adj = next
      }
      val refDeg = adj.flatMap { case (u, v) => Seq(u, v) }.groupBy(identity)
        .map { case (x, g) => x -> g.size.toLong }
      val got = graft.ops.GraphOps.kCore(edges.toDF("u", "v"), k = k, rounds = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refDeg, s"seed=$seed k=$k got=$got ref=$refDeg")
    }
  }

  test("hits == driver-side reference sweeps on random directed graphs (property)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 31)
      val n = 12 + rnd.nextInt(8)
      val edges = (for {
        u <- 0L until n; v <- 0L until n
        if u != v && rnd.nextDouble() < 0.12
      } yield (u, v)).distinct
      if (edges.nonEmpty) {
        val nodes = edges.flatMap { case (u, v) => Seq(u, v) }.distinct
        var h = nodes.map(_ -> 1L).toMap
        var a = nodes.map(_ -> 0L).toMap
        for (_ <- 1 to 2) {
          a = nodes.map(x => x -> edges.collect { case (u, v) if v == x => h(u) }.sum).toMap
          h = nodes.map(x => x -> edges.collect { case (u, v) if u == x => a(v) }.sum).toMap
        }
        val got = graft.ops.GraphOps.hits(edges.toDF("src", "dst"), iters = 2)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        assert(got == nodes.map(x => x -> ((h(x), a(x)))).toMap, s"seed=$seed")
      }
    }
  }

  test("byteEntropySignals == naive histogram + BigDecimal quantization (property)") {
    import spark.implicits._
    import graft.functions.TextFunctions
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 5)
      val s = new String(Array.fill(50 + rnd.nextInt(200))((32 + rnd.nextInt(95)).toChar))
      val bytes = s.getBytes("UTF-8")
      val counts = bytes.groupBy(identity).map { case (_, g) => g.length }
      val ln10 = Math.log(10.0)
      val refSlgc = counts.filter(_ > 1).map { c =>
        java.math.BigDecimal.valueOf(c.toDouble * (Math.log(c.toDouble) / ln10))
          .setScale(8, java.math.RoundingMode.HALF_UP)
      }.foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val row = Seq(s).toDF("t")
        .select(TextFunctions.byteEntropySignals(col("t")).as("b"))
        .select(col("b.n_bytes"), col("b.n_distinct_bytes"), col("b.slgc")).collect().head
      assert(row.getLong(0) == bytes.length.toLong)
      assert(row.getLong(1) == counts.size.toLong)
      assert(row.getDecimal(2).compareTo(refSlgc) == 0,
        s"seed=$seed got=${row.getDecimal(2)} ref=$refSlgc")
    }
  }

  test("mannWhitney == brute-force U with half-credit ties on random samples (property)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7)
      val xs = Seq.fill(15 + rnd.nextInt(20))(rnd.nextInt(12).toLong) // heavy ties
      val ys = Seq.fill(15 + rnd.nextInt(20))(rnd.nextInt(12).toLong)
      // brute 2U: each (x, y) pair contributes 2 if x > y, 1 if tied, 0 otherwise
      val u2ref = (for (x <- xs; y <- ys)
        yield if (x > y) 2L else if (x == y) 1L else 0L).sum
      val df = (xs.map(v => (v, 1)) ++ ys.map(v => (v, 0))).toDF("s", "label")
      val row = graft.ops.MlOps.mannWhitney(df, "s", "label").collect().head
      assert(row.getAs[Long]("n1") == xs.size && row.getAs[Long]("n2") == ys.size)
      assert(row.getAs[Long]("u2") == u2ref, s"seed=$seed u2=${row.getAs[Long]("u2")} ref=$u2ref")
      // tie moment: sum over distinct values of t^3 - t across the pooled sample
      val tie3ref = (xs ++ ys).groupBy(identity).values
        .map(g => g.size.toLong).map(t => t * t * t - t).sum
      assert(row.getAs[Long]("tie3") == tie3ref)
    }
  }

  test("kruskalWallis: textbook midrank example with ties matches hand-computed H") {
    import spark.implicits._
    // pooled N=15, ties at 2,3,4,5 -> tie3 = 42; H = 3.595208, Hc = 3.640717 (by hand)
    val df = (Seq(1L, 2, 3, 4, 10).map(v => (v, "a"))
      ++ Seq(2L, 4, 4, 8).map(v => (v, "b"))
      ++ Seq(5L, 5, 6, 12, 13, 3).map(v => (v, "c"))).toDF("s", "g")
    val r = graft.ops.MlOps.kruskalWallis(df, "s", "g").collect().head
    assert(r.getAs[Long]("n") == 15L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("tie3") == 42L)
    assert(math.abs(r.getAs[Double]("h") - 3.595208) < 1e-6)
    assert(math.abs(r.getAs[Double]("h_corrected") - 3.640717) < 1e-6)
  }

  test("kruskalWallis two-group case is the Mann-Whitney z squared (asymptotic identity)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val xs = Seq.fill(40)(rnd.nextInt(9).toLong)
    val ys = Seq.fill(35)(rnd.nextInt(9).toLong + 2)
    val df = (xs.map(v => (v, "x")) ++ ys.map(v => (v, "y"))).toDF("s", "g")
    val h = graft.ops.MlOps.kruskalWallis(df, "s", "g").collect().head.getAs[Double]("h_corrected")
    val mw = graft.ops.MlOps.mannWhitney(
      (xs.map(v => (v, 1)) ++ ys.map(v => (v, 0))).toDF("s", "label"), "s", "label")
      .collect().head.getAs[Double]("z")
    // H (tie-corrected, 2 groups) == z² up to the MW continuity correction (z uses
    // |2U - n1 n2| - 2 in 2U units; drop it and the identity is exact) — tolerance
    // covers that correction's O(1/sqrt(var)) effect
    assert(math.abs(h - mw * mw) < 0.05, s"h=$h z^2=${mw * mw}")
  }

  test("kTruss: K4 + pendant triangle + path — k=3 keeps both cliques, k=4 keeps only K4") {
    import spark.implicits._
    import graft.ops.GraphOps
    // K4 on 1-4 (each edge in 2 triangles), triangle {4,10,11} glued at node 4
    // (each edge in 1 triangle), path 20-21-22 (no triangles)
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val tri = Seq((4L, 10L), (4L, 11L), (10L, 11L))
    val path = Seq((20L, 21L), (21L, 22L))
    val edges = (k4 ++ tri ++ path).toDF("u", "v")
    val t3 = GraphOps.kTruss(edges, k = 3, rounds = 4, requireConverged = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(t3.keySet == (k4 ++ tri).toSet, s"k=3 must keep both cliques: ${t3.keySet}")
    k4.foreach(e => assert(t3(e) == 2L, s"K4 edge $e support"))
    tri.foreach(e => assert(t3(e) == 1L, s"triangle edge $e support"))
    val t4 = GraphOps.kTruss(edges, k = 4, rounds = 4, requireConverged = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t4 == k4.toSet, s"k=4 must peel the pendant triangle too: $t4")
    // cascade: removing the pendant triangle must not disturb K4's supports
    val t4s = GraphOps.kTruss(edges, k = 4, rounds = 4).collect()
      .map(_.getLong(2)).toSet
    assert(t4s == Set(2L))
    // adaptive budget: k=4 needs 2 rounds (peel the pendant, then observe the
    // fixpoint) — a 1-round budget with requireConverged must fail LOUDLY
    val ex = intercept[IllegalStateException] {
      GraphOps.kTruss(edges, k = 4, rounds = 1, requireConverged = true).collect()
    }
    assert(ex.getMessage.contains("raise the budget"))
    // k=2 is vacuous (support >= 0): EVERY edge survives, including the triangle-free
    // path — a semi-join against support() would silently drop it (ADVICE r10)
    val t2 = GraphOps.kTruss(edges, k = 2, rounds = 2, requireConverged = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(t2.keySet == (k4 ++ tri ++ path).toSet,
      s"k=2 must keep triangle-free edges: ${t2.keySet}")
    path.foreach(e => assert(t2(e) == 0L, s"path edge $e support must report 0"))
  }

  test("triangleStats: K4, triangle+tail, and a triangle-free star; degree-ordered == naive") {
    import spark.implicits._
    // K4: 4 nodes, 6 edges, C(4,2)·... wedges = 4·C(3,2)=12, triangles = 4, clustering = 1
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)).toDF("u", "v")
    val r1 = graft.ops.GraphOps.triangleStats(k4).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((4L, 6L, 12L, 4L)))
    assert(r1.getDouble(4) == 1.0)
    // triangle 1-2-3 with tail 3-4: wedges = 3 + C(3,2)... deg = (2,2,3,1) -> 1+1+3+0 = 5
    val tail = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r2 = graft.ops.GraphOps.triangleStats(tail).head()
    assert((r2.getLong(2), r2.getLong(3)) == ((5L, 1L)))
    // star: no triangles, clustering 0
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    assert(graft.ops.GraphOps.triangleStats(star).head().getLong(3) == 0L)
  }

  test("coOccurrenceEdges: minCount filters, maxGroupSize caps the basket blowup") {
    import spark.implicits._
    val m = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), // basket 10: pairs (1,2)(1,3)(2,3)
      (11L, 1L), (11L, 2L),            // (1,2) again -> co-count 2
      (12L, 7L), (12L, 8L), (12L, 9L), (12L, 6L) // big basket, capped away below
    ).toDF("g", "i")
    val e = graft.ops.GraphOps.coOccurrenceEdges(m, "g", "i", minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L)))
    val capped = graft.ops.GraphOps.coOccurrenceEdges(m, "g", "i", minCount = 1,
      maxGroupSize = Some(3)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L), (1L, 3L), (2L, 3L))) // basket 12 (size 4) dropped
  }

  test("boilerplateStrip: per-source counting — cross-source sharing alone never strips") {
    import spark.implicits._
    // srcA has 4 docs sharing "FOOTER-A" (stripped, nd=4>2); srcB has 2 docs sharing
    // "SHARED" with 2 srcA docs (4 docs globally — but nd<=2 per source, kept)
    val d = Seq(
      (1L, "one\nFOOTER-A\nSHARED", "srcA"), (2L, "two\nFOOTER-A\nSHARED", "srcA"),
      (3L, "three\nFOOTER-A", "srcA"), (4L, "four\nFOOTER-A", "srcA"),
      (5L, "five\nSHARED", "srcB"), (6L, "six\nSHARED", "srcB"))
      .toDF("doc_id", "text", "source")
    val out = DedupOps.boilerplateStrip(d).orderBy("doc_id").collect()
    // doc 1: 3 lines, FOOTER-A stripped, SHARED kept (per-source nd=2 <= 2)
    assert(out(0).getAs[Long]("n_lines") == 3L && out(0).getAs[Long]("n_kept") == 2L)
    assert(out(4).getAs[Long]("n_kept") == 2L, "srcB SHARED must be kept")
    // global lineDedup WOULD strip SHARED (4 docs > 2) — the per-source rule is distinct
    val global = DedupOps.lineDedup(d).orderBy("doc_id").collect()
    assert(global(4).getAs[Long]("n_kept") == 1L)
  }

  test("multiSourceBfs: frontier distances with min-over-sources, horizon cap respected") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7 with sources {1, 6}: each node takes min hops to either
    val g = (1L to 6L).map(i => (i, i + 1)).toDF("u", "v")
    val src = Seq(1L, 6L).toDF("id")
    val r = graft.ops.GraphOps.multiSourceBfs(g, src, rounds = 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L, 7L -> 1L),
      s"bfs wrong: $r")
    // horizon 1: only sources + direct neighbors
    val r1 = graft.ops.GraphOps.multiSourceBfs(g, Seq(1L).toDF("id"), rounds = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1 == Map(1L -> 0L, 2L -> 1L))
  }

  test("connectedComponentsStar: chain + triangle + isolated pair label to component minima") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    val g = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L)).toDF("u", "v")
    val r = graft.ops.GraphOps.connectedComponentsStar(g).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(r == want, s"labels wrong: $r")
  }

  test("connectedComponentsStar == min-label duplicateClusters on random + chain graphs (property)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 17)
      val n = 24 + rnd.nextInt(12)
      // sparse random edges (fragments into several components) + one long chain
      // segment (the high-diameter shape min-label is slow on and star-contraction
      // exists to handle)
      val rand = (for {
        u <- 0L until n
        v <- (u + 1) until n if rnd.nextDouble() < 0.04
      } yield (u, v)).distinct
      val chainBase = n + 1L
      val chain = (0L until 10L).map(i => (chainBase + i, chainBase + i + 1))
      val edges = rand ++ chain
      val got = graft.ops.GraphOps.connectedComponentsStar(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = DedupOps.duplicateClusters(
          edges.toDF("id_a", "id_b"), maxIters = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref, s"seed=$seed got=$got ref=$ref")
    }
  }

  test("edgeSetStats: order/partition-insensitive fingerprint, discriminates real set changes") {
    import spark.implicits._
    val a = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("u", "v")
    val shuffled = Seq((5L, 6L), (1L, 2L), (3L, 4L)).toDF("u", "v").repartition(7)
    val b = Seq((1L, 2L), (3L, 4L), (5L, 7L)).toDF("u", "v")
    val statsA = graft.ops.GraphOps.edgeSetStats(a)
    assert(statsA == graft.ops.GraphOps.edgeSetStats(shuffled),
      "fingerprint must not depend on row order or partitioning")
    assert(statsA != graft.ops.GraphOps.edgeSetStats(b),
      "a one-edge change must move the fingerprint")
    assert(statsA._1 == 3L, "count is part of the comparison, not checksum alone")
    // empty set: coalesce pins the digests so stats are defined, not NULL-poisoned
    assert(graft.ops.GraphOps.edgeSetStats(a.limit(0)) == ((0L, 0L, 0L)))
  }

  test("connectedComponentsStar: a forced checksum collision fails LOUDLY, never returns wrong labels") {
    import spark.implicits._
    // A convergenceStats that reports every edge set as identical simulates the
    // (~2^-128) double-digest collision: the loop falsely converges after one round.
    // On a 12-chain one contraction round is nowhere near the fixpoint, so the
    // endpoint-agreement verify MUST throw — the self-certifying backstop that makes
    // the probabilistic fingerprint safe to use for convergence.
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("u", "v")
    // localFinishEdges = 0: the collision scenario targets the DISTRIBUTED loop (the
    // adaptive local finish never consults the fingerprint)
    val ex = intercept[IllegalArgumentException] {
      graft.ops.GraphOps.connectedComponentsStar(chain,
        convergenceStats = _ => (0L, 0L, 0L), localFinishEdges = 0L).collect()
    }
    assert(ex.getMessage.contains("labels disagree"))
    // the honest fingerprint on the same graph converges to the right answer
    val ok = graft.ops.GraphOps.connectedComponentsStar(chain, localFinishEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("connectedComponentsStar: hybrid local finish == pure distributed on random graphs (property)") {
    import spark.implicits._
    // the default adaptive path (union-find once the contracted set fits) must be
    // row-identical to the pure star-contraction fixpoint, including mid-contraction
    // switches (threshold 4 forces several distributed rounds first on the chain)
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 31)
      val n = 20 + rnd.nextInt(12)
      val rand = (for {
        u <- 0L until n
        v <- (u + 1) until n if rnd.nextDouble() < 0.05
      } yield (u, v)).distinct
      val chain = (0L until 12L).map(i => (100L + i, 101L + i))
      val edges = (rand ++ chain).toDF("u", "v")
      val pure = graft.ops.GraphOps.connectedComponentsStar(edges, localFinishEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hybridNow = graft.ops.GraphOps.connectedComponentsStar(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hybridMid = graft.ops.GraphOps.connectedComponentsStar(edges, localFinishEdges = 4L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hybridNow == pure, s"seed=$seed immediate local finish diverged")
      assert(hybridMid == pure, s"seed=$seed mid-contraction local finish diverged")
    }
  }
}
