package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, RetrievalOps, SampleOps, TextOps, VectorOps}

/**
 * Specs for the round-4 additions: exact duplicated-span detection (ExactSubstr-style,
 * Lee et al. 2022), exact two-phase heavy hitters, and SemDeDup (Abbas et al. 2023).
 */
class SpanHeavySemSpec extends SparkSpec {
  import spark.implicits._

  // -- spanDedupStats -------------------------------------------------------------------

  private def words(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("spanDedupStats: planted shared span surfaces as one maximal run; short docs zero") {
    // doc 1 and doc 2 share a 20-token span (k=12 → 9 duplicated windows in a single run);
    // doc 3 is unique; doc 4 is too short to have any window.
    val shared = words(20, "s")
    val docs = Seq(
      (1L, words(15, "a") + " " + shared + " " + words(15, "b")),
      (2L, words(11, "c") + " " + shared + " " + words(3, "d")),
      (3L, words(60, "u")),
      (4L, words(5, "tiny"))).toDF("doc_id", "text")
    val r = DedupOps.spanDedupStats(docs, k = 12)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

    val Seq(d1, d2, d3, d4) = r.toSeq
    // 20-token shared span → 20 - 12 + 1 = 9 duplicated windows, consecutive
    assert(d1 == ((1L, 39L, 9L, 9L)), s"doc1: $d1") // 50 tokens → 39 windows
    assert(d2 == ((2L, 23L, 9L, 9L)), s"doc2: $d2") // 34 tokens → 23 windows
    assert(d3._3 == 0L && d3._4 == 0L && d3._2 == 49L, s"doc3: $d3")
    assert(d4 == ((4L, 0L, 0L, 0L)), s"doc4: $d4")
  }

  test("spanDedupStats: two disjoint shared spans produce separate runs, max is the longer") {
    val sA = words(14, "x") // 3 windows at k=12
    val sB = words(16, "y") // 5 windows at k=12
    val docs = Seq(
      (1L, sA + " " + words(20, "m") + " " + sB),
      (2L, sA + " " + words(20, "n") + " " + sB)).toDF("doc_id", "text")
    val r = DedupOps.spanDedupStats(docs, k = 12)
      .as[(Long, Long, Long, Long)].collect()
    r.foreach { case (_, _, nDup, maxRun) =>
      assert(nDup == 8L, s"expected 3+5 dup windows, got $nDup")
      assert(maxRun == 5L, s"expected max run 5, got $maxRun")
    }
  }

  test("spanDedupStats: equals a naive reference on random corpora") {
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 6).map(i => s"v$i") // tiny vocabulary → natural window collisions
    for (trial <- 1 to 4) {
      val k = 2 + rnd.nextInt(3)
      val docs = (0 until 25).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // naive reference over the same tokenization
      val winsByDoc = docs.map { case (id, text) =>
        val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
        id -> toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toVector
      }.toMap
      val docsOf = winsByDoc.toSeq.flatMap { case (id, ws) => ws.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val want = winsByDoc.map { case (id, ws) =>
        val dup = ws.map(w => docsOf(w) > 1)
        val runs = dup.foldLeft(List.empty[Int]) {
          case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
          case (acc, true) => 1 :: acc
          case (acc, false) => 0 :: acc
        }
        id -> ((ws.size.toLong, dup.count(identity).toLong,
          if (runs.isEmpty) 0L else runs.max.toLong))
      }
      val got = DedupOps.spanDedupStats(docs.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == want, s"trial $trial k=$k:\n got ${got.toSeq.sortBy(_._1)}\nwant ${want.toSeq.sortBy(_._1)}")
    }
  }

  test("spanDedupStats: exchanges never carry window text") {
    val docs = Seq((1L, words(40, "w"))).toDF("doc_id", "text")
    val plan = DedupOps.spanDedupStats(docs, k = 12).queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
    // every aggregate below the final per-doc stats groups hashes/ids, not strings
    def aggInputs(p: LogicalPlan): Seq[String] = p.collect { case a: Aggregate =>
      a.groupingExpressions.map(_.dataType.simpleString)
    }.flatten
    assert(!aggInputs(plan).contains("string"),
      "a shuffle-grouping key is a raw string — window text must be hashed before exchange")
  }

  // -- heavyHitters ---------------------------------------------------------------------

  // -- spanRemoveStats (the Lee et al. 50-token-grain big sibling; k shrunk for tests) --

  test("spanRemoveStats: exact copy loses everything, keeper doc loses nothing") {
    val t = words(30, "t")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = DedupOps.spanRemoveStats(docs, k = 12)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 30 tokens → 19 windows; every doc-2 window is a loser (keeper = min doc_id),
    // merging into ONE span covering the whole doc: removed = 18 - 0 + 12 = 30
    assert(r == Seq((1L, 30L, 19L, 0L, 0L, 0L), (2L, 30L, 19L, 19L, 1L, 30L)), s"$r")
  }

  test("spanRemoveStats: within-doc repeat — first occurrence keeps, second is cut") {
    val s = words(15, "s")
    val docs = Seq((1L, s + " " + words(20, "m") + " " + s)).toDF("doc_id", "text")
    val r = DedupOps.spanRemoveStats(docs, k = 12)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 50 tokens → 39 windows; the repeated 15-token span has 4 windows per occurrence
    // (idx 0..3 keep, idx 35..38 lose) → one merged span of 38 - 35 + 12 = 15 tokens
    assert(r == Seq((1L, 50L, 39L, 4L, 1L, 15L)), s"$r")
  }

  test("spanRemoveStats: keeper election is lexicographic (doc, idx) — doc order beats position") {
    val a = words(14, "a") // 3 windows at k=12
    val docs = Seq(
      (1L, words(25, "f") + " " + a), // span late in the LOW doc id
      (2L, a + " " + words(25, "g"))  // span at idx 0 in the high doc id
    ).toDF("doc_id", "text")
    val r = DedupOps.spanRemoveStats(docs, k = 12)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // keeper is doc 1 despite its larger win_idx; doc 2 loses the 14-token span
    assert(r(0)._4 == 0L && r(0)._6 == 0L, s"doc1 must keep: ${r(0)}")
    assert(r(1)._4 == 3L && r(1)._5 == 1L && r(1)._6 == 14L, s"doc2 must lose the span: ${r(1)}")
  }

  test("spanRemoveStats: equals a naive reference on random corpora (md5 and kernel agree)") {
    val rnd = new scala.util.Random(29)
    val vocab = (0 until 5).map(i => s"w$i")
    for (trial <- 1 to 3) {
      val k = 4
      val docs = (1L to 8L).map { id =>
        (id, (0 until (k + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // naive: occurrences on window STRINGS, keeper = min (doc, idx), interval merge
      val occ = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").toSeq
        toks.sliding(k).zipWithIndex.filter(_._1.size == k)
          .map { case (w, i) => (w.mkString(" "), id, i.toLong) }
      }
      val keeper = occ.groupBy(_._1).filter(_._2.size > 1)
        .map { case (w, os) => w -> os.map(o => (o._2, o._3)).min }
      val expect = docs.map { case (id, text) =>
        val n = text.split(" ").length.toLong
        val nw = math.max(0L, n - k + 1)
        val loserIdx = occ.filter(o => o._2 == id && keeper.get(o._1).exists(_ != ((id, o._3))))
          .map(_._3).sorted
        // merge [i, i+k-1] intervals on overlap-or-adjacency
        val spans = loserIdx.foldLeft(List.empty[(Long, Long)]) { case (acc, i) =>
          acc match {
            case (s0, e0) :: rest if i <= e0 + 1 => (s0, math.max(e0, i + k - 1)) :: rest
            case _ => (i, i + k - 1) :: acc
          }
        }.reverse
        (id, n, nw, loserIdx.size.toLong, spans.size.toLong,
          spans.map { case (s0, e0) => e0 - s0 + 1 }.sum)
      }.sortBy(_._1).toSeq
      for (kernel <- Seq(false, true)) {
        val got = DedupOps.spanRemoveStats(docs.toDF("doc_id", "text"), k, kernel = kernel)
          .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
        assert(got == expect, s"trial $trial kernel=$kernel:\n got    $got\n expect $expect")
      }
    }
  }

  test("heavyHitters: exact vs naive on skewed data, invariant to partitioning") {
    val rnd = new scala.util.Random(7)
    // zipf-ish: token i appears ~ 3000/(i+1) times
    val toks = (0 until 40).flatMap(i => Seq.fill(3000 / (i + 1))(s"tok$i"))
    val shuffled = rnd.shuffle(toks)
    val docs = shuffled.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")

    val total = toks.size
    val expected = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 50 > total }.toMap

    for (nPart <- Seq(1, 3, 8)) {
      val got = TextOps.heavyHitters(docs.repartition(nPart), invPhi = 50)
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"nPart=$nPart: got ${got.size}, expected ${expected.size}")
    }
  }

  test("heavyHitters: phase-2 exchange carries only candidate tokens (semi-join before groupBy)") {
    val docs = Seq((1L, "a a a b c")).toDF("doc_id", "text")
    val plan = TextOps.heavyHitters(docs, invPhi = 3).queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"),
      "candidate filter should broadcast into the recount scan")
  }

  // -- semDeDup -------------------------------------------------------------------------

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("semDeDup: exact copy drops, orthogonal vectors keep, greedy keeps lowest id") {
    // two tight groups far apart; ids chosen so the keeper is always the smallest
    val data = Seq(
      (1L, vec(1, 0, 0, 0)), (5L, vec(1, 0, 0, 0)),          // copies → 5 drops
      (2L, vec(0.99, 0.141, 0, 0)),                           // near 1 → drops if same cell
      (10L, vec(0, 0, 1, 0)), (11L, vec(0, 0, 0, 1))).toDF("vec_id", "embedding")
    val r = VectorOps.semDeDup(data, eps = 0.999, nClusters = 2, iters = 3)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(r(1L), "lowest id of the duplicate group must be kept")
    assert(!r(5L), "exact copy with larger id must drop")
    assert(r(10L) && r(11L), "orthogonal vectors must be kept")
  }

  test("semDeDup: kept set has no in-cell pair above eps (greedy invariant)") {
    val rnd = new scala.util.Random(13)
    def noisy(base: Array[Float]) =
      base.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    val base = Array.fill(4)(Array.fill(8)(rnd.nextFloat()))
    val data = (0 until 60).map(i => (i.toLong, noisy(base(i % 4)))).toDF("vec_id", "embedding")
    val res = VectorOps.semDeDup(data, eps = 0.95, nClusters = 4, iters = 3)
    val kept = res.filter(col("kept")).join(data, "vec_id")
    val viol = VectorOps.cosineNearDupPairsExact(kept, threshold = 0.95, blockCol = "cell").count()
    assert(viol == 0L, s"$viol kept in-cell pairs above eps")
    // and something actually deduped: 60 noisy copies of 4 bases can't all survive
    assert(res.filter(col("kept")).count() < 30, "near-copies should have been dropped")
  }

  test("semDeDup keep policies: farthest keeps the rim vector that min_id drops; ties keep lowest id") {
    // one cluster, three coplanar unit vectors: a at 0 deg (id 1), b at 7 deg (id 2,
    // sim(a,b)=cos 7 deg = 0.9925 >= eps), c at -25 deg (id 3, similar to NOBODY at 0.99
    // but pulling the centroid to ~-6 deg, so b is strictly farther from it than a)
    val data = Seq(
      (1L, vec(1, 0, 0, 0)),
      (2L, vec(math.cos(0.1222), math.sin(0.1222), 0, 0)),
      (3L, vec(math.cos(-0.4363), math.sin(-0.4363), 0, 0))).toDF("vec_id", "embedding")
    val far = VectorOps.semDeDup(data, eps = 0.99, nClusters = 1, iters = 1, keep = "farthest")
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(far(2L) && !far(1L) && far(3L), s"farthest must keep the rim vector: $far")
    val near = VectorOps.semDeDup(data, eps = 0.99, nClusters = 1, iters = 1)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(near(1L) && !near(2L) && near(3L), s"min_id must keep the smallest id: $near")
    // exact copies tie on centroid distance -> id tie-break drops the larger id, so the
    // planted-copy gate contract holds under BOTH policies
    val copies = Seq((1L, vec(1, 0, 0, 0)), (9L, vec(1, 0, 0, 0))).toDF("vec_id", "embedding")
    val fc = VectorOps.semDeDup(copies, eps = 0.99, nClusters = 1, iters = 1, keep = "farthest")
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(fc(1L) && !fc(9L), s"tie must keep the smaller id: $fc")
  }

  // -- dsirWeights ----------------------------------------------------------------------

  test("dsirWeights: target-vocabulary docs score above off-target; stable under repartition") {
    // two disjoint vocabularies; target = A-speakers. A fresh doc written in vocabulary A
    // must outweigh one written in vocabulary B.
    val vocabA = (0 until 30).map(i => s"alpha$i")
    val vocabB = (0 until 30).map(i => s"beta$i")
    val rnd = new scala.util.Random(11)
    def doc(v: Seq[String]) = Seq.fill(40)(v(rnd.nextInt(v.size))).mkString(" ")
    val rows = (0 until 20).map(i => (i.toLong, doc(vocabA), true)) ++
      (20 until 40).map(i => (i.toLong, doc(vocabB), false)) ++
      Seq((100L, doc(vocabA), false), (101L, doc(vocabB), false), (102L, "", false))
    val df = rows.toDF("doc_id", "text", "tgt")

    val w = SampleOps.dsirWeights(df, isTarget = col("tgt"))
      .as[(Long, Double)].collect().toMap
    assert(w(100L) > w(101L), s"A-vocab doc ${w(100L)} must outweigh B-vocab doc ${w(101L)}")
    assert(w(100L) > 0 && w(101L) < 0, "sign should follow the likelihood ratio")
    assert(w(102L) == 0.0, "token-free doc weighs 0.0")
    assert(w.size == 43, "every input doc gets a weight")

    val w2 = SampleOps.dsirWeights(df.repartition(7), isTarget = col("tgt"))
      .as[(Long, Double)].collect().toMap
    assert(w2 == w, "weights must be partitioning-invariant")
  }

  // -- hybridRrfTopK --------------------------------------------------------------------

  test("hybridRrfTopK: both-list docs outrank single-list docs; RRF arithmetic exact") {
    // doc 10: lexical AND vector match; doc 11: lexical only; doc 12: vector only;
    // the rest are noise. Query vector id 0 is the query's own embedding.
    val docs = Seq(
      (10L, "needle needle needle haystack"),
      (11L, "needle needle needle needle thread"),
      (12L, "completely unrelated prose"),
      (13L, "more filler text here"),
      (14L, "other filler text again")).toDF("doc_id", "text")
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val emb = Seq(
      (0L, v(1, 0, 0)),        // the query vector
      (10L, v(0.98, 0.2, 0)),  // close
      (11L, v(0, 1, 0)),       // orthogonal
      (12L, v(0.9, 0.43, 0)),  // close-ish
      (13L, v(0, 0, 1)), (14L, v(0, 0.7, 0.7))).toDF("vec_id", "embedding")

    val r = RetrievalOps.hybridRrfTopK(docs, emb,
        Seq(("q", "needle haystack", 0L)), k = 5, kPer = 3)
      .as[(String, Long, Double, Long)].collect().sortBy(_._4)
    assert(r.head._2 == 10L, s"doc in both lists must fuse to rank 1, got ${r.toSeq}")
    // doc 10 is lexical rank 1 (two query terms) and vector rank 1 → 2/(60+1)
    assert(math.abs(r.head._3 - math.floor(2.0 / 61 * 1e6) / 1e6) < 1.6e-6,
      s"RRF score of a double rank-1 should be ~2/61, got ${r.head._3}")
    val ids = r.map(_._2).toSet
    assert(ids.contains(11L) && ids.contains(12L), "single-list docs still retrieved")
  }

  // -- intervalJoin ---------------------------------------------------------------------

  test("mmrRerank: a duplicate of the top hit is demoted below a diverse hit; lambda=10 is pure relevance") {
    import graft.ops.RetrievalOps
    // query q points at axis x; candidates: a = x (rel 1.0), b = exact copy of a,
    // c = diagonal x+y (rel ~0.707), d = axis y (rel 0). At λ = 0.3 after picking a:
    // score(b) = 0.3·1 − 0.7·1 = −0.4, score(c) = 0.707·(0.3 − 0.7) ≈ −0.283,
    // score(d) = 0 → exact order a, d, c; the perfect duplicate b never places.
    val vecs = Seq(
      (100L, Array(1f, 0f, 0f)), // query
      (1L, Array(1f, 0f, 0f)),   // a: identical to query
      (2L, Array(1f, 0f, 0f)),   // b: duplicate of a
      (3L, Array(0.7071f, 0.7071f, 0f)), // c: diagonal
      (4L, Array(0f, 1f, 0f))    // d: orthogonal
    ).toDF("vec_id", "embedding")
    val out = RetrievalOps.mmrRerank(
        vecs.filter(col("vec_id") =!= 100L), vecs.filter(col("vec_id") === 100L),
        k = 3, kPer = 4, lambdaE1 = 3)
      .collect().map(r => (r.getInt(2), r.getLong(1))).sortBy(_._1).toSeq
    assert(out == Seq((1, 1L), (2, 4L), (3, 3L)),
      s"MMR order must be a, d, c — the duplicate b must never place: $out")
    // lambda = 10 → mu = 0: ranking degenerates to relevance order (ties on id)
    val rel = RetrievalOps.mmrRerank(
        vecs.filter(col("vec_id") =!= 100L), vecs.filter(col("vec_id") === 100L),
        k = 4, kPer = 4, lambdaE1 = 10)
      .collect().map(r => (r.getInt(2), r.getLong(1))).sortBy(_._1).map(_._2).toSeq
    assert(rel == Seq(1L, 2L, 3L, 4L), s"lambda=10 must be relevance order: $rel")
  }

  test("intervalJoin: equals the naive range join on random data, window edges inclusive") {
    val rnd = new scala.util.Random(5)
    // times include negatives: the exact floor-division bucketing must hold below zero
    val left = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, (rnd.nextInt(1000) - 500).toLong)).toDF("lid", "k", "t")
    val right = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, (rnd.nextInt(1000) - 500).toLong)).toDF("rid", "k", "t")
    for ((lo, hi) <- Seq((1L, 50L), (0L, 37L), (-20L, 20L))) {
      val got = graft.operators.IntervalJoin
        .intervalJoin(left, right, Seq("k"), "t", lo, hi)
        .select("lid", "r_rid").as[(Long, Long)].collect().toSet
      val want = left.as("l").join(right.as("r"),
          col("l.k") === col("r.k") &&
            col("r.t") >= col("l.t") + lo && col("r.t") <= col("l.t") + hi)
        .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
      assert(got == want, s"window [$lo,$hi]: ${got.size} vs ${want.size} pairs")
    }
  }

  test("intervalJoin: degenerate lo==hi exact-offset window matches the naive join") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L)).toDF("lid", "k", "t")
    val right = Seq((9L, 1L, 150L), (8L, 1L, 250L), (7L, 1L, 100L)).toDF("rid", "k", "t")
    val got = graft.operators.IntervalJoin.intervalJoin(left, right, Seq("k"), "t", 50L, 50L)
      .select("lid", "r_rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 9L), (2L, 8L)), s"exact +50 offsets: $got")
  }

  test("hybridRrfTopK: two queries sharing one query vector get full-depth identical ANN ranks") {
    val docs = Seq((10L, "alpha beta"), (11L, "gamma delta"), (12L, "epsilon zeta"))
      .toDF("doc_id", "text")
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val emb = Seq((0L, v(1, 0)), (10L, v(0.9, 0.44)), (11L, v(0.7, 0.71)), (12L, v(0, 1)))
      .toDF("vec_id", "embedding")
    val r = RetrievalOps.hybridRrfTopK(docs, emb,
        Seq(("qa", "alpha", 0L), ("qb", "gamma", 0L)), k = 3, kPer = 3)
      .as[(String, Long, Double, Long)].collect()
    val byQ = r.groupBy(_._1)
    // no duplicated doc within a query's fused list (the shared-vector fan-out bug)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).distinct.length == rows.length, s"$q has duplicate docs: ${rows.toSeq}")
    }
    // ANN contributions identical: docs lexically matched by neither query rank the same
    val aOnly = byQ("qa").filter(_._2 == 12L).map(x => (x._3, x._4)).toSeq
    val bOnly = byQ("qb").filter(_._2 == 12L).map(x => (x._3, x._4)).toSeq
    assert(aOnly == bOnly, s"shared vector must give identical ANN-only entries: $aOnly vs $bOnly")
  }

  test("intervalJoin: no duplicate pairs, prefixed outputs, collision guard") {
    val left = Seq((1L, 1L, 100L)).toDF("lid", "k", "t")
    val right = Seq((9L, 1L, 120L)).toDF("rid", "k", "t")
    val out = graft.operators.IntervalJoin.intervalJoin(left, right, Seq("k"), "t", 0L, 50L)
    assert(out.columns.sorted.toSeq == Seq("k", "lid", "r_rid", "r_t", "t"))
    assert(out.count() == 1L, "exactly one pair, found in exactly one bucket")
    val clash = Seq((1L, 1L, 100L, "x")).toDF("lid", "k", "t", "r_t")
    intercept[IllegalArgumentException] {
      graft.operators.IntervalJoin.intervalJoin(clash, right, Seq("k"), "t", 0L, 50L)
    }
  }

  // -- TextSignals ----------------------------------------------------------------------

  test("TextSignals: one-pass signals equal an independent reference on random docs") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 12).map(i => s"w$i") ++ TextOps.Stopwords.take(5)
    val docs = (0 until 40).map { i =>
      val n = rnd.nextInt(30) // includes 0- and 1-token docs
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")

    // independent reference: plain Scala over the same tokenization
    def ref(text: String): (Long, Long, Long, Long) = {
      val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val top = if (bigrams.isEmpty) 0L
        else bigrams.groupBy(identity).values.map(_.size).max.toLong
      (toks.size.toLong, toks.distinct.size.toLong,
        toks.count(TextOps.Stopwords.contains).toLong, top)
    }

    val got = df.select(col("doc_id"),
        graft.functions.TextFunctions.textSignals(
          TextOps.tokensCol(col("text")), TextOps.Stopwords).as("s"))
      .select(col("doc_id"), col("s.n_tokens"), col("s.n_distinct"),
        col("s.n_stop"), col("s.top_bigram_n"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, a, b, c, d) => id -> ((a, b, c, d)) }.toMap

    docs.foreach { case (id, text) =>
      assert(got(id) == ref(text), s"doc $id '$text': got ${got(id)}, want ${ref(text)}")
    }
  }

  test("quality/repetition keep their values through the TextSignals rewrite (narrow plans)") {
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog and the quick brown fox"),
      (2L, "a b"), (3L, ""), (4L, "one")).toDF("doc_id", "text")
    val q = TextOps.qualityScore(docs).as[(Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: 13 tokens, stopwords {the,the,and,the,and} = 5 → 0.5 + 5/13*0.5
    assert(q(1L)._2 == 13L)
    assert(math.abs(q(1L)._6 - math.rint((0.5 + 5.0 / 13 * 0.5) * 1e4) / 1e4) < 1e-9)
    assert(q(3L)._2 == 0L && q(3L)._6 == 0.0)
    val r = TextOps.repetitionScore(docs).as[(Long, Long, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    // doc 1: bigram "the quick" ×2 = top, 12 bigrams, frac = 2/12
    assert(math.abs(r(1L)._4 - math.rint(2.0 / 12 * 1e4) / 1e4) < 1e-9, s"${r(1L)}")
    assert(r(4L)._4 == 0.0 && r(3L)._4 == 0.0)
    // and the plans are narrow: no exchange anywhere in repetitionScore now
    val plan = TextOps.repetitionScore(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetitionScore must be a narrow map:\n$plan")
  }

  // -- spanAdmission --------------------------------------------------------------------

  test("spanAdmission: stitched-from-corpus docs reject, novel docs admit, index dups harmless") {
    val corpusSpanA = words(30, "ca")
    val corpusSpanB = words(30, "cb")
    val corpus = Seq((1L, corpusSpanA), (2L, corpusSpanB)).toDF("doc_id", "text")
    val index = DedupOps.windowHashes(corpus, k = 12)
    val batch = Seq(
      (10L, corpusSpanA + " " + corpusSpanB),  // pure stitch of seen spans → reject
      (11L, words(40, "novel")),               // fully novel → admit
      (12L, corpusSpanA + " " + words(60, "x")), // minority overlap → admit
      (13L, words(5, "tiny"))).toDF("doc_id", "text") // no windows → admit
    // duplicate index rows must not inflate shared counts (left-semi probe)
    val dupIndex = index.union(index)
    for (ix <- Seq(index, dupIndex)) {
      val r = DedupOps.spanAdmission(batch, ix, k = 12, maxSharedFrac = 0.5)
        .select("doc_id", "admitted", "shared_frac")
        .as[(Long, Boolean, Double)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
      assert(!r(10L)._1, s"stitched doc must reject: ${r(10L)}")
      // 60 tokens → 49 windows; 2×19 within-span windows shared, the 11 seam windows novel
      assert(r(10L)._2 == math.rint(38.0 / 49 * 1e6) / 1e6, s"stitch frac: ${r(10L)}")
      assert(r(11L)._1 && r(11L)._2 == 0.0, s"novel doc: ${r(11L)}")
      assert(r(12L)._1, s"minority-overlap doc must admit: ${r(12L)}")
      assert(r(13L)._1 && r(13L)._2 == 0.0, s"short doc: ${r(13L)}")
    }
  }

  // -- PCA ------------------------------------------------------------------------------

  test("jacobiEigen: known symmetric matrices decompose exactly") {
    val (vals, _) = VectorOps.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      vals.toSeq.toString)
    val (v3, _) = VectorOps.jacobiEigen(
      Array(Array(4.0, 0.0, 0.0), Array(0.0, 9.0, 0.0), Array(0.0, 0.0, 1.0)))
    assert(v3.sorted.toSeq == Seq(1.0, 4.0, 9.0))
  }

  test("pcaFit recovers a planted principal axis; whitened components have unit variance") {
    val rnd = new scala.util.Random(7)
    // spread along (1,1,0,0)/sqrt2 with small noise on dim 2
    val rows = (0 until 400).map { i =>
      val tv = rnd.nextGaussian() * 5.0
      val n = rnd.nextGaussian() * 0.1
      (i.toLong, Array((tv / math.sqrt(2)).toFloat, (tv / math.sqrt(2)).toFloat, n.toFloat, 0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = VectorOps.pcaFit(df, k = 2)
    val ax = m.basis(0)
    assert(math.abs(math.abs(ax(0)) - 1 / math.sqrt(2)) < 0.02 &&
      math.abs(math.abs(ax(1)) - 1 / math.sqrt(2)) < 0.02 &&
      math.abs(ax(2)) < 0.05, s"axis ${ax.toSeq}")
    assert(m.eigenvalues(0) > 100 * m.eigenvalues(1), "planted direction must dominate")
    // deterministic model run to run
    val m2 = VectorOps.pcaFit(df, k = 2)
    assert(m.basis.map(_.toSeq).toSeq == m2.basis.map(_.toSeq).toSeq)
    // whitening: unit variance per component
    val w = VectorOps.pcaProject(df, m, whiten = true)
      .select((0 until 2).map(c => var_pop(col("components").getItem(c).cast("double"))): _*)
      .collect()(0)
    assert(math.abs(w.getDouble(0) - 1.0) < 0.01 && math.abs(w.getDouble(1) - 1.0) < 0.01,
      s"whitened variances: $w")
  }

  // -- kmvOverlap -----------------------------------------------------------------------

  test("kmvOverlap: estimator tracks exact Jaccard; sketch stats bounded by k; deterministic") {
    // engineered overlap: side B's docs are exact copies of side A's back half, so the
    // true shingle Jaccard is ~1/3 (10 shared docs of 30 distinct-doc contents)
    def doc(id: Long, from: Int) = (id, (from until from + 60).map(i => s"w$i").mkString(" "))
    val a = (0 until 20).map(i => doc(i, i * 50)).toDF("doc_id", "text")
    val b = (0 until 20).map(i => doc(100 + i, 500 + i * 50)).toDF("doc_id", "text")
    val r = DedupOps.kmvOverlap(a, b, k = 128).collect()(0)
    def shingleSet(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFunctions.shingles(
          graft.functions.TextFunctions.tokens(col("text")), 3)).as("sh"))
        .distinct().as[String].collect().toSet
    val sa = shingleSet(a); val sb = shingleSet(b)
    val exact = (sa intersect sb).size.toDouble / (sa union sb).size
    val est = r.getAs[Double]("est_jaccard")
    // KMV stderr at k=128 is ~sqrt(j(1-j)/k) ~ 0.04; 0.15 is generous determinism-safe room
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
    assert(r.getAs[Long]("n_a") == 128 && r.getAs[Long]("n_b") == 128 &&
      r.getAs[Long]("n_union") == 128)
    assert(r.getAs[Long]("a_kth_min") > 0 && r.getAs[Long]("n_shared") <= 128)
    assert(DedupOps.kmvOverlap(a, b, k = 128).collect()(0) == r, "sketch must be deterministic")
    // disjoint corpora estimate zero
    val z = DedupOps.kmvOverlap(a, (0 until 5).map(i => doc(500 + i, 100000 + i * 60))
      .toDF("doc_id", "text"), k = 64).collect()(0)
    assert(z.getAs[Long]("n_shared") == 0 && z.getAs[Double]("est_jaccard") == 0.0)
    // directional containment: a strict subset corpus is FULLY contained (exactly 1.0 —
    // every union-sketch member of B is in A), while A's own containment stays partial
    val sub = (0 until 5).map(i => doc(900 + i, 500 + i * 50)).toDF("doc_id", "text")
    val c = DedupOps.kmvOverlap(a, sub, k = 128).collect()(0)
    assert(c.getAs[Double]("est_containment_b") == 1.0, s"subset must be fully contained: $c")
    assert(c.getAs[Double]("est_containment_a") < 0.9)
  }

  // -- compressionRatio -----------------------------------------------------------------

  test("compressionRatio: repetitive text bands low, prose normal, noise high; deterministic") {
    val rnd = new scala.util.Random(53)
    val noise = Array.fill(4000)((rnd.nextInt(94) + 33).toChar).mkString // printable noise
    val docs = Seq(
      (1L, "spam spam spam " * 300),
      (2L, "The quarterly report outlines revenue growth across several distinct markets, " +
        "with notable regional variation in both volume and margin performance this year."),
      (3L, noise),
      (4L, "")).toDF("doc_id", "text")
    val r = TextOps.compressionRatio(docs)
      .as[(Long, Double, String)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(1L)._2 == "low", s"looped text must band low: ${r(1L)}")
    assert(r(2L)._2 == "normal", s"prose must band normal: ${r(2L)}")
    assert(r(3L)._2 == "high", s"noise must band high: ${r(3L)}")
    assert(r(4L) == ((1.0, "empty")), "empty text: sentinel ratio 1.0, its own band")
    val r2 = TextOps.compressionRatio(docs.repartition(3))
      .as[(Long, Double, String)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r2 == r, "ratio must be deterministic under re-partitioning")
  }

  // -- pmiPairs -------------------------------------------------------------------------

  test("pmiPairs: perfect collocations score high, independent pairs near zero") {
    val rnd = new scala.util.Random(41)
    // "san francisco" always adjacent; "the" and "cat" co-occur only by chance
    val fillers = Seq("the", "cat", "dog", "runs", "fast", "slow", "red", "blue")
    val docs = (0 until 50).map { i =>
      val noise = Seq.fill(40)(fillers(rnd.nextInt(fillers.size)))
      (i.toLong, (noise.take(20) ++ Seq("san", "francisco") ++ noise.drop(20)).mkString(" "))
    }.toDF("doc_id", "text")
    val r = TextOps.pmiPairs(docs, minCount = 5)
      .as[(String, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    assert(r.contains("san francisco"), s"collocation missing from ${r.keys.toSeq.sorted}")
    val sf = r("san francisco")
    val chance = r.view.filterKeys(k => !k.contains("san") && !k.contains("francisco"))
      .values.toSeq
    assert(chance.nonEmpty && chance.forall(_ < sf - 0.5),
      s"perfect collocation ($sf) must dominate chance pairs (max ${chance.max})")
    assert(chance.map(math.abs).max < 0.7, "independent pairs should sit near pmi 0")
  }

  // -- markupStrip ----------------------------------------------------------------------

  test("markupStrip: blocks dropped with contents, tags stripped, entities decode once") {
    val docs = Seq(
      (1L, "<html><body><p>Hello <b>world</b></p><script>evil(); </script></body></html>"),
      (2L, "a &amp;lt; b &amp; c &lt;tag&gt; d&nbsp;e"), // &amp;lt; must NOT double-decode
      (3L, "plain text no markup at all"),
      (4L, "<style type='text/css'>p { x }</style>visible"),
      (5L, "before <script>if (a < b) { document.write(\"<i>x</i>\"); }</script> after"),
      (6L, "<styles>not a style block</styles> kept")).toDF("doc_id", "text")
    val r = TextOps.markupStrip(docs).select("doc_id", "extracted")
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "Hello world", s"got '${r(1L)}'")
    assert(r(2L) == "a &lt; b & c <tag> d e", s"got '${r(2L)}'")
    assert(r(3L) == "plain text no markup at all")
    assert(r(4L) == "visible", s"style block + contents must vanish: '${r(4L)}'")
    assert(r(5L) == "before after", s"'<' inside JS must not leak code: '${r(5L)}'")
    assert(r(6L) == "not a style block kept", s"<styles> is not a block opener: '${r(6L)}'")
    // narrow map: no exchange
    val plan = TextOps.markupStrip(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "markupStrip must run at scan speed")
  }

  // -- round-4 pipeline composition -----------------------------------------------------

  test("markup -> signals -> span-screen -> DSIR: the extraction pipeline composes in one flow") {
    // raw "crawl": markup-wrapped docs; 2 and 3 share a long span; target slice = tag 'en'
    val span = words(25, "shared")
    val raw = Seq(
      (1L, s"<html><body><p>${words(40, "en")}</p></body></html>", "en"),
      (2L, s"<p>${words(10, "a")} $span</p>", "en"),
      (3L, s"<div>${words(10, "b")} $span</div>", "fr"),
      (4L, s"<p>${words(30, "fr")}</p><script>x()</script>", "fr")).toDF("doc_id", "text", "lang")

    val extracted = TextOps.markupStrip(raw).select(col("doc_id"), col("extracted").as("text"))
      .join(raw.select("doc_id", "lang"), "doc_id")
    // extraction removed every tag before the text ops see the corpus
    assert(extracted.filter(col("text").contains("<")).count() == 0)

    val sig = TextOps.docSignals(extracted, keep = Seq("lang"))
    assert(sig.count() == 4 && sig.filter(col("n_tokens") > 0).count() == 4)

    val spans = DedupOps.spanDedupStats(extracted, k = 12)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(spans(2L) > 0 && spans(3L) > 0, "shared span must surface after extraction")
    assert(spans(1L) == 0 && spans(4L) == 0)

    val weights = SampleOps.dsirWeights(extracted, isTarget = col("lang") === "en")
      .as[(Long, Double)].collect().toMap
    assert(weights(1L) > weights(4L), "en-vocabulary doc must outweigh fr-only doc")
    assert(weights.size == 4)
  }

  // -- exactPercentiles -----------------------------------------------------------------

  test("exactPercentiles: histogram form equals the Percentile built-in on random grids") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(500) // includes tiny N where interpolation edges matter
      val vals = Seq.fill(n)(rnd.nextInt(40).toLong)
      val df = vals.map(Tuple1(_)).toDF("v")
      val ps = Seq(0.0, 0.25, 0.5, 0.95, 1.0)
      val got = SampleOps.exactPercentiles(df,
          ps.zipWithIndex.map { case (p, i) => (s"p$i", col("v"), p) })
        .collect()(0)
      val want = df.agg(
          expr(s"percentile(v, 0.0)"), expr(s"percentile(v, 0.25)"),
          expr(s"percentile(v, 0.5)"), expr(s"percentile(v, 0.95)"),
          expr(s"percentile(v, 1.0)"))
        .collect()(0)
      for (i <- ps.indices)
        assert(got.getDouble(i) == want.getDouble(i),
          s"trial $trial n=$n p=${ps(i)}: ${got.getDouble(i)} != ${want.getDouble(i)}")
    }
  }
}
