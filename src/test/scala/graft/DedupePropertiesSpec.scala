package graft

import graft.operators.Cdc
import graft.ops.DedupOps

/**
 * Property tests for last-write-wins dedupe (SURVEY §5 port strategy), over seeded random
 * event streams:
 *  - idempotence: dedupe(dedupe(x)) == dedupe(x)
 *  - chunk-boundary invariance: dedupe(union(chunks)) == dedupe(whole) for arbitrary
 *    splits — the property that makes the reference's per-chunk MAP + anti-join REDUCE
 *    (`staging.py:216-282`) equivalent to our single-pass aggregation
 *  - aggregate and window formulations agree
 *  - the survivor per key is exactly the event with that key's max order.
 */
class DedupePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Int): Seq[(Int, String, Long)] = {
    val rnd = new scala.util.Random(seed)
    val n = 1 + rnd.nextInt(60)
    (0 until n).map(i => (rnd.nextInt(10), rnd.alphanumeric.take(6).mkString, i.toLong))
  }

  private def canon(rows: Seq[(Int, String, Long)]) = rows.toSet

  test("dedupe: idempotent, chunk-invariant, formulation-equivalent, max-order survivor") {
    for (seed <- 1 to 15) {
      val events = randomEvents(seed)
      val df = events.toDF("id", "v", "kbc__batch_event_order")
      val whole = Cdc.dedupeLastWins(df, Seq("id"))
      val once = canon(whole.as[(Int, String, Long)].collect().toSeq)

      // idempotence
      val twice = canon(Cdc.dedupeLastWins(whole, Seq("id")).as[(Int, String, Long)].collect().toSeq)
      assert(twice == once, s"idempotence failed for seed=$seed")

      // chunk-boundary invariance (split at a seed-dependent point)
      val s = new scala.util.Random(seed * 31).nextInt(events.length + 1)
      val (c1, c2) = events.splitAt(s)
      val chunks = Seq(c1, c2).filter(_.nonEmpty).map(_.toDF("id", "v", "kbc__batch_event_order"))
      val viaChunks = canon(Cdc.dedupeLastWins(Cdc.unionEpochs(chunks), Seq("id"))
        .as[(Int, String, Long)].collect().toSeq)
      assert(viaChunks == once, s"chunk invariance failed for seed=$seed split=$s")

      // agg form == window form
      val viaWindow = canon(Cdc.dedupeLastWinsWindow(df, Seq("id"))
        .as[(Int, String, Long)].collect().toSeq)
      assert(viaWindow == once, s"formulation mismatch for seed=$seed")

      // salted two-phase form agrees (skew path)
      val viaSalted = canon(Cdc.dedupeLastWinsSalted(df, Seq("id"), salts = 4)
        .as[(Int, String, Long)].collect().toSeq)
      assert(viaSalted == once, s"salted mismatch for seed=$seed")

      // exactly the max-order event per key survives
      val expected = events.groupBy(_._1).view.mapValues(_.maxBy(_._3)).values.toSet
      assert(once == expected, s"wrong survivors for seed=$seed")
    }
  }

  test("minhashLshVerifiedPairs == exact jaccard pair list on random near-dup corpora") {
    import graft.ops.DedupOps
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
      "iota", "kappa", "lam", "mu", "nu", "xi", "omic", "pi", "rho", "sigma")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // base docs + mutated near-duplicates (1-2 word substitutions)
      val bases = (0 until 12).map { i =>
        (i.toLong, Seq.fill(10 + rnd.nextInt(15))(words(rnd.nextInt(words.size))).mkString(" "))
      }
      val mutated = bases.take(6).map { case (id, text) =>
        val toks = text.split(" ")
        toks(rnd.nextInt(toks.length)) = words(rnd.nextInt(words.size))
        (id + 100, toks.mkString(" "))
      }
      val docs = (bases ++ mutated).toDF("doc_id", "text")
      def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard"))).toSet
      val verified = pairSet(DedupOps.minhashLshVerifiedPairs(docs, threshold = 0.3, k = 64, bands = 32))
      val exact = pairSet(DedupOps.ngramJaccardPairs(docs, threshold = 0.3))
      assert(verified == exact, s"seed=$seed verified=$verified exact=$exact")
      assert(exact.nonEmpty, s"seed=$seed produced no near-dup pairs — weak test")
    }
  }

  test("ngramJaccardPrefix == ngramJaccardPairs at every threshold (prefix-filter completeness)") {
    import graft.ops.DedupOps
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
      "iota", "kappa", "lam", "mu", "nu", "xi", "omic", "pi", "rho", "sigma")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed + 40)
      val bases = (0 until 12).map { i =>
        (i.toLong, Seq.fill(10 + rnd.nextInt(15))(words(rnd.nextInt(words.size))).mkString(" "))
      }
      val mutated = bases.take(6).map { case (id, text) =>
        val toks = text.split(" ")
        toks(rnd.nextInt(toks.length)) = words(rnd.nextInt(words.size))
        (id + 100, toks.mkString(" "))
      }
      val docs = (bases ++ mutated).toDF("doc_id", "text")
      def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard"))).toSet
      for (t <- Seq(0.2, 0.5, 0.8)) {
        val exact = pairSet(DedupOps.ngramJaccardPairs(docs, threshold = t))
        val prefix = pairSet(DedupOps.ngramJaccardPrefix(docs, threshold = t))
        assert(prefix == exact, s"seed=$seed t=$t prefix=$prefix exact=$exact")
      }
      assert(pairSet(DedupOps.ngramJaccardPairs(docs, threshold = 0.2)).nonEmpty,
        s"seed=$seed produced no pairs — weak test")
    }
  }

  test("incremental dedup over random splits == batch dedup of the whole corpus") {
    // feeding a corpus through incrementalDedup in arbitrary batch splits must admit
    // exactly one id per distinct text, regardless of where the splits fall — the
    // property that makes continuous ingestion equivalent to a from-scratch rebuild
    import org.apache.spark.sql.functions.{col, md5}
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val texts = (0 until 30).map(_ => s"doc ${rnd.nextInt(12)}") // forced collisions
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val cut = rnd.nextInt(docs.length + 1)
      val (b1, b2) = docs.splitAt(cut)
      var index = spark.emptyDataset[String].toDF("content_md5")
      var admitted = Set.empty[String]
      for (b <- Seq(b1, b2).filter(_.nonEmpty)) {
        val adm = DedupOps.incrementalDedup(b.toDF("doc_id", "text"), index)
        admitted ++= adm.collect().map(_.getAs[String]("content_md5"))
        index = index.union(adm.select("content_md5"))
      }
      val whole = docs.toDF("doc_id", "text")
        .select(md5(col("text")).as("m")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(admitted == whole, s"seed=$seed cut=$cut")
    }
  }

  test("lineDedup: rebuild digests equal a direct per-doc reconstruction, any maxDocs") {
    import org.apache.spark.sql.functions.{col, md5, concat_ws}
    val words = Seq("alpha", "beta", "gamma", "delta")
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 10).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(5))(words(rnd.nextInt(words.size))).mkString("\n"))
      }
      val maxDocs = 1 + rnd.nextInt(4)
      // reference model: count distinct docs per line, filter, rejoin — computed in memory
      val lineDocs = docs.flatMap { case (id, t) => t.split("\n").map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val frequent = lineDocs.filter(_._2 > maxDocs).keySet
      val expect = docs.map { case (id, t) =>
        id -> t.split("\n").filterNot(frequent).mkString("\n")
      }.toMap
      val out = DedupOps.lineDedup(docs.toDF("doc_id", "text"), maxDocs = maxDocs)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_md5")).toMap
      for ((id, cleaned) <- expect) {
        val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
          .digest(cleaned.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(out(id) == expectedMd5, s"seed=$seed maxDocs=$maxDocs doc=$id")
      }
    }
  }

  test("approx sketches stay within error bounds of the exact answers (q_approx_sketch)") {
    // the query is now a SELF-VERIFYING verdict row (error bounds computed in-plan and
    // pinned by the DuckDB oracle); this spec asserts the verdict holds at sf0.001 too
    val row = SparkEntry.queries("q_approx_sketch")(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getAs[Long]("n_groups") == 3L)
    assert(row.getAs[Boolean]("hll_ok"), "HLL estimate off by > 5% of exact distinct")
    assert(row.getAs[Boolean]("pctl_ok"), "approx median off by > 2% of exact median")
  }
}
