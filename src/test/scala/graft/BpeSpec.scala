package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeOps

/**
 * Distributed BPE training/encoding vs a naive single-machine reference implementation
 * (the subword-nmt algorithm, re-derived from the published description — no library).
 */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Naive reference: word-count map, exhaustive pair counts, argmax with the same
  // (count desc, pair asc) tie-break, sequential merge application.
  private def naiveBpe(wordCounts: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 0 until nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.indices.dropRight(1).foreach { i =>
          counts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((l, r, n))
        words = words.map { case (syms, c) =>
          BpeOps.applyMerge(syms.toArray, l, r).toVector -> c
        }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat and the cat ate"),
    (2L, "the rat sat on the cat and the mat was flat"),
    (3L, "splat went the rat on that flat mat"),
    (4L, "cats rats mats flats that the splat"),
    (5L, "the the the cat cat rat")).toDF("doc_id", "text")

  test("bpeTrain matches the naive reference merge-for-merge, counts included") {
    val wc = BpeOps.wordCounts(corpus).as[(String, Long)].collect().toMap
    val expected = naiveBpe(wc, 12)
    val got = BpeOps.bpeTrain(corpus, nMerges = 12).merges
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3, m._4)).toSeq
    assert(got == expected, s"merge lists differ:\n got=$got\n exp=$expected")
  }

  test("standalone encoder reproduces the training segmentation; concat rebuilds the word") {
    val r = BpeOps.bpeTrain(corpus, nMerges = 15)
    val words = r.words.as[(String, Seq[String], Long)].collect()
    assert(words.nonEmpty)
    words.foreach { case (w, syms, _) =>
      assert(syms.mkString("") == w, s"roundtrip broken for '$w': $syms")
      val enc = BpeOps.encodeWord(w, r.model).toSeq
      assert(enc == syms, s"encoder disagrees with training for '$w': enc=$enc train=$syms")
    }
  }

  test("winning pair counts are non-increasing in rank") {
    val ns = BpeOps.bpeTrain(corpus, nMerges = 15).merges
      .orderBy("rank").select("n").as[Long].collect()
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a }, ns.mkString(","))
  }

  test("encode is a narrow broadcast-model map; non-ASCII words pass through unsplit") {
    val model = BpeOps.bpeTrain(corpus, nMerges = 10).model
    val docs = Seq((1L, "the cat"), (2L, "café the"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val enc = BpeOps.bpeEncode(docs, model)
    val byId = enc.as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r._2).toMap
    assert(byId(1L).mkString(" ").replace(" ", "") == "thecat")
    assert(byId(2L).contains("café"), s"non-ASCII word must pass through: ${byId(2L)}")
    assert(byId(3L) == Seq.empty, "null text encodes to no tokens")
    // plan shape: no exchange anywhere — the model rides the closure, rows never shuffle
    val p = enc.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"encode must be a narrow map:\n$p")
  }

  test("training survives nMerges far beyond the available pair vocabulary") {
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val r = BpeOps.bpeTrain(tiny, nMerges = 50)
    val ms = r.merges.orderBy("rank").as[(Int, String, String, Long)].collect()
    assert(ms.map(m => (m._2, m._3)).toSeq == Seq(("a", "b")), s"got ${ms.toSeq}")
    assert(r.words.as[(String, Seq[String], Long)].collect().toSeq ==
      Seq(("ab", Seq("ab"), 3L)))
  }

  test("model round-trips through the parquet artifact; loaded model encodes identically") {
    val trained = BpeOps.bpeTrain(corpus, nMerges = 12)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-model").toString + "/model"
    BpeOps.saveModel(spark, trained.model, path)
    val loaded = BpeOps.loadModel(spark, path)
    assert(loaded.merges == trained.model.merges, "merge list must survive the artifact")
    val a = BpeOps.bpeEncode(corpus, trained.model).orderBy("doc_id")
      .as[(Long, Seq[String], Long)].collect().toSeq
    val b = BpeOps.bpeEncode(corpus, loaded).orderBy("doc_id")
      .as[(Long, Seq[String], Long)].collect().toSeq
    assert(a == b)
  }

  test("checkpointed rounds (checkpointEvery=2) produce identical merges") {
    val a = BpeOps.bpeTrain(corpus, nMerges = 9, checkpointEvery = 2).merges
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val b = BpeOps.bpeTrain(corpus, nMerges = 9, checkpointEvery = 16).merges
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(a == b)
  }

  test("encode closure captures the broadcast handle, not the model (task size bounded)") {
    // a production-shaped vocabulary: 50k merges, ~1.5 MB java-serialized
    val bigModel = BpeOps.BpeModel(
      (0 until 50000).map(i => (s"l$i", s"r$i")))
    def javaSize(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close()
      bos.size()
    }
    val modelSize = javaSize(bigModel)
    assert(modelSize > 500000, s"test premise: model should be large, was $modelSize")
    val bc = spark.sparkContext.broadcast(bigModel)
    try {
      // what every task serializes is the closure — before the r7 broadcast fix this
      // was modelSize+; with the fix it is the TorrentBroadcast stub (sub-kilobyte)
      val closureSize = javaSize(BpeOps.encodeFn(bc))
      assert(closureSize < 20000,
        s"encode closure serialized to $closureSize bytes — it is capturing the model")
      // and the broadcast path still encodes correctly
      val out = BpeOps.bpeEncode(
        Seq((1L, "l1r1 hello")).toDF("doc_id", "text"),
        BpeOps.BpeModel(Seq(("l", "1"), ("l1", "r"), ("l1r", "1"))))
        .as[(Long, Seq[String], Long)].collect().head
      assert(out._2 == Seq("l1r1", "h", "e", "l", "l", "o") && out._3 == 6L)
    } finally bc.destroy()
  }
}
