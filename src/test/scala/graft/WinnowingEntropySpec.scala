package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ops.TextOps

/**
 * Properties for the two round-6 zero-shuffle kernels: the one-pass winnowing
 * fingerprint expression (≡ the HOF window-min form modulo hash function) and the
 * per-row token-entropy expression (≡ the exchange-based grouped form bit-for-bit).
 */
class WinnowingEntropySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("winnowing kernel ≡ HOF window-min form over the same xxh64 shingle hashes") {
    // the md5-HOF gated query, with md5 swapped for the kernel's own shingle hash: if
    // the kernel's selection positions match the HOF selection, the outputs are equal
    // arrays (same values, same first-occurrence order) — "≡ modulo hash function"
    val rows = docs.select(col("doc_id"),
        TextFunctions.winnowing(TextOps.tokensCol(col("text")), 3, 4).as("kernel"),
        TextFunctions.shingleHashes(TextOps.tokensCol(col("text")), 3).as("hs"))
      .select(col("doc_id"), col("kernel"),
        when(size(col("hs")) === 0, array().cast("array<bigint>"))
          .otherwise(array_distinct(
            when(size(col("hs")) >= 4,
              expr("transform(sequence(1, size(hs) - 3), i -> array_min(slice(hs, i, 4)))"))
              .otherwise(array(array_min(col("hs")))))).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getSeq[Long](1)
      val h = r.getSeq[Long](2)
      assert(k == h, s"doc ${r.get(0)}: kernel $k != hof $h")
    }
  }

  test("winnowing kernel degenerate shapes match the gated query's CASE arms") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b"),                       // < n tokens -> no shingles -> empty
      (2L, "a b c"),                     // 1 shingle (< w) -> single global min
      (3L, "a b c d e"),                 // 3 shingles (< w) -> single global min
      (4L, "a b c d e f g h i j k l")    // >= w windows
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      TextFunctions.winnowing(TextFunctions.tokens(col("text")), 3, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).size == 1)
    assert(out(3L).size == 1)
    val hs = d.filter($"doc_id" === 4L)
      .select(TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 3))
      .collect()(0).getSeq[Long](0)
    assert(out(3L).head == d.filter($"doc_id" === 3L)
      .select(TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 3))
      .collect()(0).getSeq[Long](0).min)
    // every selected fingerprint is a real window min, and every window is covered
    val wins = hs.sliding(4).map(_.min).toSeq
    assert(out(4L) == wins.distinct)
  }

  test("winnowing guarantee: a shared run of >= w+n-1 tokens yields a shared fingerprint") {
    import spark.implicits._
    // w+n-1 = 6: plant a 7-token shared run inside otherwise-disjoint documents
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val d = Seq(
      (1L, s"one two three $shared four five six seven eight nine"),
      (2L, s"red orange yellow $shared green blue indigo violet purple")
    ).toDF("doc_id", "text")
    val fps = d.select(col("doc_id"),
      explode(TextFunctions.winnowing(TextFunctions.tokens(col("text")), 3, 4)).as("fp"))
    val a = fps.filter($"doc_id" === 1L).select("fp").collect().map(_.getLong(0)).toSet
    val b = fps.filter($"doc_id" === 2L).select("fp").collect().map(_.getLong(0)).toSet
    assert(a.intersect(b).nonEmpty, "locality guarantee violated: no shared fingerprint")
  }

  test("fingerprintPairs finds the planted near-dup pair and scores overlap in (0,1]") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again until dawn " +
      "breaks over the quiet hill where nothing ever moves"
    val d = Seq(
      (1L, base),
      (2L, base + " except one extra clause"), // near-dup of 1
      (3L, "completely different content about spark catalyst expression codegen and " +
        "monotone deque sliding window minima selection")
    ).toDF("doc_id", "text")
    val fps = d.select(col("doc_id"),
      explode(TextFunctions.winnowing(TextFunctions.tokens(col("text")), 3, 4)).as("fp"))
    val pairs = graft.ops.DedupOps.fingerprintPairs(fps, minShared = 2, dfCap = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(pairs.exists { case (a, b, _, _) => a == 1L && b == 2L }, s"missing planted pair: ${pairs.toSeq}")
    pairs.foreach { case (_, _, n, ov) =>
      assert(n >= 2 && ov > 0.0 && ov <= 1.0)
    }
    assert(!pairs.exists { case (a, b, _, _) => b == 3L || a == 3L })
  }

  test("tokenEntropy kernel ≡ grouped-exchange form bit-for-bit on the corpus") {
    val kernel = TextOps.tokenEntropy(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val grouped = TextOps.tokenEntropyGrouped(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(kernel.length == grouped.length && kernel.nonEmpty)
    kernel.zip(grouped).foreach { case (k, g) =>
      assert(k == g, s"entropy mismatch: kernel $k vs grouped $g") // exact, incl. the double
    }
  }

  test("tokenEntropy: empty and degenerate docs") {
    import spark.implicits._
    val d = Seq((1L, ""), (2L, "aaa aaa aaa aaa"), (3L, "a b c d")).toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!out.contains(1L)) // token-less doc drops out, like the grouped form
    assert(out(2L)._2 == 0.0) // one looped token -> zero entropy
    assert(math.abs(out(3L)._2 - math.log10(4.0)) < 1e-4) // all distinct -> log10(n)
  }
}
