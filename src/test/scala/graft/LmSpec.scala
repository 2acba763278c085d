package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Bigram-LM scoring and CCNet tercile bucketing vs naive in-memory references. */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    s.toLowerCase.split(TextOps.TokenRegex).filter(_.nonEmpty).toSeq

  test("bigramLogprob == naive interpolated-LM reference (same quantization discipline)") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the cat"),
      (3L, "dogs chase the cat"),
      (4L, "mat"), // single token: no bigrams, must be absent from the output
      (5L, "on on on the the"))
    val uni = docs.flatMap { case (_, t) => tok(t) }
    val cu = uni.groupBy(identity).map { case (w, l) => w -> l.size.toLong }
    val total = uni.size.toDouble
    val allBigs = docs.flatMap { case (_, t) =>
      val w = tok(t); if (w.size >= 2) w.sliding(2).map(p => (p(0), p(1))).toSeq else Nil }
    val cb = allBigs.groupBy(identity).map { case (b, l) => b -> l.size.toLong }
    val expected = docs.flatMap { case (id, t) =>
      val w = tok(t)
      if (w.size < 2) None
      else {
        val bigs = w.sliding(2).map(p => (p(0), p(1))).toSeq
        // same operand order and same log form (ln ratio) as the operator
        val terms = bigs.map { case (w1, w2) =>
          val p = (0.5 * (cb((w1, w2)).toDouble / cu(w1))) + (0.5 * (cu(w2).toDouble / total))
          BigDecimal(math.log(p) / math.log(10.0))
            .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        }
        val avg = BigDecimal(terms.sum.toDouble / bigs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(id -> ((bigs.size.toLong, avg)))
      }
    }.toMap
    val out = TextOps.bigramLogprob(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == expected)
  }

  test("ccnetBuckets: discrete tercile rule — sizes and score ordering per language") {
    // distinct per-doc scores by construction: doc i mixes (10 - i) common filler
    // tokens with i singletons, so fluency decreases monotonically with i
    def mk(lang: String, i: Int, base: Int): (Long, String, String) = {
      val common = Seq.fill(10 - i)("the")
      val rare = (1 to i).map(j => s"w${base + i}x$j")
      ((base + i).toLong, (common ++ rare).mkString(" "), lang)
    }
    val docs = ((1 to 9).map(i => mk("en", i, 100)) ++ (1 to 5).map(i => mk("de", i, 200)))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.ccnetBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    for ((lang, n) <- Seq("en" -> 9, "de" -> 5)) {
      val rows = out.filter(_._2 == lang)
      assert(rows.length == n)
      assert(rows.map(_._3).distinct.length == n, s"$lang scores not distinct — fixture broken")
      val byBucket = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      val k1 = math.ceil(n / 3.0).toInt
      val k2 = math.ceil(2 * n / 3.0).toInt
      assert(byBucket("tail").length == k1)
      assert(byBucket("middle").length == k2 - k1)
      assert(byBucket("head").length == n - k2)
      assert(byBucket("tail").max <= byBucket("middle").min)
      assert(byBucket("middle").max <= byBucket("head").min)
    }
  }
}
