package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.model.ConnectTypes
import graft.model.ConnectTypes.SchemaElement
import org.apache.spark.sql.types._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f)),
    (4L, Array(1.0f, 1.0f, 0.0f))).toDF("id", "v")

  test("dot / cosine / l2Norm compute expected values through codegen") {
    val a = vecs.as("a"); val b = vecs.as("b")
    val out = a.crossJoin(b)
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        VectorFunctions.dot(col("a.v"), col("b.v")).as("dot"),
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(out((1L, 2L))._1 == 0.0 && out((1L, 2L))._2 == 0.0)
    assert(out((1L, 3L))._1 == 2.0 && math.abs(out((1L, 3L))._2 - 1.0) < 1e-12)
    assert(math.abs(out((1L, 4L))._2 - 1.0 / math.sqrt(2)) < 1e-12)
    val norms = vecs.select(VectorFunctions.l2Norm(col("v"))).collect().map(_.getDouble(0))
    assert(math.abs(norms(3) - math.sqrt(2)) < 1e-12)
  }

  test("hammingSim: exact popcount similarity on equal widths, throws on width mismatch") {
    // 256 bits = 4 long words; flip 3 bits in one word -> sim = 256 - 3
    val a = Array(0L, -1L, 0x0F0FL, 42L)
    val b = Array(0L, -1L, 0x0F0FL ^ 0x7L, 42L)
    val same = Seq((a.toSeq, b.toSeq)).toDF("x", "y")
      .select(VectorFunctions.hammingSim(col("x"), col("y"), 256).as("s"))
      .head().getDouble(0)
    assert(same == 253.0)
    // ADVICE r13 #3: a mixed-width pair must THROW in the kernel, not silently
    // score min-length words (which inflates similarity for any direct caller
    // the entry-point requireSigWidth guards don't cover)
    val mixed = Seq((a.toSeq, Seq(0L, -1L))).toDF("x", "y")
      .select(VectorFunctions.hammingSim(col("x"), col("y"), 256).as("s"))
    val ex = intercept[Exception] { mixed.collect() }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
        .mkString(" | "))
    assert(rootMsg(ex).contains("signature widths differ"), rootMsg(ex))
  }

  test("cosine of zero vector is 0.0, null in -> null out") {
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(z.select(VectorFunctions.cosine(col("a"), col("b"))).collect().head.getDouble(0) == 0.0)
    val n = Seq((None: Option[Array[Float]], Array(1.0f))).toDF("a", "b")
    assert(n.select(VectorFunctions.cosine(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("hyperplaneLsh: deterministic, identical vectors share buckets, scaling-invariant") {
    val planes = VectorFunctions.makePlanes(8, 3)
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(2.0f, 4.0f, 6.0f)),   // same direction => same sign pattern
      (4L, Array(-1.0f, -2.0f, -3.0f)) // opposite => complement
    ).toDF("id", "v").select(col("id"), VectorFunctions.hyperplaneLsh(col("v"), planes).as("b"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L) && m(1L) == m(3L) && m(1L) != m(4L))
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String) = Seq(s).toDF("text").select(TextFunctions.tokens(col("text")).as("t"))

  test("tokens: lowercases, splits on non-alphanumeric, drops empties") {
    val out = toks("Hello,  World! 42x").collect().head.getSeq[String](0)
    assert(out == Seq("hello", "world", "42x"))
  }

  test("byteEntropySignals: known histograms, quantization matches the grouped plan") {
    def sig(s: String) = Seq(s).toDF("t")
      .select(TextFunctions.byteEntropySignals(col("t")).as("b"))
      .select(col("b.n_bytes"), col("b.n_distinct_bytes"), col("b.slgc").cast("double"))
      .collect().head
    val a = sig("aaaa") // 4 identical bytes: slgc = 4*log10(4), entropy 0 bits
    assert(a.getLong(0) == 4L && a.getLong(1) == 1L)
    assert(math.abs(a.getDouble(2) - 2.40823997) < 1e-8)
    val b = sig("abcd") // uniform over 4 bytes: slgc = 0 (each count 1)
    assert(b.getLong(0) == 4L && b.getLong(1) == 4L && b.getDouble(2) == 0.0)
    val u = sig("\u00e9") // e-acute = 2 UTF-8 bytes, both distinct
    assert(u.getLong(0) == 2L && u.getLong(1) == 2L)
  }

  test("jaroWinkler: canonical values, DuckDB-parity edge semantics, symmetry") {
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(TextFunctions.jaroWinkler(col("a"), col("b"))).collect().head.getDouble(0)
    // canonical published examples (match DuckDB 1.0 bit-for-bit)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(jw("same", "same") == 1.0)
    // DuckDB convention: either side empty => 0.0 (even both-empty)
    assert(jw("", "") == 0.0 && jw("", "a") == 0.0 && jw("a", "") == 0.0)
    // no match at all
    assert(jw("abc", "xyz") == 0.0)
    // prefix bonus only above the 0.7 jaro boundary; symmetry
    for ((a, b) <- Seq(("small ring", "small rng"), ("CRATE", "TRACE"), ("ab", "ba")))
      assert(jw(a, b) == jw(b, a))
    // null in -> null out
    val n = Seq((None: Option[String], "x")).toDF("a", "b")
    assert(n.select(TextFunctions.jaroWinkler(col("a"), col("b"))).collect().head.isNullAt(0))
    // non-ASCII: DuckDB operates on UTF-8 BYTES, not codepoints (ADVICE r7) — values
    // below probed against DuckDB 1.0 jaro_winkler_similarity this round
    assert(jw("éb", "eb") == 0.0) // 'éb' vs 'eb': no byte aligns within the window
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-15)
    assert(math.abs(jw("naïve", "naive") - 0.8577777777777779) < 1e-14)
    assert(math.abs(jw("日本語", "日本誤") - 0.9555555555555556) < 1e-14)
    assert(math.abs(jw("éé", "ée") - 0.7777777777777778) < 1e-15)
  }

  test("shingleHashes: m tokens -> m-n+1 hashes; equal docs hash equal; short docs empty") {
    val df = Seq("a b c d e", "a b c d e", "a b").toDF("text")
      .select(TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length == 3 && rows(0) == rows(1) && rows(2).isEmpty)
    assert(rows(0).distinct.length == 3) // distinct trigrams hash distinctly
  }

  test("minhashLong: identical shingle sets -> identical signatures; disjoint sets differ") {
    val df = Seq("x y z w q r", "x y z w q r", "aa bb cc dd ee ff").toDF("text")
      .select(TextFunctions.minhashLong(
        TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 2), 32).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0).length == 32 && sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("minhash jaccard estimate tracks true jaccard") {
    // two docs sharing half their shingles -> estimate should land near 0.5
    val a = (1 to 40).map(i => s"w$i").mkString(" ")          // shingles w1..w39 (2-grams)
    val b = ((21 to 60)).map(i => s"w$i").mkString(" ")       // overlap w21..w39
    val df = Seq(a, b).toDF("text")
      .select(TextFunctions.minhashLong(
        TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 2), 128).as("sig"))
    val Array(sa, sb) = df.collect().map(_.getSeq[Long](0))
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 128
    val trueJ = 19.0 / (39 + 39 - 19)
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
  }

  test("bandHashesFast: equal signatures collide in every band; band count respected") {
    val df = Seq("p q r s t u", "p q r s t u").toDF("text")
      .select(TextFunctions.bandHashesFast(TextFunctions.minhashLong(
        TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 2), 64), 16).as("b"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length == 16 && rows(0) == rows(1))
  }

  test("simhash: identical token sets -> hamming 0; different -> positive") {
    val df = Seq(("a", "foo bar baz qux"), ("b", "foo bar baz qux"), ("c", "alpha beta gamma delta"))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.simhash(TextFunctions.tokens(col("text"))).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(java.lang.Long.bitCount(m("a") ^ m("c")) > 0)
  }

  test("minKHashesLong: sorted, distinct, capped at k") {
    val df = Seq("a b c d e f g h i j k l").toDF("text")
      .select(TextFunctions.minKHashesLong(
        TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 2), 5).as("fp"))
    val fp = df.collect().head.getSeq[Long](0)
    assert(fp.length == 5 && fp == fp.sorted && fp.distinct.length == 5)
  }

  test("bandHashesFast rejects degenerate banding loudly (bands > k, k % bands != 0)") {
    def run(k: Int, bands: Int) =
      Seq("p q r s t u").toDF("text")
        .select(TextFunctions.bandHashesFast(TextFunctions.minhashLong(
          TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 2), k), bands))
        .collect()
    val e1 = intercept[Exception] { run(8, 16) }
    assert(e1.getMessage.contains("exceeds signature length") ||
      e1.getCause != null && e1.getCause.getMessage.contains("exceeds signature length"))
    val e2 = intercept[Exception] { run(10, 3) }
    assert(e2.getMessage.contains("not divisible") ||
      e2.getCause != null && e2.getCause.getMessage.contains("not divisible"))
  }
}

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.{QuantileSketchBuf, SketchFunctions}

  test("buffer: exact below capacity — every rank recoverable from the summary") {
    val buf = new QuantileSketchBuf(128)
    (1 to 100).reverse.foreach(v => buf.insert(v.toDouble, 0))
    val s = buf.summary()
    assert(s.length == 100 && s.forall(_._2 == 1L))
    assert(s.map(_._1).toSeq == (1 to 100).map(_.toDouble))
  }

  test("buffer: weight conservation and bounded size under compaction") {
    val buf = new QuantileSketchBuf(16)
    (1 to 10000).foreach(v => buf.insert(v.toDouble, 0))
    val s = buf.summary()
    assert(s.map(_._2).sum == 10000L, "total weight must equal n")
    assert(s.length <= 16 * 12, s"summary must stay O(k log n/k): ${s.length}")
  }

  test("buffer: merge bound — rank error stays under the MP envelope any merge order") {
    val rng = new scala.util.Random(3)
    val vals = Array.fill(20000)(rng.nextDouble() * 1000)
    (0 until 3).foreach { trial =>
      val parts = Array.fill(16)(new QuantileSketchBuf(128))
      vals.zipWithIndex.foreach { case (v, i) => parts(i % 16).insert(v, 0) }
      val order = new scala.util.Random(trial).shuffle((1 until 16).toList)
      val g = parts(0)
      order.foreach(i => g.mergeIn(parts(i)))
      val sorted = vals.sorted
      val s = g.summary()
      val total = s.map(_._2).sum.toDouble
      for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
        var c = 0L
        val est = s.find { case (_, w) => c += w; c >= q * total }.get._1
        val rank = sorted.count(_ <= est)
        assert(math.abs(rank - q * vals.length) <= 0.05 * vals.length,
          s"trial $trial q=$q rank=$rank")
      }
    }
  }

  test("aggregate: build per group, union stored summaries, HOF quantile estimate") {
    val df = (1 to 4000).map(i => (i % 4, i.toDouble)).toDF("g", "value")
    val daily = df.groupBy("g").agg(SketchFunctions.quantileSketchAgg(col("value")).as("sk"))
    assert(daily.count() == 4)
    val global = daily.select(explode(col("sk")).as("e"))
      .agg(SketchFunctions.quantileSketchUnionAgg(col("e.v"), col("e.w")).as("sk"))
    val est = global.select(
      SketchFunctions.sketchQuantile(col("sk"), 0.5).as("med"),
      SketchFunctions.sketchQuantile(col("sk"), 0.99).as("p99")).head()
    assert(math.abs(est.getDouble(0) - 2000.0) <= 200.0, s"median ${est.getDouble(0)}")
    assert(math.abs(est.getDouble(1) - 3960.0) <= 200.0, s"p99 ${est.getDouble(1)}")
  }
}

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ops.LayoutOps

  test("zValue interleaves bits: a at odd positions, b at even") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (255L, 255L))
      .toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 1L, 10L, 5L, 65535L))
  }

  test("zorderRepartition: tighter per-partition bounding boxes than the input layout") {
    val rng = new scala.util.Random(7)
    val df = (1 to 4000).map(_ => (rng.nextInt(256).toLong, rng.nextInt(256).toLong))
      .toDF("a", "b").repartition(8)
    def avgArea(d: org.apache.spark.sql.DataFrame): Double = {
      val b = LayoutOps.partitionBounds(d, "a", "b")
        .select(((col("max_a") - col("min_a")) * (col("max_b") - col("min_b")))
          .cast("double").as("area"))
      b.agg(avg(col("area"))).head().getDouble(0)
    }
    val before = avgArea(df)
    val after = avgArea(LayoutOps.zorderRepartition(df, "a", "b", 8))
    // 8 z-range partitions of a 256x256 space: boxes must shrink by a large factor
    assert(after < before / 3, s"before=$before after=$after")
  }

  test("hilbert xy2d: bijection over the full grid and strict adjacency of consecutive d") {
    // the DEFINING Hilbert property (and the one Morton order lacks): walking the
    // curve in d order moves exactly one grid step each time
    import graft.functions.HilbertCurve
    val bits = 4; val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (HilbertCurve.xy2d(bits, x, y), (x, y))
    assert(cells.map(_._1).sorted == (0L until (n.toLong * n)), "must be a bijection")
    val walk = cells.sortBy(_._1).map(_._2)
    walk.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d-consecutive cells ($x1,$y1)->($x2,$y2)")
    }
    // order-1 base case: the U shape (0,0)->(0,1)->(1,1)->(1,0)
    assert(Seq((0, 0), (0, 1), (1, 1), (1, 0))
      .map { case (x, y) => HilbertCurve.xy2d(1, x, y) } == Seq(0L, 1L, 2L, 3L))
  }

  test("hilbertIndex column matches the static kernel; hilbertRepartition tightens boxes") {
    import graft.functions.{HilbertCurve, LayoutFunctions}
    val rng = new scala.util.Random(11)
    val pts = (1 to 2000).map(_ => (rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val df = pts.toDF("a", "b").repartition(8)
    val viaCol = df.select(col("a"), col("b"),
      LayoutFunctions.hilbertIndex(col("a"), col("b")).as("h")).collect()
    viaCol.foreach { r =>
      assert(r.getLong(2) == HilbertCurve.xy2d(8, r.getLong(0), r.getLong(1)))
    }
    def avgArea(d: org.apache.spark.sql.DataFrame): Double =
      LayoutOps.partitionBounds(d, "a", "b")
        .select(((col("max_a") - col("min_a")) * (col("max_b") - col("min_b")))
          .cast("double").as("area"))
        .agg(avg(col("area"))).head().getDouble(0)
    val before = avgArea(df)
    val after = avgArea(LayoutOps.hilbertRepartition(df, "a", "b", 8))
    assert(after < before / 3, s"before=$before after=$after")
  }
}

class ConnectTypesSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("connect type -> spark type mapping (SURVEY §1.3a)") {
    assert(SchemaElement("int32").sparkType == IntegerType)
    assert(SchemaElement("int32", name = Some("io.debezium.time.Date")).sparkType == DateType)
    assert(SchemaElement("int64").sparkType == LongType)
    assert(SchemaElement("int64", name = Some("io.debezium.time.Timestamp")).sparkType == TimestampType)
    assert(SchemaElement("string", name = Some("io.debezium.time.ZonedTimestamp")).sparkType == TimestampType)
    assert(SchemaElement("string", name = Some("io.debezium.data.Uuid")).sparkType == StringType)
    assert(SchemaElement("bytes").sparkType == StringType)
    assert(SchemaElement("array").sparkType == StringType)
    assert(SchemaElement("boolean").sparkType == BooleanType)
    assert(SchemaElement("float").sparkType == FloatType)
    assert(SchemaElement("double").sparkType == DoubleType)
  }

  test("base types for manifests (SURVEY §1.3b)") {
    assert(ConnectTypes.baseType(LongType) == "INTEGER")
    assert(ConnectTypes.baseType(DoubleType) == "FLOAT")
    assert(ConnectTypes.baseType(BooleanType) == "BOOLEAN")
    assert(ConnectTypes.baseType(DateType) == "DATE")
    assert(ConnectTypes.baseType(TimestampType) == "TIMESTAMP")
    assert(ConnectTypes.baseType(StringType) == "STRING")
    assert(ConnectTypes.baseType(DecimalType(12, 5)) == "NUMERIC")
  }

  test("toStructType preserves field order and nullability") {
    val st = ConnectTypes.toStructType(Seq(
      SchemaElement("int32", optional = false, field = "id"),
      SchemaElement("string", optional = true, field = "name")))
    assert(st.fieldNames.toSeq == Seq("id", "name"))
    assert(!st("id").nullable && st("name").nullable)
  }
}
