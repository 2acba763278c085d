package graft

/** SQL surface: the native expressions usable from `spark.sql` after registration. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions: cosine, shingle/minhash pipeline, latest_struct aggregate") {
    GraftExtensions.register(spark)

    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)), (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val cos = spark.sql("SELECT graft_cosine(a, b) AS c, graft_dot(a, b) AS d, graft_l2norm(a) AS n FROM vecs")
      .collect()
    assert(cos(0).getDouble(0) == 1.0 && cos(1).getDouble(0) == 0.0)
    assert(cos(0).getDouble(1) == 1.0 && cos(0).getDouble(2) == 1.0)

    Seq("a b c d e", "a b c d e").toDF("text").createOrReplaceTempView("docs")
    val sig = spark.sql(
      """SELECT graft_minhash(graft_shingle_hashes(split(text, ' '), 2), 16) AS sig,
        |       graft_simhash(split(text, ' ')) AS sh FROM docs""".stripMargin).collect()
    assert(sig(0).getSeq[Long](0).length == 16)
    assert(sig(0).getSeq[Long](0) == sig(1).getSeq[Long](0))
    assert(sig(0).getLong(1) == sig(1).getLong(1))

    // NFC canonicalization: decomposed e + combining acute (5 chars) composes to 4
    val nfc = spark.sql("SELECT length(graft_nfc('cafe\\u0301')) AS n, length('cafe\\u0301') AS raw")
      .collect()
    assert(nfc(0).getInt(1) == 5 && nfc(0).getInt(0) == 4)

    // winnowing kernel + entropy signals from SQL (the round-6 scale forms)
    val win = spark.sql(
      """SELECT size(graft_winnowing(split('a b c d e f g h i j', ' '), 3, 4)) AS nf,
        |       graft_token_entropy(split('a a b b', ' ')).n_tokens AS nt FROM (SELECT 1)""".stripMargin)
      .collect()
    assert(win(0).getInt(0) > 0, "winnowing must emit fingerprints")
    assert(win(0).getLong(1) == 4L, "entropy signals must count tokens")

    Seq((1, "old", 1L), (1, "new", 2L), (2, "only", 5L))
      .toDF("id", "v", "ord").createOrReplaceTempView("events")
    val latest = spark.sql(
      """SELECT id, graft_latest_struct(ord, struct(v)).v AS v
        |FROM events GROUP BY id ORDER BY id""".stripMargin).collect()
    assert(latest.map(_.getString(1)).toSeq == Seq("new", "only"))

    Seq((1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.95), (1L, 13L, 0.1))
      .toDF("g", "nid", "s").createOrReplaceTempView("cands")
    val topk = spark.sql(
      """SELECT g, t.nid FROM (
        |  SELECT g, explode(graft_top_k(s, nid, struct(nid, s), 2)) AS t FROM cands GROUP BY g)""".stripMargin)
      .collect().map(_.getLong(1))
    assert(topk.toSeq == Seq(12L, 10L)) // best-first

    // one-pass text-signals struct: "the the fox the fox" → 5 tokens, 2 distinct,
    // 3 stopwords, top bigram ("the fox") ×2
    val sigs = spark.sql(
      """SELECT graft_text_signals(split('the the fox the fox', ' ')) AS s""").collect()(0)
      .getStruct(0)
    assert((sigs.getLong(0), sigs.getLong(1), sigs.getLong(2), sigs.getLong(3)) == ((5L, 2L, 3L, 2L)))

    val dr = spark.sql(
      "SELECT graft_deflate_ratio(repeat('spam ', 500)) AS lo, graft_deflate_ratio('') AS e")
      .collect()(0)
    assert(dr.getDouble(0) < 0.1 && dr.getDouble(1) == 1.0)

    // round-7: Jaro-Winkler from SQL (DuckDB-parity semantics)
    val jw = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS a, graft_jaro_winkler('', '') AS e")
      .collect()(0)
    assert(math.abs(jw.getDouble(0) - 0.9611111111111111) < 1e-15 && jw.getDouble(1) == 0.0)
  }

  test("aggregate builders widen numeric args; mistyped payload fails at analysis") {
    GraftExtensions.register(spark)
    // INT order / FLOAT score through the SQL surface: widened by the builder casts
    Seq((1, "old", 1), (1, "new", 2)).toDF("id", "v", "ord").createOrReplaceTempView("ev_int")
    val latest = spark.sql(
      "SELECT graft_latest_struct(ord, struct(v)).v AS v FROM ev_int GROUP BY id").collect()
    assert(latest.head.getString(0) == "new")
    Seq((1L, 10, 0.5f), (1L, 11, 0.9f)).toDF("g", "nid", "s").createOrReplaceTempView("cands_f")
    val topk = spark.sql(
      """SELECT t.nid FROM (
        |  SELECT explode(graft_top_k(s, nid, struct(nid), 1)) AS t FROM cands_f GROUP BY g)""".stripMargin)
      .collect()
    assert(topk.head.getInt(0) == 11)
    // non-struct payload: analysis-time error, not an executor ClassCastException
    val err = intercept[Exception] {
      spark.sql("SELECT graft_latest_struct(ord, v) FROM ev_int GROUP BY id").collect()
    }
    assert(err.getMessage.toLowerCase.contains("struct"))
  }

  test("graft_hilbert_index / graft_fd_sketch: SQL paths match the column/static APIs") {
    GraftExtensions.register(spark)
    val h = spark.sql(
      "SELECT graft_hilbert_index(13, 200, 8) AS h, graft_hilbert_index(0, 0, 8) AS z")
      .collect()(0)
    assert(h.getLong(0) == graft.functions.HilbertCurve.xy2d(8, 13L, 200L))
    assert(h.getLong(1) == 0L)
    // FD via SQL over a rank-1 stream: one non-zero sketch row parallel to the data
    val rows = spark.sql(
      """SELECT graft_fd_sketch(v, 4) AS b FROM (
        |  SELECT transform(sequence(1, 4), j -> CAST(j * (1 + id % 3) AS DOUBLE)) AS v
        |  FROM range(0, 50))""".stripMargin)
      .collect()(0).getSeq[scala.collection.Seq[Double]](0)
    val top = rows.maxBy(r => r.map(x => x * x).sum)
    val base = Seq(1.0, 2.0, 3.0, 4.0)
    val cos = top.zip(base).map { case (a, b) => a * b }.sum /
      (math.sqrt(top.map(x => x * x).sum) * math.sqrt(base.map(x => x * x).sum))
    assert(math.abs(cos) > 0.9999, s"SQL FD sketch lost the rank-1 direction: $cos")
  }

  test("graft_gear_chunks: SQL path covers the payload and matches the column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT aggregate(transform(graft_gear_chunks(encode(repeat('abc xyz ', 64), 'UTF-8'),
        |  16, 4, 128), c -> c.len), 0, (a, x) -> a + x) AS covered""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 512, "chunks must cover every byte via SQL too")
    val api = Seq(Tuple1("abc xyz " * 64)).toDF("t")
      .select(graft.functions.TextFunctions.gearChunks(
        org.apache.spark.sql.functions.encode(org.apache.spark.sql.functions.col("t"),
          "UTF-8"), 16, 4, 128).as("c"))
      .selectExpr("aggregate(transform(c, x -> x.len), 0, (a, x) -> a + x) AS covered")
      .collect()(0)
    assert(api.getInt(0) == 512)
  }
}
