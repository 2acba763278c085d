package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions

/**
 * Text-analysis operators for large-scale training-data pipelines: language ID, quality
 * scoring, token counting, fingerprinting. All pure column algebra over built-ins plus the
 * native expressions in [[graft.functions.TextExpressions]] — no UDFs, no driver loops; every
 * op is a narrow map over the documents table and scales embarrassingly.
 */
object TextOps {

  /** The tokenizer shared by every text op (and by the DuckDB oracles — keep regex in sync). */
  val TokenRegex = "[^\\p{L}\\p{N}]+"

  def tokensCol(text: Column): Column = TextFunctions.tokens(text)

  /** Marker stopwords per language for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "no"))

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /**
   * Language identification: argmax of marker-stopword occurrence counts, 'und' when no
   * marker hits. Deterministic tie-break: en > de > es (first listed wins).
   */
  def langId(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val scored = df.select(
      col(idCol),
      markerCount(toks, LangMarkers(0)._2).as("score_en"),
      markerCount(toks, LangMarkers(1)._2).as("score_de"),
      markerCount(toks, LangMarkers(2)._2).as("score_es"))
    scored.select(
      col(idCol),
      col("score_en"), col("score_de"), col("score_es"),
      when(col("score_en") >= col("score_de") && col("score_en") >= col("score_es") && col("score_en") > 0, "en")
        .when(col("score_de") >= col("score_es") && col("score_de") > 0, "de")
        .when(col("score_es") > 0, "es")
        .otherwise("und").as("lang_pred"))
  }

  /** Token statistics: whitespace-ish token count, char count, BPE-ish token estimate
    * (the chars/4 heuristic commonly used for budget accounting). */
  def tokenStats(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      keep: Seq[String] = Nil): DataFrame =
    df.select(
      Seq(col(idCol)) ++ keep.map(col) ++ Seq(
        size(tokensCol(col(textCol))).cast("long").as("n_tokens"),
        length(col(textCol)).cast("long").as("n_chars"),
        ceil(length(col(textCol)) / 4.0).cast("long").as("n_bpe_est")): _*)

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for", "with", "as", "at")

  /**
   * Quality scoring: length, mean token length, whitespace ratio, stopword ratio and a
   * composite [0,1] score. Mirrors the usual pre-training quality filters (C4/Gopher-style
   * length + symbol + stopword heuristics) as pure column algebra.
   */
  // Derived-signal column algebra over the `__sig` struct — ONE definition shared by
  // qualityScore / repetitionScore / docSignals so composed and standalone forms can
  // never drift apart (the capstones' oracle agreement depends on bit-identical math).
  private def sigNTok: Column = col("__sig.n_tokens").cast("double")
  private def qualityScoreCol: Column = {
    val nStop = col("__sig.n_stop").cast("double")
    round(
      when(sigNTok >= 5 && sigNTok <= 100000, lit(0.5)).otherwise(lit(0.0)) +
        when(sigNTok > 0, (nStop / sigNTok) * 0.5).otherwise(lit(0.0)), 4)
  }
  private def topBigramFracCol: Column =
    when(col("__sig.n_tokens") > 1,
      round(col("__sig.top_bigram_n") / (col("__sig.n_tokens") - 1).cast("double"), 4))
      .otherwise(0.0)
  private def distinctRatioCol: Column =
    when(col("__sig.n_tokens") > 0,
      round(col("__sig.n_distinct") / col("__sig.n_tokens").cast("double"), 4))
      .otherwise(0.0)

  def qualityScore(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      keep: Seq[String] = Nil): DataFrame = {
    // one-pass native signals in a SEPARATE projection: CollapseProject keeps expensive
    // expressions single-evaluation when referenced more than once, so the tokenizer +
    // signal pass runs once per row (the inline form re-ran it per derived column)
    val base = df.select(
      Seq(col(idCol)) ++ keep.map(col) ++ Seq(
        explode(array(TextFunctions.textSignals(tokensCol(col(textCol)), Stopwords))).as("__sig"),
        length(col(textCol)).cast("double").as("__nchar"),
        (length(col(textCol)) - length(regexp_replace(col(textCol), " ", "")))
          .cast("double").as("__nspace")): _*)
    val nStop = col("__sig.n_stop").cast("double")
    base.select(
      Seq(col(idCol)) ++ keep.map(col) ++ Seq(
        col("__sig.n_tokens").as("n_tokens"),
        when(sigNTok > 0, round(col("__nchar") / sigNTok, 4)).otherwise(0.0).as("mean_token_len"),
        when(col("__nchar") > 0, round(col("__nspace") / col("__nchar"), 4))
          .otherwise(0.0).as("space_ratio"),
        when(sigNTok > 0, round(nStop / sigNTok, 4)).otherwise(0.0).as("stopword_ratio"),
        qualityScoreCol.as("quality_score")): _*)
  }

  /**
   * Flesch readability scoring (Flesch 1948 reading-ease; Kincaid et al. 1975 grade
   * level) with the standard heuristic syllable counter — a syllable is a maximal run
   * of `[aeiouy]` in the lowercased text. A curation pipeline uses the score as a
   * cheap complexity signal next to [[qualityScore]] (e.g. CCNet-style bucketing by
   * audience level). Sentences = maximal runs of `[.!?]`; words = the shared
   * tokenizer. All three counts clamp to >= 1 so the ratios stay defined on
   * punctuation-free or empty docs. Narrow per-row map — zero shuffle at any scale.
   */
  def readability(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val base = df.select(col(idCol),
      greatest(size(tokensCol(col(textCol))), lit(1)).cast("double").as("__w"),
      greatest(size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")), lit(1))
        .cast("double").as("__s"),
      greatest(size(expr(s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)")), lit(1))
        .cast("double").as("__syl"))
    base.select(col(idCol),
      col("__w").cast("long").as("n_words"),
      col("__s").cast("long").as("n_sentences"),
      col("__syl").cast("long").as("n_syllables"),
      round(lit(206.835) - lit(1.015) * col("__w") / col("__s")
        - lit(84.6) * col("__syl") / col("__w"), 4).as("flesch_ease"),
      round(lit(0.39) * col("__w") / col("__s")
        + lit(11.8) * col("__syl") / col("__w") - lit(15.59), 4).as("fk_grade"))
  }

  /**
   * Stable train/test split by content hash: bucket = first 16 bits of md5(text) mod 100.
   * Hash-based (not RNG) splitting is the reproducible way to partition training corpora —
   * membership is a pure function of content, invariant under re-runs, re-partitioning and
   * incremental ingestion (a document never migrates between splits).
   */
  def hashSplit(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      trainPct: Int = 90): DataFrame = {
    require(trainPct > 0 && trainPct < 100)
    val bucket = (conv(substring(md5(col(textCol)), 1, 4), 16, 10).cast("int") % 100).as("bucket")
    df.select(col(idCol), bucket)
      .withColumn("split", when(col("bucket") < trainPct, "train").otherwise("test"))
  }

  /**
   * One-scan combined signal extraction for composed pipelines: quality score, repetition
   * fraction, token count and the deterministic sampling bucket, all from a single
   * [[graft.functions.TextExpressions.TextSignals]] pass — a capstone that consumed
   * [[qualityScore]], [[repetitionScore]] and [[tokenStats]] as separate branches paid
   * three corpus scans (each with its own interpreted tokenize) for signals one narrow
   * map produces together. Arithmetic is identical to the standalone operators, so
   * composing this keeps their oracle-pinned values bit-for-bit.
   */
  def docSignals(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      keep: Seq[String] = Nil): DataFrame = {
    val base = df.select(
      Seq(col(idCol)) ++ keep.map(col) ++ Seq(
        explode(array(TextFunctions.textSignals(tokensCol(col(textCol)), Stopwords))).as("__sig"),
        SampleOps.hashBucket(col(textCol)).as("bucket")): _*)
    base.select(
      Seq(col(idCol)) ++ keep.map(col) ++ Seq(
        col("__sig.n_tokens").as("n_tokens"),
        qualityScoreCol.as("quality_score"),
        topBigramFracCol.as("top_bigram_frac"),
        col("bucket")): _*)
  }

  /** Text canonicalization (the standard cleanup before hashing/dedup, so byte-different
    * renderings of the same text can't defeat exact dedup): the canonical-text expression
    * itself, shared by [[normalizeText]] and composed
    * pipelines that dedupe on canonicalized content).
    * Strip NON-whitespace controls FIRST, then collapse whitespace runs: the other order
    * turns "a <ctrl> b" into "a  b" (the deleted control leaves two adjacent spaces the
    * collapse already passed), breaking the single-space invariant. Whitespace controls
    * (tab/LF/CR/FF) are excluded from the strip so "a\nb" keeps its word break for the
    * collapse. Explicit classes: Java and RE2 disagree on \s vs vertical tab. */
  def normalizeTextCol(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.TextFunctions.nfc(c),
        "[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f]", ""),
      "[ \\t\\n\\r\\f]+", " "))

  def normalizeText(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val norm = normalizeTextCol(col(textCol))
    df.select(
      col(idCol),
      md5(norm).as("norm_md5"),
      length(norm).cast("long").as("n_chars_norm"))
  }

  /**
   * Token-window chunking (the doc→embedding-unit splitter): overlapping windows of
   * `window` tokens every `stride` tokens, in document order. Pure narrow map + explode —
   * no shuffle, no state; chunking a 100 TB corpus runs at scan speed and the output
   * partitions inherit the input's. Empty docs emit no chunks. The final window is the
   * ragged tail (length `n_chunk_tokens` ≤ window); a window whose start is past the end
   * never exists because starts stop at the last token index.
   */
  def chunkTokens(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      window: Int = 96, stride: Int = 64): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window)
    df.select(col(idCol), tokensCol(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start"))
      .select(col(idCol),
        (col("start") / stride).cast("int").as("chunk_id"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(window))).as("chunk_text"),
        least(size(col("toks")) - col("start"), lit(window)).cast("long").as("n_chunk_tokens"))
  }

  /**
   * Top-k TF-IDF terms per document (smooth idf, sklearn convention:
   * ln((1+N)/(1+df)) + 1). The (doc, token) term-frequency aggregation partial-combines
   * map-side (a document's tokens are co-located in its own row, so the exchange carries
   * ~distinct pairs, not the token stream); document frequencies re-aggregate off that
   * table (vocabulary-sized) and broadcast back; ranking is one window over the doc key.
   * Scores quantize to DECIMAL(18,8) before ranking so libm ulp differences can't flip
   * cross-engine order; ties break by token.
   */
  def tfidfTopK(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol), explode(tokensCol(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    val score = round((col("tf") *
      (log((lit(1) + col("n_docs")).cast("double") / (lit(1) + col("df"))) + lit(1.0)))
      .cast(DecimalType(18, 8)).cast("double"), 6)
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("token").asc)
    tf.join(broadcast(dfreq), "token").crossJoin(broadcast(nDocs))
      .select(col(idCol), col("token"), col("tf"), score.as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("tfidf"), col("rank"))
  }

  /**
   * BM25 lexical top-k retrieval (Robertson/Sparck-Jones; the keyword half of every
   * retrieval stack next to the ANN operators): for each query, the top `k` documents by
   * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with the positive idf
   * `ln(1 + (N−df+0.5)/(df+0.5))`.
   *
   * Plan shape for 100 TB: the (doc, token) term-frequency aggregation partial-combines
   * map-side and carries the document length WITH it (no doc-length self-join); document
   * frequencies are needed only for QUERY terms, so the vocabulary-sized df table is
   * semi-joined down to |query terms| rows and broadcast together with the corpus stats
   * (N, Σdl) — the probe never shuffles on anything but the (query, doc) score key, and
   * ranking is the bounded-heap [[graft.functions.TopKFunctions.topKByScore]] (≤ k rows
   * per query cross the final exchange, no sort).
   *
   * avgdl enters as `dl·N/Σdl` (exact longs, one double division) and per-term scores
   * quantize to DECIMAL(18,8) before the sum so cross-engine fp drift can't flip ranks.
   */
  def bm25TopK(df: DataFrame, queries: Seq[(String, String)], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queries.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val qtok = queries.toDF("query_id", "query_text")
      .select(col("query_id"), explode(array_distinct(tokensCol(col("query_text")))).as("token"))
    // Distinct query terms, collected to the driver: |terms| is query-bounded (a few
    // dozen strings — the model-artifact collect class), tokenized through the SAME
    // Column tokenizer the corpus uses so the two sides can never disagree.
    val qTerms = qtok.select(col("token")).distinct().as[String].collect().sorted.toSeq
    if (qTerms.isEmpty)
      return queries.toDF("query_id", "query_text").limit(0)
        .select(col("query_id"), lit(0L).as(idCol), lit(0.0).as("score"))
    // ZERO-exchange term frequencies: per doc, ONE narrow codegen'd map computes dl
    // and an occurrence count per query term via size(filter(__toks, = term)) — no
    // explode, no token ever crosses an exchange, and the single tokenize pass also
    // yields N and Σdl (the pmiPairs shared-scan lesson: the previous shape paid a
    // SECOND full tokenize for Σdl plus a corpus-sized explode+semi-join for tf —
    // measured 1.8 s vs 0.7 s at sf0.1). The per-doc frame (|docs| × (|terms|+2)
    // longs, no text) is localCheckpointed once for its two consumers.
    val toksDf = df.select(col(idCol), tokensCol(col(textCol)).as("__toks"))
    val perDoc = toksDf.select(
      col(idCol) +:
        coalesce(size(col("__toks")), lit(0)).cast("long").as("dl") +:
        qTerms.zipWithIndex.map { case (t, i) =>
          coalesce(size(filter(col("__toks"), x => x === lit(t))), lit(0))
            .cast("long").as(s"__tf_$i")
        }: _*)
      .localCheckpoint(true)
    // N counts ALL documents (empty ones too — they have no tf rows but weight avgdl)
    val stats = broadcast(perDoc.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).cast("long").as("sum_dl")))
    val tf = perDoc.select(col(idCol), col("dl"),
        explode(map(qTerms.zipWithIndex.flatMap { case (t, i) =>
          Seq(lit(t), col(s"__tf_$i")) }: _*)))
      .select(col(idCol), col("dl"), col("key").as("token"), col("value").as("tf"))
      .filter(col("tf") > 0)
    // document frequency for query terms (distinct docs per term)
    val dfreq = broadcast(tf.groupBy("token").agg(count(lit(1)).as("df")))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * (col("dl") * col("n_docs")).cast("double") / col("sum_dl"))
    val term = (idf * col("tf") * lit(k1 + 1.0) / norm).cast(DecimalType(18, 8))
    val scored = tf.join(broadcast(qtok), "token").join(dfreq, "token").crossJoin(stats)
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(term).cast("double"), 6).as("score"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKFunctions.topKByScore(col("score"), col(idCol),
        struct(col(idCol), col("score")), k).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col(s"t.$idCol").as(idCol), col("t.score").as("score"))
  }

  /** Email pattern shared with the oracle — RE2- and Java-regex compatible subset. */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII patterns shared by count and scrub — (name, regex, replacement token).
    * Deliberately conservative shapes that parse identically under Java regex
    * (Spark codegen) and RE2 (the DuckDB oracle): plain char classes, `\b`,
    * bounded quantifiers, non-capturing groups — no lookaround, no unicode
    * classes. Replacement runs in THIS order (most-specific first); counts are
    * taken on the ORIGINAL text so the four counters are order-independent. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"),
    ("phone", """\b\d{3}[-.]\d{3}[-.]\d{4}\b""", "<PHONE>"),
    ("email", EmailRegex, "<EMAIL>"),
    ("ip", """\b(?:\d{1,3}\.){3}\d{1,3}\b""", "<IP>"))

  /**
   * PII scrubbing — the redaction pass every training-data pipeline runs before
   * text leaves the trust boundary: emails, US-style SSNs/phone numbers, and IPv4
   * literals are counted (on the original text) and replaced with typed
   * placeholder tokens, reporting a digest of the scrubbed text for verification.
   * Pure codegen'd regexp column algebra — at 100 TB this is a narrow map over
   * the corpus (no shuffle, no UDF), and the counts aggregate map-side for
   * corpus-level audits; additional pattern classes are more entries in
   * [[PiiPatterns]], same pass.
   */
  def piiScrub(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val counts = PiiPatterns.map { case (k, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long").as(s"n_$k")
    }
    val scrubbed = PiiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
    df.select(col(idCol) +: counts :+ md5(scrubbed).as("scrubbed_md5"): _*)
  }

  /**
   * Compressibility quality signal: per-doc DEFLATE ratio (compressed/raw bytes) plus a
   * band classification — templated/looping text compresses far below natural prose
   * (`low` band), encrypted/binary-ish noise above it (`high`). A pure narrow map (the
   * native [[graft.functions.TextExpressions.DeflateRatio]] runs once per row at scan
   * speed); the bands are the actionable output — rows-only driver check (zlib output is
   * engine-specific) with the semantics property-pinned in ScalaTest.
   */
  def compressionRatio(df: DataFrame, lowBand: Double = 0.35, highBand: Double = 0.8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // deflate runs ONCE per row (two-step select barrier); null and empty docs get
    // their OWN bands — a null ratio would otherwise fall through both when()s to
    // "normal", and empty's sentinel 1.0 would read as incompressible noise
    df.select(col(idCol),
        col(textCol).isNull.as("__isnull"),
        (length(col(textCol)) === 0).as("__empty"),
        round(TextFunctions.deflateRatio(col(textCol)), 4).as("deflate_ratio"))
      .select(col(idCol), col("deflate_ratio"),
        when(col("__isnull"), lit(null).cast("string"))
          .when(col("__empty"), "empty")
          .when(col("deflate_ratio") < lowBand, "low")
          .when(col("deflate_ratio") > highBand, "high")
          .otherwise("normal").as("band"))

  /**
   * PMI (pointwise mutual information) collocation mining over adjacent token pairs —
   * the corpus-statistics op behind phrase/tokenizer-vocabulary engineering:
   * `pmi(a,b) = log10( P(ab) / (P(a)·P(b)) )` with bigram and unigram probabilities from
   * the corpus itself, reported for every pair at or above `minCount` (the standard
   * low-frequency guard — PMI explodes on hapax pairs).
   *
   * 100 TB shape: two counting aggregations with map-side combine (unigrams are
   * vocabulary-bounded; the bigram stream shuffles once like the vocabulary op, then the
   * `minCount` filter prunes to the collocation set BEFORE any join), plus two
   * vocabulary-side joins and two broadcast scalars. The PMI ratio is composed with a
   * FIXED operand order — `((c_ab·N_u)·N_u) / ((N_b·c_a)·c_b)` — so the double arithmetic
   * is bit-identical across engines; a single log10 with no summation needs no decimal
   * quantization.
   */
  /**
   * TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): PageRank over the
   * word co-occurrence graph. Vocabulary = tokens with corpus count ≥ `minCount`
   * (bounds the graph at the frequent-vocab size however large the corpus); edges =
   * distinct UNDIRECTED adjacent-token pairs within that vocabulary (window 2, the
   * paper's default); ranking = [[GraphOps.pageRank]]'s fixed-point integer recursion
   * — every rank an exact BIGINT both engines reproduce bit-for-bit, ties on token.
   *
   * Scale shape: tokenize is the one corpus scan; everything after runs on
   * vocabulary/pair tables bounded by the frequent vocab (Heaps-law sublinear in
   * corpus size). Top-k selection is a sort-limit on the (tiny, post-aggregation)
   * rank table, not a corpus operation.
   */
  def textRank(df: DataFrame, minCount: Long = 5, topK: Int = 50,
      textCol: String = "text"): DataFrame = {
    // ONE tokenize pass for BOTH count tables (guide §2.4 "do fewer passes"): unigram
    // rows (tok, NULL) and window-2 pair rows (a, b) ride the same exploded gram
    // stream into a single map-side-combined aggregation; the result is the
    // Heaps-bounded (vocab + distinct-bigram) table, lineage-cut because freq feeds
    // 4 consumers and pairs 2 — the r13 two-table form re-tokenized the corpus once
    // per reference (~7 scans per run, measured in the doc_textrank plan).
    // Equivalence: unigram counts are identical; the pair table now carries one row
    // per DISTINCT pair (with its count) instead of one per occurrence, and its only
    // consumer is the symmetric-edge `.distinct()` — same edge set.
    val grams = textRankGramCounts(df, textCol).localCheckpoint(eager = false)
    val freq = grams.filter(col("b").isNull && col("n") >= minCount)
      .select(col("a").as("tok"), col("n").as("c"))
    val pairs = grams.filter(col("b").isNotNull && col("a") =!= col("b"))
      .join(freq.select(col("tok").as("a")), "a")
      .join(freq.select(col("tok").as("b")), "b")
      .select("a", "b")
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst"))).distinct()
    GraphOps.pageRank(edges, iters = 3, dampingPct = 85)
      .join(freq.select(col("tok").as("id"), col("c")), "id")
      .orderBy(col("rank_e12").desc, col("id"))
      .limit(topK)
      .select(col("id").as("token"), col("rank_e12"), col("c").as("n_occurrences"))
  }

  /** The shared one-pass gram counter behind [[textRank]] and the incremental twin:
    * (a, b NULL, n) = unigram counts, (a, b, n) = adjacent-pair (window 2) counts,
    * both from a single tokenize scan and one shuffle. Tokens never contain spaces
    * (the tokenizer splits on non-alphanumerics), so the 2-gram splits are exact. */
  private[graft] def textRankGramCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(tokensCol(col(textCol)).as("__toks"))
      .select(explode(concat(
        transform(col("__toks"),
          x => struct(x.as("a"), lit(null).cast("string").as("b"))),
        transform(TextFunctions.shingles(col("__toks"), 2),
          p => struct(substring_index(p, " ", 1).as("a"),
            substring_index(p, " ", -1).as("b"))))).as("g"))
      .groupBy(col("g.a").as("a"), col("g.b").as("b"))
      .agg(count(lit(1)).as("n"))

  /**
   * RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword Extraction from
   * Individual Documents") — the stopword-delimited PHRASE extractor next to
   * [[textRank]]'s single-word graph ranking: candidate phrases are maximal
   * stopword-free token runs; word score = deg(w)/freq(w) where freq counts
   * candidate-word occurrences and deg(w) sums the length of each containing
   * phrase; phrase score = Σ member word scores. This corpus flavor computes word
   * stats globally (the paper is per-document) and aggregates identical phrases.
   *
   * Engine-exactness: word scores are the exact BIGINT (deg·10⁶) div freq — phrase
   * scores are integer SUMS of those (float addition order never appears), ties on
   * phrase text.
   *
   * Scale shape: tokenize + posexplode is the corpus scan; the phrase-id running
   * count is a DOC-KEYED window (the per-doc ordering every doc operator already
   * pays, never a global sort); word stats are vocabulary-bounded and the
   * score join back to occurrences is frequent-vocab-sized (broadcastable).
   */
  def rake(df: DataFrame, topK: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val (wordStats, phraseCounts) = rakeDeltas(df, idCol, textCol)
    rakeFromCounts(wordStats, phraseCounts, topK)
  }

  /** One corpus slice's RAKE contribution — BOTH tables are associative count sums,
    * which is what makes the incremental twin exact: (tok → freq, deg) and
    * (phrase → occ). Phrase extraction is doc-local (a doc-keyed window), so a
    * slice's deltas never depend on other slices. */
  def rakeDeltas(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("__id"),
        posexplode(tokensCol(col(textCol))).as(Seq("__pos", "__tok")))
      .withColumn("__stop", col("__tok").isInCollection(Stopwords))
    // phrase id = running stopword count: tokens between stopwords share a group
    val wDoc = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val words = toks
      .withColumn("__grp", sum(col("__stop").cast("long")).over(wDoc))
      .filter(!col("__stop"))
      .select(col("__id"), col("__grp"), col("__pos"), col("__tok"))
    val phrases = words.groupBy(col("__id"), col("__grp"))
      .agg(array_join(transform(sort_array(collect_list(
          struct(col("__pos"), col("__tok")))), e => e.getField("__tok")), " ")
          .as("phrase"),
        count(lit(1)).as("__len"))
    // BOTH count tables from ONE pass over the phrase stream (guide §2.4). Word rows
    // are recovered by re-splitting the phrase text — each phrase string is exactly
    // the space-join of its group's token multiset, so (freq = occurrences,
    // deg = Σ containing-phrase length) are identical to the r13 words⋈phrases join,
    // which re-ran the whole tokenize+window pass on BOTH join sides. The combined
    // (kind, key) aggregate is vocab + distinct-phrase bounded (it IS the maintained
    // state of the incremental twin), lineage-cut because word/phrase consumers are
    // separate actions downstream.
    val combined = phrases.select(explode(concat(
        transform(split(col("phrase"), " "),
          t => struct(lit(0).as("kind"), t.as("key"), col("__len").as("w"))),
        array(struct(lit(1).as("kind"), col("phrase").as("key"), lit(1L).as("w")))))
        .as("g"))
      .groupBy(col("g.kind").as("kind"), col("g.key").as("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("g.w")).as("sw"))
      .localCheckpoint(eager = false)
    val wordStats = combined.filter(col("kind") === 0)
      .select(col("key").as("tok"), col("cnt").as("freq"),
        col("sw").cast("long").as("deg"))
    val phraseCounts = combined.filter(col("kind") === 1)
      .select(col("key").as("phrase"), col("cnt").as("occ"))
    (wordStats, phraseCounts)
  }

  /** RAKE finisher over (possibly maintained) count state: word score = exact
    * (deg·10⁶) div freq, phrase score = the integer sum over the phrase's word
    * multiset (recovered by splitting the phrase text — phrase scores are pure
    * functions of the counts, so state-fed and one-shot results are row-identical). */
  def rakeFromCounts(wordStats: DataFrame, phraseCounts: DataFrame,
      topK: Int = 20): DataFrame = {
    val s6 = wordStats.select(col("tok"),
      expr("deg * 1000000 div freq").as("__s_e6"))
    phraseCounts
      .select(col("phrase"), col("occ"),
        explode(split(col("phrase"), " ")).as("tok"))
      .join(s6, "tok")
      .groupBy(col("phrase"))
      .agg(first(col("occ")).as("n_occurrences"), sum(col("__s_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("phrase"))
      .limit(topK)
      .select(col("phrase"), col("score_e6").cast("long").as("score_e6"),
        col("n_occurrences").cast("long").as("n_occurrences"))
  }

  def pmiPairs(df: DataFrame, minCount: Long = 5, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val toksDf = df.select(tokensCol(col(textCol)).as("__toks"))
    val uni = toksDf.select(explode(col("__toks")).as("tok"))
    val uc = uni.groupBy("tok").agg(count(lit(1)).as("c"))
    // BOTH totals from ONE narrow size-sum pass (each agg branch would otherwise be its
    // own whole-corpus tokenize scan — Spark does not dedupe common scan subtrees)
    val totals = broadcast(toksDf.agg(
      sum(size(col("__toks")).cast("long")).as("n_u"),
      sum(greatest(size(col("__toks")) - 1, lit(0)).cast("long")).as("n_b")))
    val bc = toksDf.select(explode(TextFunctions.shingles(col("__toks"), 2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val sp = bc
      .withColumn("tok_a", split(col("pair"), " ").getItem(0))
      .withColumn("tok_b", split(col("pair"), " ").getItem(1))
    sp.join(uc.select(col("tok").as("tok_a"), col("c").as("c_a")), "tok_a")
      .join(uc.select(col("tok").as("tok_b"), col("c").as("c_b")), "tok_b")
      .crossJoin(totals)
      .select(col("pair"), col("n_pair"),
        round(log10((col("n_pair").cast(DoubleType) * col("n_u") * col("n_u")) /
          (col("n_b").cast(DoubleType) * col("c_a") * col("c_b"))), 6).as("pmi"))
  }

  /**
   * Dunning log-likelihood-ratio collocations (Dunning 1993, "Accurate Methods for
   * the Statistics of Surprise and Coincidence") — the SPARSE-ROBUST sibling of
   * [[pmiPairs]]: PMI explodes for rare pairs (one co-occurrence of two hapaxes maxes
   * the score); G² weighs the full 2×2 bigram contingency table
   * (k11 = n(a,b), margins from the bigram table itself), so low-count flukes score
   * near zero and real collocations rise. Reported in log10 units
   * (`llr10 = G²/(2·ln10)` rescaled — log10 is the engine-pairable log, the
   * `ev_msprt` precedent), 9 x·log10(x) terms composed in one fixed operand order.
   *
   * Scale shape: one tokenize scan → bigram counts; margins are two aggregates OF
   * THE BIGRAM TABLE (vocab-bounded, Heaps-law sublinear); N broadcasts. The
   * minCount filter applies to OUTPUT rows only — margins always sum all bigrams.
   */
  def llrPairs(df: DataFrame, minCount: Long = 5, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val toksDf = df.select(tokensCol(col(textCol)).as("__toks"))
    val bc = toksDf.select(explode(TextFunctions.shingles(col("__toks"), 2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_pair"))
      .withColumn("tok_a", split(col("pair"), " ").getItem(0))
      .withColumn("tok_b", split(col("pair"), " ").getItem(1))
    val rowA = bc.groupBy(col("tok_a")).agg(sum(col("n_pair")).as("ra"))
    val colB = bc.groupBy(col("tok_b")).agg(sum(col("n_pair")).as("cb"))
    val n = broadcast(bc.agg(sum(col("n_pair")).as("nn")))
    def xlx(c: Column): Column =
      when(c >= 1, c.cast(DoubleType) * log10(c.cast(DoubleType))).otherwise(lit(0.0))
    val (k11, ra, cb, nn) = (col("n_pair"), col("ra"), col("cb"), col("nn"))
    val (k12, k21, k22) = (ra - k11, cb - k11, nn - ra - cb + k11)
    bc.join(rowA, "tok_a").join(colB, "tok_b").crossJoin(n)
      .filter(col("n_pair") >= minCount)
      .select(col("pair"), col("n_pair"),
        round(lit(2.0) * (xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
          - xlx(ra) - xlx(nn - ra) - xlx(cb) - xlx(nn - cb) + xlx(nn)), 4).as("llr10"))
  }

  /**
   * Markup stripping — the raw-crawl → text extraction step ahead of every other text
   * op: drop `<script>`/`<style>` blocks with their contents, strip remaining tags,
   * decode the common entities, collapse whitespace. Pure codegen'd `regexp_replace`
   * chain (a narrow map at scan speed, like [[piiScrub]]); the regex dialect sticks to
   * the RE2/Java-compatible subset so the DuckDB oracle applies the identical pipeline.
   * Returns the extracted text plus before/after lengths (the markup-density signal
   * crawl filters threshold on).
   */
  def markupStrip(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // per-tag lazy dotall blocks (no backreference — RE2 has none): `(\s[^>]*)?>` ends
    // the tag NAME so `<styles>`/`<style-guide>` are not block openers, `.*?` spans `<`
    // inside JS/CSS bodies, and the `|$` alternative still swallows unterminated blocks
    def dropBlock(c: Column, tag: String): Column =
      regexp_replace(c, s"(?is)<$tag(\\s[^>]*)?>.*?(</$tag\\s*>|$$)", " ")
    val noBlocks = dropBlock(dropBlock(col(textCol), "script"), "style")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    // &amp; decodes LAST: the other way round, "&amp;lt;" would double-decode to "<";
    // &nbsp; becomes a plain space ahead of the whitespace collapse
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(
        noTags, "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&#39;", "'"), "&apos;", "'"), "&amp;", "&")
    val clean = trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
    df.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars_raw"),
      length(clean).cast("long").as("n_chars_text"),
      clean.as("extracted"))
  }

  /**
   * Repetition scoring (Gopher-style quality filters): distinct-token ratio and the
   * top-bigram fraction (share of all word bigrams taken by the most frequent one) —
   * high values flag boilerplate/spam/looping generations. The bigram mode is computed
   * via explode → count so the shuffle carries (doc_id, bigram-hash) pairs, never texts.
   */
  def repetitionScore(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // the whole signal set — including the per-doc top-bigram multiplicity — is ONE
    // narrow pass (TextSignals keeps the bigram frequency map as per-document local
    // state); the former explode + two keyed exchanges + join shape paid two shuffles
    // of the bigram stream for a per-document statistic
    val base = df.select(col(idCol),
      explode(array(TextFunctions.textSignals(tokensCol(col(textCol)), Stopwords))).as("__sig"))
    base.select(
      col(idCol), col("__sig.n_tokens").as("n_tokens"),
      distinctRatioCol.as("distinct_ratio"),
      topBigramFracCol.as("top_bigram_frac"))
  }

  /**
   * Per-document token (Shannon) entropy in base 10 — the classic "is this text varied
   * or degenerate" quality signal (near 0 = one token looped; log10(n) = all tokens
   * distinct). Computed via the identity H = log10(n) − (Σ c·log10(c))/n over per-doc
   * token counts, so the shuffle carries (doc_id, token) count rows, never texts, and
   * the cross-engine discipline holds: each c·log10(c) term quantizes to DECIMAL(18,8)
   * before the exact decimal SUM (fp addition order differs between engines).
   */
  def tokenEntropy(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // entropy of a document depends only on that document: the per-doc token-count map is
    // LOCAL state inside one native expression call, so the plan is a narrow map over the
    // scan — zero Exchange (the former explode → groupBy(doc,token) → groupBy(doc) shape
    // shipped the whole tokenized corpus through two shuffles for a map-shaped quantity).
    // explode(array(e)) pins the struct as a generator output so the isNotNull filter
    // cannot re-evaluate the expression below the Generate (same barrier as longestRepeat)
    df.select(col(idCol),
        explode(array(TextFunctions.tokenEntropySignals(tokensCol(col(textCol))))).as("__e"))
      .filter(col("__e").isNotNull)
      .select(col(idCol), col("__e.n_tokens").as("n_tokens"),
        round(log10(col("__e.n_tokens").cast("double")).cast(DecimalType(18, 8)).cast("double")
          - col("__e.s").cast("double") / col("__e.n_tokens"), 4).as("entropy10"))

  /** The exchange-based formulation of [[tokenEntropy]] (explode → two keyed shuffles) —
    * kept as the property cross-check twin for the zero-shuffle kernel, mirroring the
    * DuckDB oracle's shape term for term. */
  private[graft] def tokenEntropyGrouped(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), explode(tokensCol(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum((col("cnt").cast("double") * log10(col("cnt").cast("double")))
          .cast(DecimalType(18, 8))).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(log10(col("n_tokens").cast("double")).cast(DecimalType(18, 8)).cast("double")
          - col("__s").cast("double") / col("n_tokens"), 4).as("entropy10"))

  /**
   * Longest repeated token n-gram per document — the memorization/looping risk signal
   * (long verbatim internal repeats are what loopy generations and boilerplate-stuffed
   * pages look like; ExactSubstr-style dedup reasons about the CROSS-doc version, this
   * is the intra-doc one). One [[graft.functions.TextFunctions.longestRepeat]] expression
   * call per document — zero shuffle, the maximal length binary-searched in O(log n)
   * set-membership passes; docs with no repeated token at all drop out. Deterministic
   * representative: lexicographically smallest (UTF-8 byte order) among the maximal
   * repeats, with its occurrence count (overlaps counted).
   */
  def longestRepeatedSpan(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    // explode(array(e)) makes the struct a GENERATOR OUTPUT — a real attribute, not an
    // alias — so the isNotNull predicate cannot push below it and re-evaluate the
    // expression in a Filter (the CollapseProject __sig trick alone doesn't survive
    // predicate pushdown's alias substitution); exactly one eval per document
    df.select(col(idCol),
        explode(array(TextFunctions.longestRepeat(tokensCol(col(textCol))))).as("__r"))
      .filter(col("__r").isNotNull)
      .select(col(idCol), col("__r.rep_len").as("rep_len"),
        col("__r.rep_text").as("rep_text"), col("__r.n_occ").as("n_occ"))

  /** First 60 bits of md5 as a long — the hash shared with the DuckDB oracles
    * (`CAST('0x' || substring(md5(x),1,15) AS BIGINT)`). 60 bits so the unsigned hex value
    * always fits a signed long. Pure built-ins, codegen'd. */
  private[graft] def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /**
   * Document fingerprint: bottom-k sketch of shingle hashes, rendered as a comma-joined
   * sorted string (a scalar the correctness gate can sort and hash; an `array<long>` column
   * crashes pandas-side comparators). Uses [[md5Hash60]] so the DuckDB oracle reproduces it
   * bit-for-bit; the xxh64 one-pass variant for 100 TB runs is [[fingerprintSketch]].
   */
  def fingerprint(df: DataFrame, textCol: String = "text", idCol: String = "doc_id", k: Int = 8): DataFrame =
    df.select(
      col(idCol),
      concat_ws(",",
        transform(
          TextFunctions.md5ShingleBottomK(tokensCol(col(textCol)), 3, k),
          _.cast("string"))).as("fingerprint"))

  /** The scale-path fingerprint: one-pass xxh64 bottom-k over hashed shingles
    * ([[graft.functions.TextExpressions.MinKHashesLong]]) — compact, mergeable, joinable. */
  def fingerprintSketch(df: DataFrame, textCol: String = "text", idCol: String = "doc_id", k: Int = 8): DataFrame =
    df.select(
      col(idCol),
      TextFunctions.minKHashesLong(
        TextFunctions.shingleHashes(tokensCol(col(textCol)), 3), k).as("fingerprint"))

  /**
   * 60-bit SimHash over [[md5Hash60]] token hashes, in pure column algebra (nested
   * higher-order functions) — the oracle-verifiable twin of the one-pass native
   * [[graft.functions.TextExpressions.SimHash64]] used by the dedup scale path. Bit b of
   * the result is set iff more than half of the token occurrences (multiset, like SimHash64)
   * have bit b set in their hash.
   */
  def simhash60(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), TextFunctions.simhash60Md5(tokensCol(col(textCol))).as("simhash"))

  /**
   * EXACT corpus-level heavy hitters: every token whose global count `c` satisfies
   * `c * invPhi > N` (frequency strictly above 1/invPhi of all token occurrences).
   * Integer arithmetic on both sides of the gate keeps the threshold bit-identical
   * across engines — no float-boundary ambiguity.
   *
   * Exactness at scale WITHOUT shuffling the long tail (the two-phase
   * candidate-then-recount scheme of Misra–Gries-style streaming summaries):
   *
   *  1. candidate phase — per-partition token counting in a local hash map
   *     (`mapPartitions`: genuinely per-partition imperative state, the documented
   *     last-resort case), emitting tokens locally above `n_p / invPhi`. By the averaging
   *     argument, any global heavy hitter is locally heavy in ≥ 1 partition, so the
   *     candidate set is a guaranteed superset — nothing is ever missed. Zero shuffle;
   *     only the (tiny) candidate list moves.
   *  2. exact phase — tokens are filtered to the broadcast candidate set BEFORE the
   *     `groupBy`, so the one exchange carries candidate occurrences only, never the
   *     tail. The exact recount then applies the strict global gate.
   *
   * Returns (token, n) for the true heavy hitters — exact, not approximate.
   */
  /**
   * Count-Min-Sketch heavy-hitter profile, as a self-verifying verdict row: the
   * APPROXIMATE path for when even the per-partition candidate sets of [[heavyHitters]]
   * are too large (unbounded vocabularies — URLs, n-grams, ids). The sketch aggregates
   * distributedly (built-in `count_min_sketch`, mergeable partial buffers) and ONLY the
   * few-hundred-KB sketch lands on the driver — the model-to-driver pattern the ANN
   * operators use. The verdict audits the sketch against the exact [[heavyHitters]]
   * output at test scale: CMS must never underestimate (structural guarantee) and must
   * stay within `2·eps·N` of the true counts. The paper bound is `eps·N` with
   * probability `confidence` only — asserting it raw would let an unlucky (seed, data)
   * pairing flip the gate red with no code bug, so the verdict widens to 2× (still far
   * below any useful `1/invPhi` threshold). The gate is seed-pinned: a red here means
   * re-check the seed/data pairing before suspecting the operator.
   */
  def cmsHeavyVerdict(df: DataFrame, invPhi: Int = 200, eps: Double = 0.0001,
      confidence: Double = 0.99, seed: Int = 42, textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(tokensCol(col(textCol))).as("token"))
    val row = toks.agg(
      expr(s"count_min_sketch(token, ${eps}d, ${confidence}d, $seed)").as("cms"),
      count(lit(1)).as("n_total")).collect()(0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val nTotal = row.getLong(1)
    val heavy = heavyHitters(df, invPhi, textCol).as[(String, Long)].collect()
    val bound = 2L * math.ceil(eps * nTotal).toLong
    val overOk = heavy.forall { case (t, n) => cms.estimateCount(t) >= n }
    val boundOk = heavy.forall { case (t, n) => cms.estimateCount(t) <= n + bound }
    Seq((heavy.length.toLong, overOk, boundOk))
      .toDF("n_heavy", "overestimate_ok", "bound_ok")
  }

  /**
   * Benchmark decontamination — the eval-overlap gate every serious training-data
   * pipeline runs before a corpus ships (the GPT-3 appendix-C rule, kept by Dolma/
   * RefinedWeb: a training document is CONTAMINATED if it shares any n-gram, n = 13
   * by default, with the held-out evaluation set). Per corpus doc: distinct n-gram
   * count, how many of those appear anywhere in the eval set, and the contaminated
   * flag. The DEFAULT is the 100 TB slice-hash kernel (`kernel = true` — the
   * graphSearch r8 #2 precedent: the scale form is the library default); the
   * md5-60 string form (`kernel = false`) is the Verify gate's explicit choice so
   * the DuckDB oracle can replay the overlap exactly (the winnowing md5/xxh64
   * pairing, VERDICT r5 #2). The kernel's win is NOT the digest: swapping md5 for
   * xxhash64 over the same n-gram strings measured 19.4 s vs 16.3 s at sf0.1 —
   * building ~40M 13-token strings IS the cost. The kernel hashes the token-array
   * SLICE directly (`xxhash64(slice(toks, i, n))`), so no n-gram string ever
   * materializes.
   *
   * Scale shape: the eval set is benchmark-sized by nature, so its distinct n-gram
   * digest table normally broadcasts (~10M longs for a 100k-doc suite ⇒ ~80 MB).
   * The hint is deliberately NOT forced: AQE sees the digest table's actual
   * post-shuffle size and converts to broadcast when it fits, while an oversized
   * eval suite degrades to a shuffled join of digests only, never text (a forced
   * broadcast would instead fail on driver/executor memory — ADVICE r9 #4).
   * The corpus contributes ONE tokenize+shingle scan;
   * per-doc grams are `array_distinct`ed BEFORE the explode so the semi-join input
   * is bounded by distinct grams, and short docs (< n tokens) surface with
   * n_ngrams = 0 rather than vanishing.
   */
  /** Per-doc DISTINCT n-gram digests — the shared front half of [[decontaminate]]
    * and [[graft.streaming.IncrementalDecontaminate]] (one tokenize pass; the
    * kernel form hashes token-array slices so no n-gram string materializes). */
  private[graft] def decontaminateGrams(df: DataFrame, n: Int, textCol: String,
      idCol: String, kernel: Boolean): DataFrame = {
    val toks = df.select(col(idCol), tokensCol(col(textCol)).as("__toks"))
    // CASE-guard, not sequence(1, greatest(...)): Spark's sequence DESCENDS when
    // stop < start, so a short doc would produce slice position 0 and throw
    if (kernel) toks.select(col(idCol), array_distinct(expr(
      s"CASE WHEN size(__toks) < $n THEN CAST(array() AS array<bigint>) " +
        s"ELSE transform(sequence(1, size(__toks) - ${n - 1}), " +
        s"i -> xxhash64(slice(__toks, i, $n))) END")).as("__hs"))
    else toks.select(col(idCol),
      array_distinct(transform(
        TextFunctions.shingles(col("__toks"), n),
        s => md5Hash60(s))).as("__hs"))
  }

  def decontaminate(corpus: DataFrame, evalSet: DataFrame, n: Int = 13,
      textCol: String = "text", idCol: String = "doc_id",
      kernel: Boolean = true): DataFrame = {
    def grams(df: DataFrame) = decontaminateGrams(df, n, textCol, idCol, kernel)
    // ONE corpus pass: a totals branch + a shared branch would each re-run the
    // tokenize+shingle scan (Spark does not dedupe common scan subtrees — the
    // pmiPairs lesson); explode_outer keeps short docs (null gram → n_ngrams 0)
    // and the broadcast left join + conditional sum folds overlap counting into
    // the same aggregation.
    val evalHashes = grams(evalSet)
      .select(explode(col("__hs")).as("__h")).distinct()
      .withColumn("__hit", lit(1L))
    // no broadcast() hint: AQE converts to broadcast when the digest table fits,
    // and an oversized eval suite degrades to a shuffle join instead of OOMing
    grams(corpus).select(col(idCol), explode_outer(col("__hs")).as("__h"))
      .join(evalHashes, Seq("__h"), "left")
      .groupBy(col(idCol)).agg(
        count(col("__h")).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_shared"))
      .select(col(idCol), col("n_ngrams"), col("n_shared"),
        (col("n_shared") >= 1L).as("contaminated"))
  }

  def heavyHitters(df: DataFrame, invPhi: Int = 200, textCol: String = "text"): DataFrame = {
    val toks = df.select(explode(tokensCol(col(textCol))).as("token"))
    import toks.sparkSession.implicits._
    val cands = toks.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { t => n += 1; counts.update(t, counts.getOrElse(t, 0L) + 1L) }
      counts.iterator.collect { case (t, c) if c * invPhi >= n => t }
    }.toDF("token").distinct()
    // total occurrences as a NARROW sum of per-doc sizes — re-evaluating the exploded
    // stream for a count would be a third full tokenize+explode scan
    val total = df.agg(
      coalesce(sum(size(tokensCol(col(textCol))).cast("long")), lit(0L)).as("n_total"))
    toks.join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") * invPhi > col("n_total"))
      .select(col("token"), col("n"))
  }

  /**
   * Jelinek-Mercer interpolated bigram language-model score per document:
   * `avg over bigrams of log10(lambda * P(w2|w1) + (1-lambda) * P(w2))`, the classic
   * smoothed-LM fluency signal (higher = more natural text; the bigram term catches
   * word-salad documents a unigram model scores as fluent).
   *
   * Scale shape: bigram construction is a pure NARROW map (`transform` over token-array
   * indices — no posexplode + window, which would shuffle and sort the whole token
   * stream by doc). The occurrence stream is collapsed to distinct `(doc, bigram)` rows
   * with multiplicity `k` in ONE corpus-sized exchange; the bigram frequency table then
   * folds off that aggregate (distinct-bigram-sized, never a second corpus shuffle) and
   * joins back on the bigram key — at 100 TB that join is shuffle-hash over distinct
   * tuples while the unigram table and the grand total broadcast. Per-occurrence
   * log terms enter the sum as `k * quantized(log)` — exactly equal, in decimal
   * arithmetic, to summing k quantized copies, which is what the DuckDB oracle does.
   * The multiplicity is cast to DECIMAL(10,0) first: a raw long * DECIMAL(18,8) product
   * overflows precision 38 and Spark silently drops the scale to 7.
   */
  def bigramLogprob(df: DataFrame, lambda: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol), tokensCol(col(textCol)).as("__l"))
    val ufreq = toks.select(explode(col("__l")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val total = ufreq.agg(sum(col("cu")).as("total"))
    val big = toks.where(size(col("__l")) >= 2).select(col(idCol),
        explode(expr("transform(sequence(1, size(__l) - 1), " +
          "i -> struct(element_at(__l, i) AS w1, element_at(__l, i + 1) AS w2))")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val perDoc = big.groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("k"))
    val bfreq = perDoc.groupBy("w1", "w2").agg(sum(col("k")).as("cb"))
    // fixed operand order, mirrored verbatim in the oracle SQL: lambda scaling by 0.5 is
    // a power-of-two multiply (exact), the two ratios are single IEEE divisions
    val p = (lit(lambda) * (col("cb").cast("double") / col("cu1"))) +
      (lit(1.0 - lambda) * (col("cu2").cast("double") / col("total")))
    perDoc.join(bfreq, Seq("w1", "w2"))
      .join(broadcast(ufreq.select(col("w").as("w1"), col("cu").as("cu1"))), "w1")
      .join(broadcast(ufreq.select(col("w").as("w2"), col("cu").as("cu2"))), "w2")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).as("n_bigrams"),
        round(sum(col("k").cast(DecimalType(10, 0)) *
            log(10.0, p).cast(DecimalType(18, 8))).cast("double") / sum(col("k")), 4)
          .as("avg_logprob"))
  }

  /**
   * Interpolated Kneser-Ney bigram language-model score per document (Kneser & Ney
   * 1995; the interpolated form of Chen & Goodman 1999 with a fixed absolute discount
   * D = 0.75):
   *
   *   P(w|v) = max(c(v,w) - D, 0) / c1(v)
   *          + ((D * n1p(v)) / c1(v)) * (ct(w) / ntypes)
   *
   * Every statistic derives from the corpus bigram-TYPE table: `c1(v)` = bigram tokens
   * starting with v, `n1p(v)` = distinct continuations of v (how much mass was
   * discounted), `ct(w)` = distinct left contexts of w, `ntypes` = distinct bigram
   * types. `ct/ntypes` is the continuation probability — the "how many novel contexts
   * does w appear in" idea that makes KN the strongest n-gram smoother (a word frequent
   * only inside one collocation gets a LOW backoff weight where raw-frequency
   * interpolation, [[bigramLogprob]], overrates it).
   *
   * Scale shape: identical to [[bigramLogprob]] — bigram construction is a narrow
   * `transform` map, ONE corpus-sized exchange collapses to distinct `(doc, bigram, k)`,
   * and all four model tables fold off the bigram-type table (type-sized, never a second
   * corpus shuffle); the per-word stat tables broadcast back. Float discipline: fixed
   * operand order mirrored verbatim in the oracle (`cb - D` and `D * n1p` are exact in
   * binary — D = 3/4; the three ratios are single IEEE divisions), `log10` paired with
   * DuckDB `LOG10` (both libm log10 — the two-arg ln ratio differs by ulps), per-term
   * DECIMAL(18,8) quantization with DECIMAL(10,0) multiplicities (the repo-standard sum
   * discipline).
   */
  def knLogprob(df: DataFrame, discount: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    val toks = df.select(col(idCol), tokensCol(col(textCol)).as("__l"))
    val big = toks.where(size(col("__l")) >= 2).select(col(idCol),
        explode(expr("transform(sequence(1, size(__l) - 1), " +
          "i -> struct(element_at(__l, i) AS w1, element_at(__l, i + 1) AS w2))")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val perDoc = big.groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("k"))
    val bfreq = perDoc.groupBy("w1", "w2").agg(sum(col("k")).as("cb"))
    val leftStats = bfreq.groupBy("w1")
      .agg(sum(col("cb")).as("c1"), count(lit(1)).as("n1p"))
    val contStats = bfreq.groupBy("w2").agg(count(lit(1)).as("ct"))
    val ntypes = bfreq.agg(count(lit(1)).as("ntypes"))
    val p = (greatest(col("cb").cast("double") - lit(discount), lit(0.0)) / col("c1")) +
      (((lit(discount) * col("n1p")) / col("c1")) *
        (col("ct").cast("double") / col("ntypes")))
    perDoc.join(bfreq, Seq("w1", "w2"))
      .join(broadcast(leftStats), "w1")
      .join(broadcast(contStats), "w2")
      .crossJoin(broadcast(ntypes))
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).as("n_bigrams"),
        round(sum(col("k").cast(DecimalType(10, 0)) *
            log10(p).cast(DecimalType(18, 8))).cast("double") / sum(col("k")), 4)
          .as("avg_logprob"))
  }

  /**
   * CCNet-style perplexity terciles (Wenzek et al., "CCNet: Extracting High Quality
   * Monolingual Datasets from Web Crawl Data", 2020): per language, documents split into
   * head / middle / tail by their LM score tercile — head = the most-fluent third, the
   * standard curriculum / filtering knob for web-crawl corpora. The LM here is the
   * corpus unigram model (identical arithmetic to the oracle-green unigram-logprob
   * gate); the bucketing is what this operator adds.
   *
   * Cross-engine exactness: tercile thresholds use the DISCRETE rank rule (smallest
   * grid value whose cumulative count reaches ceil(n/3), ceil(2n/3)) over the 1e-4
   * score grid (`round(avg_logprob, 4) * 10000` as a long) — integer comparisons only,
   * so no engine can disagree by a ulp the way interpolated percentiles can.
   *
   * Scale shape: the histogram is grid-sized (distinct score values per language, not
   * docs), thresholds are a per-language row that broadcasts back, and assignment is a
   * pure map. The per-doc score table feeds both the histogram and the final join —
   * at 100 TB persist/checkpoint it between the two consumers.
   */
  def ccnetBuckets(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), col(langCol),
      explode(tokensCol(col(textCol))).as("token"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val perDoc = toks.join(broadcast(freq), "token").crossJoin(broadcast(total))
      .groupBy(col(idCol), col(langCol))
      .agg(round((sum(log(10.0, col("cnt").cast("double") / col("total"))
        .cast(DecimalType(18, 8))).cast("double") / count(lit(1))), 4).as("avg_logprob"))
      .withColumn("__g", round(col("avg_logprob") * 10000).cast("long"))
    val hist = perDoc.groupBy(col(langCol), col("__g")).agg(count(lit(1)).as("c"))
    val n = hist.groupBy(langCol).agg(sum(col("c")).as("n"))
    val wCum = Window.partitionBy(col(langCol)).orderBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = hist.withColumn("cum", sum(col("c")).over(wCum))
      .join(broadcast(n), langCol)
      .groupBy(col(langCol))
      .agg(
        min(when(col("cum") >= ceil(col("n") / 3.0), col("__g"))).as("t1"),
        min(when(col("cum") >= ceil((col("n") * 2) / 3.0), col("__g"))).as("t2"))
    perDoc.join(broadcast(thr), langCol)
      .select(col(idCol), col(langCol), col("avg_logprob"),
        when(col("__g") > col("t2"), lit("head"))
          .when(col("__g") > col("t1"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /**
   * Zipf-law fit over the corpus rank-frequency curve: least-squares slope/intercept/R²
   * of `log10(freq)` against `log10(rank)` for the top `topK` tokens — the standard
   * corpus-health diagnostic (natural language sits near slope −1; templated/generated
   * text bends the head, OCR noise fattens the tail). Fitting the HEAD is the published
   * practice and what keeps this scalable: the frequency aggregation is the only
   * corpus-sized exchange, the top-k is a `TakeOrderedAndProject` bounded heap
   * (deterministic `(freq DESC, token ASC)` order), and the regression runs over k rows.
   *
   * Cross-engine exactness: the log terms quantize to DECIMAL(18,8); their sums (and
   * sums of their DECIMAL products — precision 38 is not exceeded at k ≤ 10⁶) are exact,
   * cast to double identically, and every derived statistic is the same fixed
   * operand-order expression chain in both engines, so slope/intercept/R² match
   * bit-for-bit before the final 6dp round.
   */
  def zipfFit(df: DataFrame, topK: Int = 1000, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = df.select(explode(tokensCol(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val top = freq.orderBy(col("cnt").desc, col("token").asc).limit(topK)
      .withColumn("r", row_number().over(Window.orderBy(col("cnt").desc, col("token").asc)))
    val q = top.select(
      log(10.0, col("r").cast("double")).cast(DecimalType(18, 8)).as("x"),
      log(10.0, col("cnt").cast("double")).cast(DecimalType(18, 8)).as("y"))
    val s = q.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    val n = col("n").cast("double")
    val num = n * col("sxy") - col("sx") * col("sy")
    val denX = n * col("sxx") - col("sx") * col("sx")
    val denY = n * col("syy") - col("sy") * col("sy")
    val slope = num / denX
    s.select(col("n").as("n_ranks"),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / n, 6).as("intercept"),
      round(num * num / (denX * denY), 6).as("r2"))
  }

  /**
   * Jensen–Shannon divergence between per-source unigram distributions — the
   * distribution-shift detector a mixture pipeline runs before re-weighting sources
   * (JSD is symmetric, bounded by ln 2 in nats, and defined even where supports
   * differ, unlike raw KL). For each requested source pair:
   * JSD = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q)), zero-termed where a side is absent.
   *
   * Scale shape: ONE corpus-sized exchange builds the (source, token) counts; every
   * pair join afterwards is vocabulary-sized (and skew-free — token is the key). Each
   * per-token term is computed in a FIXED operand order and quantized to
   * DECIMAL(18,12) before the sum, so the aggregate is fp-order-free and the final
   * figure reproduces bit-for-bit cross-engine (the unigram-logprob discipline).
   */
  def jsDivergence(df: DataFrame, pairs: Seq[(String, String)],
      textCol: String = "text", srcCol: String = "source"): DataFrame = {
    val cnt = df.select(col(srcCol).as("src"), explode(tokensCol(col(textCol))).as("token"))
      .groupBy(col("src"), col("token")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("src")).agg(sum(col("c")).as("n"))
    val freq = cnt.join(tot, "src")
      .select(col("src"), col("token"), (col("c").cast("double") / col("n")).as("p"))
    val dec12 = DecimalType(18, 12)
    val perPair = pairs.map { case (a, b) =>
      val fa = freq.filter(col("src") === a).select(col("token"), col("p").as("pa"))
      val fb = freq.filter(col("src") === b).select(col("token"), col("p").as("pb"))
      val j = fa.join(fb, Seq("token"), "full_outer")
        .select(coalesce(col("pa"), lit(0.0)).as("pa"), coalesce(col("pb"), lit(0.0)).as("pb"))
      val den = col("pa") + col("pb")
      val termA = when(col("pa") > 0,
        (col("pa") * log((col("pa") * 2) / den)).cast(dec12)).otherwise(lit(0).cast(dec12))
      val termB = when(col("pb") > 0,
        (col("pb") * log((col("pb") * 2) / den)).cast(dec12)).otherwise(lit(0).cast(dec12))
      j.agg(
          count(when(col("pa") > 0 && col("pb") > 0, 1)).as("n_common"),
          sum(termA).as("sa"), sum(termB).as("sb"))
        .select(lit(a).as("src_a"), lit(b).as("src_b"), col("n_common"),
          round((col("sa") + col("sb")).cast("double") / 2, 8).as("jsd_nats"))
    }
    perPair.reduce(_ unionAll _)
  }

  /**
   * Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β — distinct vocabulary size as a
   * function of cumulative corpus tokens, the companion diagnostic to [[zipfFit]]
   * (natural corpora grow with β ≈ 0.4–0.6; duplicated corpora flatten β toward 0,
   * synthetic/noisy ones push it toward 1 — so β is a dedup-health signal at the corpus
   * level). Observation points come from `nCkpts` doc-id-ordered checkpoints; the log-log
   * least-squares machinery is [[zipfFit]]'s, with the same DECIMAL(18,8) quantization.
   *
   * Scale shape: no running "distinct so far" is ever computed per prefix — a token's
   * first occurrence (min doc_id per token) is a single corpus-sized aggregation, after
   * which cumulative types per checkpoint is a cumulative sum over `nCkpts` bucket rows
   * (bounded state); cumulative tokens likewise from per-doc token counts. Two
   * exchanges total (token min-doc, bucket rollup), both carrying tiny rows.
   */
  def heapsFit(df: DataFrame, nCkpts: Int = 10, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = df.agg(max(col(idCol)).as("__mx"))
    // bucket i = docs with doc_id in (mx*i/n, mx*(i+1)/n] — integer `div` (not `/`,
    // which is fractional in both engines) so both engines bucket identically
    def bucket(c: Column) = least(lit((nCkpts - 1).toLong),
      call_function("div", c.cast("long") * nCkpts, col("__mx") + 1)).cast("long")
    val toks = df.select(col(idCol), explode(tokensCol(col(textCol))).as("token"))
    val firstSeen = toks.groupBy(col("token")).agg(min(col(idCol)).as("__fd"))
    val typesPerB = firstSeen.crossJoin(broadcast(mx))
      .groupBy(bucket(col("__fd")).as("b")).agg(count(lit(1)).as("nt"))
    val tokensPerB = df.select(col(idCol), size(tokensCol(col(textCol))).cast("long").as("ntok"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket(col(idCol)).as("b")).agg(sum(col("ntok")).as("nw"))
    val w = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = typesPerB.join(tokensPerB, Seq("b"), "full_outer")
      .select(col("b"), coalesce(col("nt"), lit(0L)).as("nt"), coalesce(col("nw"), lit(0L)).as("nw"))
      .select(col("b"), sum(col("nt")).over(w).as("cum_types"), sum(col("nw")).over(w).as("cum_tokens"))
      .filter(col("cum_types") > 0 && col("cum_tokens") > 0)
    val q = pts.select(
      log(10.0, col("cum_tokens").cast("double")).cast(DecimalType(18, 8)).as("x"),
      log(10.0, col("cum_types").cast("double")).cast(DecimalType(18, 8)).as("y"))
    val s = q.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    val n = col("n").cast("double")
    val num = n * col("sxy") - col("sx") * col("sy")
    val denX = n * col("sxx") - col("sx") * col("sx")
    val denY = n * col("syy") - col("sy") * col("sy")
    // a SATURATED vocabulary (every checkpoint sees the same V) is a legitimate input —
    // y is constant, denY = 0: beta/r2 are 0 by convention, not a divide-by-zero
    val slope = when(col("sxy").isNull || denX === 0.0, lit(0.0)).otherwise(num / denX)
    s.select(col("n").as("n_ckpts"),
      round(slope, 6).as("beta"),
      round((col("sy") - slope * col("sx")) / n, 6).as("log10_k"),
      round(when(denX === 0.0 || denY === 0.0, lit(0.0))
        .otherwise(num * num / (denX * denY)), 6).as("r2"))
  }

  /**
   * The Gopher quality-rule table (Rae et al. 2021, "Scaling Language Models: ...
   * Gopher", table A1 — the rule set Dolma/RedPajama/FineWeb re-implement): per
   * document, each heuristic gets its own boolean column plus the measured signal, and
   * `pass` is their conjunction — pipelines keep the flags, not just the verdict, so a
   * threshold change is a re-filter, not a re-scan. Rules over tokenized words: count
   * bounds, mean word length band, alphabetic-word fraction, stopword-occurrence
   * minimum; over raw text: #/ellipsis symbol-to-word ratio; repetition: top-bigram
   * occurrence fraction (adaptation of Gopher's top-2-gram character share — the
   * count-based measure [[repetitionScore]] already gates).
   *
   * Exactness: every ratio is one IEEE division of two integers, rounded to 4dp, and
   * rules compare the ROUNDED value — both engines see identical bits, so no boolean
   * can flip on a ulp. Scale shape: tokens materialize once behind the Generate
   * barrier, everything else is a narrow map — zero shuffle, embarrassingly parallel.
   */
  def gopherRules(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2, maxTopBigramFrac: Double = 0.18): DataFrame = {
    val base = df.select(col(idCol), col(textCol).as("__t"),
      explode(array(tokensCol(col(textCol)))).as("__toks"))
      .select(col(idCol), col("__t"), col("__toks"),
        explode(array(TextFunctions.textSignals(col("__toks"), Stopwords))).as("__sig"))
    val n = col("__sig.n_tokens")
    val nD = n.cast("double")
    val mwl = when(n > 0, round(expr(
      "aggregate(__toks, 0L, (a, x) -> a + length(x))").cast("double") / nD, 4)).otherwise(0.0)
    val alphaFrac = when(n > 0, round(
      size(expr("filter(__toks, x -> x rlike '\\\\p{L}')")).cast("double") / nD, 4)).otherwise(0.0)
    val nSymbols = (length(col("__t")) - length(regexp_replace(col("__t"), "#", ""))) +
      ((length(col("__t")) - length(regexp_replace(col("__t"), "\\.\\.\\.", ""))) / 3)
    val symbolRatio = when(n > 0, round(nSymbols.cast("double") / nD, 4)).otherwise(0.0)
    val bigramFrac = when(n > 1,
      round(col("__sig.top_bigram_n").cast("double") / (n - 1).cast("double"), 4)).otherwise(0.0)
    base.select(col(idCol), n.as("n_words"), mwl.as("mean_word_len"),
        alphaFrac.as("alpha_frac"), symbolRatio.as("symbol_ratio"),
        col("__sig.n_stop").as("n_stop"), bigramFrac.as("top_bigram_frac"))
      .withColumn("wc_ok", col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("mwl_ok",
        col("mean_word_len") >= minMeanWordLen && col("mean_word_len") <= maxMeanWordLen)
      .withColumn("alpha_ok", col("alpha_frac") >= minAlphaFrac)
      .withColumn("symbol_ok", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("stop_ok", col("n_stop") >= minStopHits)
      .withColumn("bigram_ok", col("top_bigram_frac") <= maxTopBigramFrac)
      .withColumn("pass", col("wc_ok") && col("mwl_ok") && col("alpha_ok") &&
        col("symbol_ok") && col("stop_ok") && col("bigram_ok"))
  }

  /**
   * Multinomial Naive Bayes text classifier, trained AND applied distributed — the
   * classic cheap corpus-labeling pass (fastText-style quality/language filters score
   * billions of docs with models of exactly this shape). Training is one (label, token)
   * count aggregation; scoring joins the complete vocab×label log-probability grid onto
   * per-doc token counts. Laplace-smoothed: `P(tok|l) = (c(l,tok)+1)/(total_l+V)` —
   * building the grid with a LEFT join is what gives unseen-WITHIN-class tokens their
   * `1/(total_l+V)` floor (an inner join on per-class counts silently skews every class
   * the token never appeared in). Out-of-vocabulary test tokens contribute to no class
   * (both engines drop them in the same inner probe join); a test doc with zero
   * in-vocab tokens is therefore absent from the output — at corpus scale those are
   * noise rows a real pipeline drops anyway.
   *
   * Cross-engine exactness: every log10 term and the prior quantize to DECIMAL(18,8)
   * before summation (the [[bigramLogprob]] discipline), so scores are exact decimal
   * sums and the argmax (highest score, ties to the lexicographically smallest label)
   * replays identically in SQL.
   *
   * Scale shape: the corpus-sized exchanges are the training count and the per-doc
   * token count, both with map-side partial aggregation; the lp grid is V×L rows
   * (vocab-bounded, broadcast here; switch the probe to a shuffle join past broadcast
   * size) and the per-(doc,label) score aggregation carries L rows per distinct test
   * (doc, token). Output: (doc_id, <labelCol>, pred_label, correct).
   */
  def naiveBayesClassify(train: DataFrame, test: DataFrame, labelCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val trTok = train.select(col(labelCol).as("label"),
      explode(tokensCol(col(textCol))).as("token"))
    val freq = trTok.groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val totals = freq.groupBy("label").agg(sum(col("cnt")).as("tot"))
    val vocab = freq.agg(countDistinct(col("token")).as("v"))
    val priors = train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("nd"))
    val priorLp = priors.crossJoin(broadcast(priors.agg(sum(col("nd")).as("ndt"))))
      .select(col("label"), log(10.0, col("nd").cast("double") / col("ndt"))
        .cast(DecimalType(18, 8)).as("plp"))
    val lp = freq.select(col("token")).distinct()
      .crossJoin(broadcast(totals.crossJoin(vocab)))
      .join(freq, Seq("label", "token"), "left")
      .select(col("token"), col("label"),
        log(10.0, (coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("tot") + col("v")).cast("double")).cast(DecimalType(18, 8)).as("lp"))
    val teTok = test.select(col(idCol), col(labelCol),
        explode(tokensCol(col(textCol))).as("token"))
      .groupBy(col(idCol), col(labelCol), col("token")).agg(count(lit(1)).as("k"))
    teTok.join(broadcast(lp), "token")
      .groupBy(col(idCol), col(labelCol), col("label"))
      .agg(sum(col("k").cast(DecimalType(10, 0)) * col("lp")).as("s"))
      .join(broadcast(priorLp), "label")
      .groupBy(col(idCol), col(labelCol))
      .agg(min(struct((-(col("s") + col("plp"))).as("ns"), col("label").as("pl"))).as("b"))
      .select(col(idCol), col(labelCol), col("b.pl").as("pred_label"),
        (col("b.pl") === col(labelCol)).as("correct"))
  }

  /**
   * Per-token burstiness profile (Church & Gale 1995): how CLUMPED is each token's
   * usage across documents? Two standard statistics per token with `tf >= minTf`:
   *
   *  - `burst` = tf / df — mean occurrences per CONTAINING document (1.0 = the token
   *    never repeats within a doc; high = it clusters in few docs — a topical or
   *    boilerplate marker, where content words burst and function words don't);
   *  - `vmr` — variance-to-mean ratio of the per-document count over ALL N docs
   *    (zeros included): Poisson scatter gives vmr ≈ 1, bursty tokens ≫ 1. Computed
   *    DIVISION-FREE from integer moments: vmr = (N·Σc² − tf²) / (N·tf), so both
   *    engines agree to the bit before the one rounded double division.
   *
   * Scale shape: the (doc, token) count aggregation partial-combines map-side (a doc's
   * tokens co-locate in its row) and is the ONLY corpus-sized exchange; the token-level
   * moment fold runs off that table (vocabulary-sized) and the N scalar broadcasts.
   */
  def burstiness(df: DataFrame, minTf: Long = 5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tf = df.select(col(idCol), explode(tokensCol(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("c"))
    val nDocs = df.select(countDistinct(col(idCol)).as("__n"))
    tf.groupBy(col("token"))
      .agg(sum(col("c")).cast("long").as("tf"), count(lit(1)).as("df"),
        sum(col("c") * col("c")).cast("long").as("__sc2"))
      .filter(col("tf") >= minTf)
      .crossJoin(broadcast(nDocs))
      .select(col("token"), col("tf"), col("df"),
        round(col("tf").cast("double") / col("df"), 6).as("burst"),
        round((col("__n") * col("__sc2") - col("tf") * col("tf")).cast("double")
          / (col("__n") * col("tf")), 6).as("vmr"))
  }

  /**
   * Distinct-n diversity per source (the distinct-1/distinct-2 metric of Li et al.
   * 2016): fraction of unigram and bigram OCCURRENCES that are unique types — the
   * standard repetitiveness/diversity rollup for a corpus slice (templated or
   * model-generated text collapses distinct-2 long before distinct-1 moves).
   *
   * ONE corpus pass: unigrams and bigrams unify into a single (n, gram) stream via a
   * narrow `transform`+`concat` map (no posexplode/window), so one exchange keyed
   * (source, n, gram) — partial-combined map-side — feeds a source×n-sized fold.
   * All counts are exact LONGs; the two ratios are single rounded double divisions.
   */
  def distinctNgrams(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val grams = df.select(col(sourceCol), tokensCol(col(textCol)).as("__l"))
      .select(col(sourceCol), explode(concat(
        expr("transform(__l, w -> struct(1 AS n, w AS g))"),
        // the ELSE branch must be a TYPED empty array<struct<n,g>> — slice of a
        // same-typed array is the cheapest way to spell one
        expr("CASE WHEN size(__l) >= 2 THEN transform(sequence(1, size(__l) - 1), " +
          "i -> struct(2 AS n, concat(element_at(__l, i), ' ', element_at(__l, i + 1)) AS g)) " +
          "ELSE slice(transform(__l, w -> struct(2 AS n, w AS g)), 1, 0) END"))).as("ng"))
      .select(col(sourceCol), col("ng.n").as("n"), col("ng.g").as("g"))
    grams.groupBy(col(sourceCol), col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(sourceCol), col("n"))
      .agg(sum(col("c")).cast("long").as("occ"), count(lit(1)).as("types"))
      .groupBy(col(sourceCol))
      .agg(sum(when(col("n") === 1, col("occ"))).cast("long").as("n_unigrams"),
        sum(when(col("n") === 1, col("types"))).cast("long").as("d1_types"),
        sum(when(col("n") === 2, col("occ"))).cast("long").as("n_bigrams"),
        sum(when(col("n") === 2, col("types"))).cast("long").as("d2_types"))
      .select(col(sourceCol), col("n_unigrams"), col("d1_types"),
        round(col("d1_types").cast("double") / col("n_unigrams"), 6).as("distinct1"),
        col("n_bigrams"), col("d2_types"),
        round(col("d2_types").cast("double") / col("n_bigrams"), 6).as("distinct2"))
  }

  /**
   * Exact n-gram novelty / decontamination audit — the "13-gram overlap" screen of the
   * GPT-3/PaLM data cards (Brown et al. 2020 App. C), with n sized to this corpus's
   * short documents: per source, the fraction of its DISTINCT n-grams that never occur
   * in the REFERENCE slice (the held-out/eval corpus). novelty_rate ≈ 1 means the
   * source is clean of the reference; the refSource's own row pins 0 as an invariant.
   *
   * Scale: the only wide ops are one distinct over (source, gram) and a LEFT SEMI
   * probe of the reference gram set — both shuffle short gram strings (production
   * would xxh64 them; the string form stays oracle-replayable), never documents.
   */
  def ngramNovelty(df: DataFrame, refSource: String = "src0", n: Int = 3,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(n >= 1)
    val grams = df.select(col(sourceCol), tokensCol(col(textCol)).as("__l"))
      .select(col(sourceCol), explode(expr(
        s"CASE WHEN size(__l) >= $n THEN transform(sequence(1, size(__l) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(__l, i, $n))) " +
          "ELSE slice(transform(__l, w -> w), 1, 0) END")).as("g"))
      .distinct()
    val ref = grams.filter(col(sourceCol) === refSource).select(col("g"))
    val seen = grams.join(ref, Seq("g"), "left_semi")
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_seen_in_ref"))
    grams.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_ngrams"))
      .join(seen, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_ngrams"),
        coalesce(col("n_seen_in_ref"), lit(0L)).as("n_seen_in_ref"),
        round(lit(1.0) - coalesce(col("n_seen_in_ref"), lit(0L)).cast("double")
          / col("n_ngrams"), 6).as("novelty_rate"))
  }

  /**
   * "Fightin' words" (Monroe, Colaresi & Quinn 2008): per-token log-odds-ratio of a
   * TARGET slice against the rest of the corpus, with a Dirichlet prior and a z-score
   * that penalizes rare-token noise — the principled over-representation detector a
   * pipeline runs to characterize a source (or catch spam/contamination signatures)
   * where raw frequency ratios explode on singletons.
   *
   *   δ_t = log10((y1+α)/(n1+α0−y1−α)) − log10((y2+α)/(n2+α0−y2−α)),
   *   σ²_t ≈ 1/(y1+α) + 1/(y2+α),   z_t = δ_t/√σ²_t,   α = 0.5, α0 = α·V.
   *
   * Float discipline: α = 0.5 keeps every operand exact in binary (integer + half);
   * the two ratios and two variance terms are single IEEE divisions in fixed operand
   * order; z quantizes to DECIMAL(18,8) BEFORE the rank so libm log10 ulp differences
   * cannot flip cross-engine order (the [[tfidfTopK]] rule). Scale shape: one
   * corpus-sized exchange to (is_target, token) counts — map-side combined — then
   * everything is vocabulary-sized with broadcast scalars.
   */
  def fightinWords(df: DataFrame, targetSource: String, topK: Int = 20,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = df.select((col(sourceCol) === targetSource).as("t"),
        explode(tokensCol(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("t"), 1L).otherwise(0L)).as("y1"),
        sum(when(col("t"), 0L).otherwise(1L)).as("y2"))
    val tot = cnt.agg(sum(col("y1")).cast("long").as("n1"),
      sum(col("y2")).cast("long").as("n2"), count(lit(1)).as("v"))
    val a = lit(0.5)
    val a0 = col("v").cast("double") * 0.5
    val delta =
      log(10.0, (col("y1") + a) / (col("n1") + a0 - col("y1") - a)) -
        log(10.0, (col("y2") + a) / (col("n2") + a0 - col("y2") - a))
    val z = delta / sqrt(lit(1.0) / (col("y1") + a) + lit(1.0) / (col("y2") + a))
    val scored = cnt.crossJoin(broadcast(tot))
      .select(col("token"), col("y1"), col("y2"),
        delta.cast(DecimalType(18, 8)).as("__d"), z.cast(DecimalType(18, 8)).as("__z"))
    scored
      .withColumn("rank", row_number().over(Window.orderBy(col("__z").desc, col("token").asc)))
      .filter(col("rank") <= topK)
      .select(col("token"), col("y1"), col("y2"),
        round(col("__d").cast("double"), 6).as("log_odds"),
        round(col("__z").cast("double"), 6).as("zscore"), col("rank"))
  }

}
