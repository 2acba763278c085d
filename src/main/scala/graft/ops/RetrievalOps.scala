package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.functions.TopKFunctions

/**
 * Retrieval-stack composition operators. The lexical ([[TextOps.bm25TopK]]) and semantic
 * ([[VectorOps]] ANN family) halves exist as standalone operators; production retrieval
 * serves their FUSION — here Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009):
 * `score(d) = Σ_lists 1/(rrfK + rank_list(d))`, the standard parameter-free fusion that
 * needs no score calibration between BM25 and cosine space.
 */
object RetrievalOps {

  /**
   * Hybrid lexical+semantic top-k: each query carries a text (BM25 side) and a query
   * vector id (ANN side); both sides retrieve their `kPer` best, and the union re-ranks
   * by the RRF sum — a document found by only one list scores on that list alone.
   *
   * 100 TB shape: both inputs are already bounded-heap top-`kPer` retrievals (≤ kPer
   * rows per query cross any exchange), so the fusion joins two tiny ranked lists —
   * windows and the full-outer join touch `|queries| · kPer` rows, nothing corpus-sized.
   * Rank arithmetic is integer + one double division, bit-identical across engines; the
   * BM25 ranks inherit the DECIMAL(18,8)-quantized score discipline of the underlying
   * operator.
   *
   * @param queries (query_id, query_text, query_vec_id) — the vector resolves from `emb`
   * @return (query_id, idCol, rrf_score, fused_rank), best-first per query
   */
  def hybridRrfTopK(
      docs: DataFrame,
      emb: DataFrame,
      queries: Seq[(String, String, Long)],
      k: Int = 5,
      kPer: Int = 10,
      rrfK: Int = 60,
      textCol: String = "text",
      idCol: String = "doc_id",
      vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(queries.nonEmpty)
    require(queries.map(_._1).distinct.size == queries.size, "duplicate query ids")
    val spark = docs.sparkSession
    import spark.implicits._

    val lex = TextOps.bm25TopK(docs, queries.map(q => (q._1, q._2)), kPer,
      textCol = textCol, idCol = idCol)
    val wLex = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol).asc)
    val lexR = lex.select(col("query_id").as("qid"), col(idCol),
      row_number().over(wLex).as("lex_rank"))

    val qmap = broadcast(queries.map(q => (q._1, q._3)).toDF("qid", "qvec_id"))
    // DISTINCT query vectors: two queries may share one — the ANN runs once per vector
    // and the qmap re-join below fans its ranked list out to every query using it
    // (duplicate qvecs rows would instead double every heap entry, halving ANN depth)
    val qvecs = emb.join(qmap.select("qvec_id").distinct(), col(vecIdCol) === col("qvec_id"))
      .select(col(vecIdCol), col(vecCol))
    val ann = VectorOps.bruteForceTopK(emb, qvecs, kPer, idCol = vecIdCol, vecCol = vecCol)
    val wAnn = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("neighbor_id").asc)
    val annR = ann.join(qmap, col("query_id") === col("qvec_id"))
      .select(col("qid"), col("neighbor_id").as(idCol), row_number().over(wAnn).as("ann_rank"))

    val rrf =
      coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("ann_rank")), lit(0.0))
    lexR.join(annR, Seq("qid", idCol), "full_outer")
      .select(col("qid").as("query_id"), col(idCol), rrf.as("rrf"))
      .groupBy(col("query_id"))
      .agg(TopKFunctions.topKByScore(col("rrf"), col(idCol),
        struct(col(idCol), col("rrf")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col(s"t.$idCol").as(idCol),
        round(col("t.rrf"), 6).as("rrf_score"),
        (col("pos") + lit(1L)).cast("long").as("fused_rank"))
  }

  /** NDCG position discounts `1/log2(rank+1)` for ranks 1..10 as FIXED decimal
    * constants — the literal table is shared with the oracle SQL, so the whole metric
    * is exact decimal arithmetic with zero libm calls to disagree across engines. */
  private[graft] val NdcgDiscounts: Seq[String] = Seq(
    "1.00000000", "0.63092975", "0.50000000", "0.43067656", "0.38685281",
    "0.35620719", "0.33333333", "0.31546488", "0.30103000", "0.28906483")

  /**
   * NDCG@k retrieval evaluation of the BM25 ranking (Järvelin & Kekäläinen 2002) — the
   * eval half of the retrieval stack: a pipeline that tunes retrieval needs the metric
   * computed IN the engine, over the same corpus it retrieves from. Graded relevance is
   * derived deterministically from the data (rel(d,q) = |distinct query terms present
   * in d|, 0..|terms|), DCG uses the fixed [[NdcgDiscounts]] table, and IDCG ranks the
   * FULL corpus by relevance (bounded heap), so ndcg < 1 whenever BM25's tf/length
   * weighting disagrees with raw term coverage.
   *
   * Scale: the ranked list is |queries|·k rows (window over it is free); the ideal side
   * is one broadcast-queries scan of the corpus into a k-bounded heap per query — no
   * corpus shuffle anywhere; every sum is exact DECIMAL(18,8).
   */
  def ndcgAtK(
      docs: DataFrame,
      queries: Seq[(String, String)],
      k: Int = 10,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k <= NdcgDiscounts.length, s"discount table covers ranks 1..${NdcgDiscounts.length}")
    val spark = docs.sparkSession
    import spark.implicits._
    val discount = array(NdcgDiscounts.map(d =>
      lit(new java.math.BigDecimal(d)).cast(DecimalType(18, 8))): _*)

    val q = broadcast(queries.toDF("query_id", "query_text")
      .select(col("query_id"), array_distinct(TextOps.tokensCol(col("query_text"))).as("qterms")))
    val rel = size(array_intersect(array_distinct(TextOps.tokensCol(col(textCol))),
      col("qterms")))

    // realized DCG: rank the BM25 top-k (tiny: |queries|*k rows) and join its docs' text
    val ranked = TextOps.bm25TopK(docs, queries, k, textCol = textCol, idCol = idCol)
    val wR = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol).asc)
    val dcg = ranked
      .withColumn("rank", row_number().over(wR))
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .join(q, Seq("query_id"))
      .groupBy(col("query_id"))
      .agg(sum((rel.cast(DecimalType(18, 8)) * element_at(discount, col("rank")))
        .cast(DecimalType(18, 8))).as("__dcg"))

    // ideal DCG: best-possible rel ordering over the WHOLE corpus, k-bounded heap
    val idcg = docs.select(col(idCol), col(textCol)).crossJoin(q)
      .select(col("query_id"), col(idCol), rel.cast("double").as("__rel"))
      .groupBy(col("query_id"))
      .agg(TopKFunctions.topKByScore(col("__rel"), col(idCol),
        struct(col("__rel")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .groupBy(col("query_id"))
      .agg(sum((col("t.__rel").cast(DecimalType(18, 8)) *
        element_at(discount, (col("pos") + 1).cast("int")))
        .cast(DecimalType(18, 8))).as("__idcg"))

    dcg.join(idcg, Seq("query_id"))
      .select(col("query_id"),
        col("__dcg").cast(DoubleType).as("dcg"),
        col("__idcg").cast(DoubleType).as("idcg"),
        when(col("__idcg") > 0,
          round(col("__dcg").cast(DoubleType) / col("__idcg").cast(DoubleType), 4))
          .otherwise(0.0).as("ndcg"))
  }

  /**
   * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR 1998) — the
   * diversification half of the retrieval stack: greedy selection of
   * `argmax λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s)` over the ANN candidate pool, so
   * near-duplicate hits don't crowd the top-k (the failure mode a deduplicated
   * training-retrieval loop hits first). The first pick is pure relevance.
   *
   * 100 TB shape: the candidate pool is an ANN retrieval (`kPer` per query — swap
   * [[VectorOps.bruteForceTopK]] for `ivfTopK` at corpus scale, the hardNegatives
   * note), so everything here is query-bounded: the candidate-pair similarity table
   * is |queries|·kPer² rows, and each greedy step is one join + one bounded window.
   * The k-step loop is a DRIVER loop over k-bounded frames (localCheckpointed —
   * chained plans would otherwise re-run the ANN per step), never a corpus
   * iteration.
   *
   * Cross-engine determinism: λ enters as `lambdaE1/10.0` and the penalty weight as
   * `(10−lambdaE1)/10.0` — both correctly-rounded divisions, bit-identical to the
   * decimal literals the oracle writes (computing `1−λ` instead would yield
   * 0.30000000000000004 ≠ the literal 0.3 and could flip a selection). Ties break
   * on the candidate id ascending at every step.
   *
   * @return (query_id, idCol, mmr_rank) — k rows per query, best-first
   */
  def mmrRerank(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      kPer: Int = 10,
      lambdaE1: Int = 7,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && kPer >= k && lambdaE1 >= 0 && lambdaE1 <= 10)
    val lam = lambdaE1 / 10.0
    val mu = (10 - lambdaE1) / 10.0
    val cands = VectorOps.bruteForceTopK(corpus, queries, kPer, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id").as("d"), col("sim").as("rel"))
      .localCheckpoint(true)
    val ps = cands.select(col("query_id"), col("d").as("d1"))
      .join(corpus.select(col(idCol).as("d1"), col(vecCol).as("v1")), "d1")
      .join(cands.select(col("query_id"), col("d").as("d2"))
        .join(corpus.select(col(idCol).as("d2"), col(vecCol).as("v2")), "d2"),
        Seq("query_id"))
      .filter(col("d1") =!= col("d2"))
      .select(col("query_id"), col("d1"), col("d2"),
        graft.functions.VectorFunctions.cosine(col("v1"), col("v2")).as("s"))
      .localCheckpoint(true)
    val w1 = Window.partitionBy(col("query_id")).orderBy(col("rel").desc, col("d").asc)
    var selected = cands
      .withColumn("__rn", row_number().over(w1)).filter(col("__rn") === 1)
      .select(col("query_id"), col("d"), lit(1).as("mmr_rank"))
      .localCheckpoint(true)
    for (step <- 2 to k) {
      val rem = cands.join(selected.select(col("query_id"), col("d")),
        Seq("query_id", "d"), "left_anti")
      val pen = ps
        .join(selected.select(col("query_id"), col("d").as("d2")), Seq("query_id", "d2"))
        .groupBy(col("query_id"), col("d1").as("d")).agg(max(col("s")).as("pen"))
      val scored = rem.join(pen, Seq("query_id", "d"))
        .withColumn("__sc", lit(lam) * col("rel") - lit(mu) * col("pen"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("__sc").desc, col("d").asc)
      selected = selected.unionByName(
          scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
            .select(col("query_id"), col("d"), lit(step).as("mmr_rank")))
        .localCheckpoint(true)
    }
    selected.select(col("query_id"), col("d").as(idCol), col("mmr_rank"))
  }
}
