package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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
}
