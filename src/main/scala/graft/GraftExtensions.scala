package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.TextExpressions._
import graft.functions.VectorExpressions._
import graft.functions.{LatestStruct, TopKByScore}

/**
 * SQL surface for graft's native expressions. Two registration paths:
 *  - config: `--conf spark.sql.extensions=graft.GraftExtensions` (injected at session build)
 *  - runtime: `GraftExtensions.register(spark)` on a live session.
 *
 * The reference exposes no UDF surface (SURVEY §2.8); these are the operators Spark itself
 * lacks, exposed so `spark.sql` users get the same capabilities as the DataFrame API.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot"     -> (es => DotProduct(es(0), es(1))),
    "graft_cosine"  -> (es => CosineSimilarity(es(0), es(1))),
    "graft_l2norm"  -> (es => L2Norm(es(0))),
    "graft_shingle_hashes" -> (es => ShingleHashes(es(0), intArg(es(1), "n"))),
    "graft_minhash" -> (es => MinHashSignatureLong(es(0), intArg(es(1), "k"))),
    "graft_band_hashes" -> (es => BandHashesExpr(es(0), intArg(es(1), "bands"))),
    "graft_min_k_hashes" -> (es => MinKHashesLong(es(0), intArg(es(1), "k"))),
    "graft_simhash" -> (es => SimHash64(es(0))),
    "graft_nfc"     -> (es => NfcNormalize(es(0))),
    // one-pass per-doc token statistics struct (n_tokens, n_distinct, n_stop,
    // top_bigram_n) with the library's standard stopword set
    "graft_text_signals" -> (es => TextSignals(es(0), graft.ops.TextOps.Stopwords)),
    "graft_deflate_ratio" -> (es => DeflateRatio(es(0))),
    // round-6 additions: the one-pass winnowing kernel and the zero-shuffle entropy
    // signals, so SQL callers get the same scale forms as the DataFrame API
    "graft_winnowing" -> (es =>
      WinnowingFingerprints(es(0), intArg(es(1), "n"), intArg(es(2), "w"))),
    "graft_token_entropy" -> (es => TokenEntropySignals(es(0))),
    // round-7 addition: Jaro-Winkler similarity (DuckDB-parity semantics) for
    // entity-resolution blocking joins from SQL
    "graft_jaro_winkler" -> (es => JaroWinklerSim(es(0), es(1))),
    // round-10 addition: Gear/FastCDC content-defined chunking over BINARY — SQL
    // callers explode the struct array and groupBy hash for byte-grain dedup
    "graft_gear_chunks" -> (es => GearChunks(es(0),
      intArg(es(1), "minLen"), intArg(es(2), "maskBits"), intArg(es(3), "maxLen"))),
    // round-10 session-2 additions: Hilbert layout index for SQL-side clustering
    // writes, and the Frequent Directions matrix sketch aggregate
    "graft_hilbert_index" -> (es =>
      graft.functions.LayoutExpressions.HilbertIndex(
        Cast(es(0), LongType), Cast(es(1), LongType), intArg(es(2), "bits"))),
    "graft_fd_sketch" -> (es =>
      graft.functions.FdExpressions.FdSketchAgg(es(0), intArg(es(1), "l"))
        .toAggregateExpression()),
    // numeric order/score/tiebreak args are widened here so SQL callers can pass INT/FLOAT
    // columns; the aggregates themselves then type-check strictly at analysis
    "graft_latest_struct" -> (es =>
      LatestStruct(Cast(es(0), LongType), es(1)).toAggregateExpression()),
    "graft_top_k" -> (es =>
      TopKByScore(Cast(es(0), DoubleType), Cast(es(1), LongType), es(2), intArg(es(3), "k"))
        .toAggregateExpression()))

  /** Runtime registration on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
