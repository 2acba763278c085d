package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet persistence for every trained model the vector operators consume — the
 * artifact registry that separates OFFLINE training from steady-state probing at scale.
 * A 100 TB pipeline trains k-means centroids / PQ codebooks / SQ ranges / PCA bases on
 * a sample once, writes the artifact next to the data, and every later run (and every
 * other cluster) feeds it back through the operators' `trained` params without touching
 * the corpus — the same contract [[BpeOps.saveModel]] and the bucketed dedup/signature
 * indexes already follow.
 *
 * One uniform schema for all model kinds: `(kind, idx, sub, vec, scalar)` — each row a
 * component vector or scalar, `coalesce(1)` because models are KB-sized driver scalars.
 * Load paths reconstruct arrays in (sub, idx) order, so a round-trip is bit-exact.
 */
object ModelStore {

  /** k-means / IVF centroids: rows (idx, vec). */
  def saveCentroids(spark: SparkSession, centroids: Array[Array[Float]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("idx", "vec").coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadCentroids(spark: SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(path).orderBy("idx")
      .collect().map(_.getSeq[Float](1).toArray)

  /** PQ codebooks: rows (sub, code, vec) — subspace-major like the trainer emits. */
  def savePqBooks(spark: SparkSession, books: Array[Array[Array[Float]]], path: String): Unit = {
    import spark.implicits._
    (for ((book, s) <- books.zipWithIndex; (v, c) <- book.zipWithIndex)
      yield (s, c, v.toSeq)).toSeq
      .toDF("sub", "code", "vec").coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPqBooks(spark: SparkSession, path: String): Array[Array[Array[Float]]] =
    spark.read.parquet(path).orderBy("sub", "code").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray).toArray).toArray

  /** Two-level residual-quantization codebook pair ([[VectorOps.rqFit]]'s artifact):
    * the PQ-book schema with a leading level column — rows (lvl, sub, code, vec). */
  def saveRqBooks(spark: SparkSession,
      books: (Array[Array[Array[Float]]], Array[Array[Array[Float]]]),
      path: String): Unit = {
    import spark.implicits._
    Seq(books._1, books._2).zipWithIndex.flatMap { case (level, l) =>
      level.zipWithIndex.toSeq.flatMap { case (book, s) =>
        book.zipWithIndex.toSeq.map { case (v, c) => (l, s, c, v.toSeq) }
      }
    }.toDF("lvl", "sub", "code", "vec").coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadRqBooks(spark: SparkSession, path: String)
      : (Array[Array[Array[Float]]], Array[Array[Array[Float]]]) = {
    val byLvl = spark.read.parquet(path).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getInt(2)).map(_.getSeq[Float](3).toArray).toArray).toArray)
    require(byLvl.length == 2, s"RQ artifact at $path must hold 2 levels, found ${byLvl.length}")
    (byLvl(0), byLvl(1))
  }

  /** SQ8 per-dimension ranges: rows (pos, mn, mx). */
  def saveSqModel(spark: SparkSession, model: VectorOps.SqModel, path: String): Unit = {
    import spark.implicits._
    model.mins.indices.map(i => (i, model.mins(i), model.maxs(i))).toSeq
      .toDF("pos", "mn", "mx").coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadSqModel(spark: SparkSession, path: String): VectorOps.SqModel = {
    val rows = spark.read.parquet(path).orderBy("pos").collect()
    VectorOps.SqModel(rows.map(_.getFloat(1)), rows.map(_.getFloat(2)))
  }

  /** PCA model: the mean row (kind 'mean'), one row per basis component (kind 'basis',
    * carrying its eigenvalue) — eigen-order preserved via idx. */
  def savePcaModel(spark: SparkSession, model: VectorOps.PcaModel, path: String): Unit = {
    import spark.implicits._
    val rows = ("mean", -1, model.mean.toSeq, 0.0) +:
      model.basis.zipWithIndex.toSeq.map { case (v, i) =>
        ("basis", i, v.toSeq, model.eigenvalues(i))
      }
    rows.toDF("kind", "idx", "vec", "scalar")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPcaModel(spark: SparkSession, path: String): VectorOps.PcaModel = {
    val rows = spark.read.parquet(path).collect()
    val mean = rows.find(_.getString(0) == "mean").get.getSeq[Double](2).toArray
    val basis = rows.filter(_.getString(0) == "basis").sortBy(_.getInt(1))
    VectorOps.PcaModel(mean, basis.map(_.getSeq[Double](2).toArray),
      basis.map(_.getDouble(3)))
  }
}
