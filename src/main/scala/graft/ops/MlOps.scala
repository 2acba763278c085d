package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.storage.StorageLevel

/**
 * Distributed classical-ML training primitives for corpus curation — the trainable
 * quality-filter stage of an LLM data pipeline (the fastText/logreg quality classifier of
 * CCNet/GPT-3-style curation: train a small linear model on labeled docs, score the whole
 * corpus, keep the high-scoring tail).
 *
 * Design stance for 100 TB:
 *  - the MODEL is tiny (d+1 doubles) and lives on the driver / broadcasts to executors;
 *  - each GD iteration is ONE whole-stage-codegen aggregation over the cached feature
 *    frame — sigmoid, residual and per-feature products all evaluate inside codegen, and
 *    only `d+1` doubles cross to the driver per iteration (no per-row collect, ever);
 *  - scoring/prediction is a narrow map with the weights inlined as literals — zero
 *    shuffle, fully pushdown-friendly;
 *  - at real scale the trainer runs on a SAMPLE (quality classifiers are trained on
 *    10k–1M labeled docs, not the corpus) while the scorer runs on everything — the two
 *    paths here are exactly that split.
 *
 * Reference scope: the reference component has no trainable stage (it moves rows); this
 * family extends the engine toward training-data curation, like the ANN/dedup families.
 */
object MlOps {

  /** Per-feature standardization stats from one aggregation pass. */
  final case class FeatureStats(mean: Array[Double], std: Array[Double])

  /** Trained linear model over standardized features: `score = w · (x - mean) / std`
    * (bias handled as an un-standardized intercept slot at index 0). */
  final case class LinearModel(weights: Array[Double], stats: FeatureStats) {
    require(weights.length == stats.mean.length + 1, "weights = [intercept] ++ per-feature")
  }

  /** One-pass mean/std over the feature columns (population std, guarding zero-variance
    * columns to 1.0 so constant features standardize to 0 instead of NaN). */
  def featureStats(df: DataFrame, featCols: Seq[String]): FeatureStats = {
    val aggs = featCols.flatMap { c =>
      Seq(avg(col(c).cast(DoubleType)).as(s"__m_$c"),
        coalesce(stddev_pop(col(c).cast(DoubleType)), lit(0.0)).as(s"__s_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val mean = featCols.indices.map(i => r.getDouble(2 * i)).toArray
    val std = featCols.indices.map { i =>
      val s = r.getDouble(2 * i + 1); if (s == 0.0) 1.0 else s
    }.toArray
    FeatureStats(mean, std)
  }

  private def standardized(featCols: Seq[String], stats: FeatureStats): Seq[Column] =
    featCols.zipWithIndex.map { case (c, i) =>
      ((col(c).cast(DoubleType) - stats.mean(i)) / stats.std(i)).as(s"__z_$i")
    }

  /** The margin `w0 + Σ w_i z_i` with weights inlined as literals — a pure codegen
    * expression; no UDF, no broadcast variable needed (the model IS the plan). */
  private def marginCol(weights: Array[Double]): Column =
    weights.tail.zipWithIndex.foldLeft(lit(weights.head)) { case (acc, (w, i)) =>
      acc + lit(w) * col(s"__z_$i")
    }

  /**
   * Full-batch logistic-regression gradient descent, DataFrame-native.
   *
   * Each iteration: `grad_j = (1/n) Σ (σ(margin) − y) · z_j  (+ l2 · w_j)`, computed by a
   * single `agg` whose `d+2` sums (gradient components, intercept residual, row count)
   * all ride one codegen'd scan of the cached standardized frame. The driver holds only
   * the weight vector. Iteration count is FIXED (not convergence-tested) so runs are
   * deterministic in job structure; fp-sum order across partitions is absorbed by the
   * tolerance-gated verdicts downstream, exactly like the k-means/PCA trainers.
   */
  def logregTrainGD(df: DataFrame, featCols: Seq[String], labelCol: String,
      iters: Int = 60, lr: Double = 2.0, l2: Double = 0.0): LinearModel = {
    val stats = featureStats(df, featCols)
    val z = df.select(
      (standardized(featCols, stats) :+ col(labelCol).cast(DoubleType).as("__y")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val d = featCols.length
      val w = new Array[Double](d + 1)
      var it = 0
      while (it < iters) {
        val resid = lit(1.0) / (lit(1.0) + exp(-marginCol(w))) - col("__y")
        val aggs = sum(resid).as("__g0") +:
          (0 until d).map(i => sum(resid * col(s"__z_$i")).as(s"__g${i + 1}")) :+
          count(lit(1)).cast(DoubleType).as("__n")
        val r = z.agg(aggs.head, aggs.tail: _*).head()
        val n = r.getDouble(d + 1)
        var j = 0
        while (j <= d) {
          val reg = if (j == 0) 0.0 else l2 * w(j)
          w(j) -= lr * (r.getDouble(j) / n + reg)
          j += 1
        }
        it += 1
      }
      LinearModel(w, stats)
    } finally { z.unpersist() }
  }

  /**
   * Penalized Newton–Raphson (IRLS) logistic training — the SCALE form of
   * [[logregTrainGD]]: quadratic convergence means ~8 full-data passes instead of 60,
   * and at 100 TB every saved pass is a saved corpus scan (each iteration here is still
   * exactly ONE codegen'd aggregation; it just also folds the (d+1)(d+2)/2
   * upper-triangular Hessian sums in — for the handful of features a quality classifier
   * uses, that's ~20 extra doubles per pass, nothing). The (d+1)×(d+1) solve happens on
   * the driver per iteration (d is tiny by construction). The ridge term `l2·n` keeps
   * the Hessian nonsingular and the weights finite even when the planted labels are
   * linearly separable (where the unpenalized MLE diverges — GD just diverges slowly
   * enough to pass; Newton would reach the singularity).
   */
  def logregTrainNewton(df: DataFrame, featCols: Seq[String], labelCol: String,
      iters: Int = 8, l2: Double = 1e-3): LinearModel = {
    val stats = featureStats(df, featCols)
    val z = df.select(
      (standardized(featCols, stats) :+ col(labelCol).cast(DoubleType).as("__y")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val d = featCols.length
      val w = new Array[Double](d + 1)
      def x(i: Int): Column = if (i == 0) lit(1.0) else col(s"__z_${i - 1}")
      val pairs = (for { i <- 0 to d; j <- i to d } yield (i, j)).toIndexedSeq
      var it = 0
      while (it < iters) {
        val p = lit(1.0) / (lit(1.0) + exp(-marginCol(w)))
        val resid = p - col("__y")
        val wgt = p * (lit(1.0) - p)
        val aggs = (0 to d).map(i => sum(resid * x(i)).as(s"__g$i")) ++
          pairs.map { case (i, j) => sum(wgt * x(i) * x(j)).as(s"__h${i}_$j") } :+
          count(lit(1)).cast(DoubleType).as("__n")
        val r = z.agg(aggs.head, aggs.tail: _*).head()
        val n = r.getDouble(aggs.length - 1)
        val g = Array.tabulate(d + 1)(i =>
          r.getDouble(i) + (if (i == 0) 0.0 else l2 * n * w(i)))
        val h = Array.ofDim[Double](d + 1, d + 1)
        pairs.zipWithIndex.foreach { case ((i, j), k) =>
          val v = r.getDouble(d + 1 + k)
          h(i)(j) = v; h(j)(i) = v
        }
        (1 to d).foreach(i => h(i)(i) += l2 * n)
        val delta = solveSym(h, g)
        var j = 0
        while (j <= d) { w(j) -= delta(j); j += 1 }
        it += 1
      }
      LinearModel(w, stats)
    } finally { z.unpersist() }
  }

  /** Gaussian elimination with partial pivoting for the tiny Newton system. */
  private def solveSym(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    var c = 0
    while (c < n) {
      var piv = c
      var r = c + 1
      while (r < n) { if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r; r += 1 }
      if (piv != c) {
        val ta = a(piv); a(piv) = a(c); a(c) = ta
        val tb = b(piv); b(piv) = b(c); b(c) = tb
      }
      val p = a(c)(c)
      r = c + 1
      while (r < n) {
        val f = a(r)(c) / p
        var k = c
        while (k < n) { a(r)(k) -= f * a(c)(k); k += 1 }
        b(r) -= f * b(c)
        r += 1
      }
      c += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var k = i + 1
      while (k < n) { s -= a(i)(k) * x(k); k += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Score a frame with a trained model: adds `score` (the sigmoid probability) and
    * `predicted` (score > 0.5). Narrow map — weights and stats are literals in the plan. */
  def logregScore(df: DataFrame, featCols: Seq[String], model: LinearModel): DataFrame = {
    val zCols = standardized(featCols, model.stats)
    val withZ = df.select((df.columns.map(col).toSeq ++ zCols): _*)
    val margin = marginCol(model.weights)
    withZ
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-margin)))
      .withColumn("predicted", col("score") > 0.5)
      .drop((0 until featCols.length).map(i => s"__z_$i"): _*)
  }

  /** Train-accuracy / holdout-accuracy verdict frame for a planted-label gate:
    * one row with counts and boolean verdicts (the ANN-gate idiom). */
  def logregVerdict(scored: DataFrame, labelCol: String, splitCol: String,
      trainFloor: Double, testFloor: Double): DataFrame = {
    val correct = (col("predicted") === col(labelCol).cast("boolean")).cast("long")
    scored.agg(
      count(lit(1)).as("n_docs"),
      sum(col(labelCol).cast("long")).as("n_pos"),
      (sum(when(!col(splitCol), correct).otherwise(0L)) >=
        sum(when(!col(splitCol), 1L).otherwise(0L)) * trainFloor).as("train_acc_ok"),
      (sum(when(col(splitCol), correct).otherwise(0L)) >=
        sum(when(col(splitCol), 1L).otherwise(0L)) * testFloor).as("test_acc_ok"))
  }

  /**
   * Exact ROC-AUC via the grouped rank-sum (Mann–Whitney) identity, with ties counted
   * half — the standard threshold-free quality-classifier eval. Distributed shape: ONE
   * keyed aggregation to (score → pos, neg) counts, then an ordered cumulative over the
   * GROUPED rows. The caller must pass a score on a BOUNDED grid (the repo's quality
   * signals are all ROUND(…,4), ≤ 10⁴ distinct values), so the window's single ordered
   * pass runs over grid-sized state — corpus-size-independent, same discipline as the
   * cents-grid percentiles. All moments stay exact LONGs (`numer2` is 2× the rank-sum
   * numerator so the half-credit tie term needs no fraction); AUC itself is one
   * fixed-operand-order double division.
   */
  /**
   * Mann-Whitney U test (Mann & Whitney 1947) between the labelCol = 1 and = 0 samples
   * of scoreCol — the nonparametric two-sample location test (no normality assumption,
   * unlike [[ev_ab_ttest]]'s Welch t). Same grouped rank-sum machinery as
   * [[groupedAuc]]: `u2` = 2·U with half-credit ties is an EXACT integer, as is the
   * tie-correction moment Σ(t³−t); the normal-approximation z is then ONE
   * fixed-operand-order double expression both engines reproduce bit-for-bit.
   * State is bounded by the score grid (here e4-quantized), never the corpus.
   * The u2/tie3 moments accumulate as DECIMAL(38,0), not LONG (ADVICE r7): t³ wraps a
   * long once any score bucket exceeds ~2²¹ rows and u2 once n1·n2 exceeds 2⁶³ —
   * corpus-scale sizes, not edge cases. The exported u2/tie3 columns cast to long at
   * the end (null rather than wraparound when genuinely out of range); z computes off
   * the exact decimals directly, so it stays correct even past the long boundary.
   */
  def mannWhitney(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(labelCol).cast("long")).as("__pos"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("__neg"))
    val w = Window.orderBy(col("__s")).rowsBetween(Window.unboundedPreceding, -1)
    val dec38 = DecimalType(38, 0)
    val t = (col("__pos") + col("__neg")).cast(dec38)
    g.withColumn("__cumneg", coalesce(sum(col("__neg")).over(w), lit(0L)))
      .agg(sum(col("__pos")).as("n1"), sum(col("__neg")).as("n2"),
        sum(col("__pos").cast(dec38)
          * (col("__cumneg").cast(dec38) * 2 + col("__neg"))).as("__u2d"),
        sum(t * t * t - t).as("__tie3d"))
      .select(col("n1"), col("n2"),
        col("__u2d").cast("long").as("u2"), col("__tie3d").cast("long").as("tie3"),
        round((col("__u2d") - col("n1").cast(dec38) * col("n2")).cast(DoubleType)
          / (lit(2.0) * sqrt((col("n1").cast(DoubleType) * col("n2") / 12.0)
            * ((col("n1") + col("n2") + 1).cast(DoubleType)
              - col("__tie3d").cast(DoubleType)
                / ((col("n1") + col("n2")).cast(DoubleType)
                  * (col("n1") + col("n2") - 1))))), 6).as("z"))
  }

  def groupedAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(labelCol).cast("long")).as("__pos"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("__neg"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__cumneg", coalesce(sum(col("__neg")).over(w), lit(0L)))
      .agg(sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"),
        sum(col("__pos") * (col("__cumneg") * 2 + col("__neg"))).as("numer2"))
      .select(col("n_pos"), col("n_neg"), col("numer2"),
        round(col("numer2").cast(DoubleType)
          / (col("n_pos") * col("n_neg") * 2), 6).as("auc"))
  }

  /**
   * Kruskal-Wallis H test (Kruskal & Wallis 1952) — the k-group generalization of
   * [[mannWhitney]]: does at least one group's score distribution sit apart?
   * Same grouped-midrank machinery: state is the (score grid × k groups) table, never
   * the corpus. Per score s (ascending): doubled midrank `2·cumBefore_s + t_s + 1`,
   * so every per-group rank sum R2_g = 2·R_g is an EXACT DECIMAL(38,0); the tie
   * moment Σ(t³−t) likewise. The per-group H term R2_g²/(4·n_g) is computed in IEEE
   * double (deterministic given the exact R2_g on both engines) and quantized to
   * DECIMAL(38,6) BEFORE the k-term cross-group sum — the repo's per-term
   * quantization discipline, so the sum is order-free — and H itself is one
   * fixed-operand-order double expression:
   *   H = 12·T/N/(N+1) − 3·(N+1),  H_c = H / (1 − tie3/(N³−N)).
   *
   * @return one row: n, k (groups), tie3, h, h_corrected (both ROUND 6)
   */
  def kruskalWallis(df: DataFrame, scoreCol: String, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec38 = DecimalType(38, 0)
    val g = df.groupBy(col(scoreCol).as("__s"), col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__c"))
    val perScore = g.groupBy("__s").agg(sum("__c").as("__t"))
    val w = Window.orderBy(col("__s")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore
      .withColumn("__cum", coalesce(sum(col("__t")).over(w), lit(0L)))
      .select(col("__s"), col("__t"), (col("__cum") * 2 + col("__t") + 1).as("__r2"))
    val perGroup = g.join(ranked, "__s")
      .groupBy("__g")
      .agg(sum("__c").as("__ng"),
        sum(col("__c").cast(dec38) * col("__r2")).as("__R2"))
      // R2² in double is deterministic on both engines (exact decimal → double cast,
      // then IEEE ×, /); quantize BEFORE the cross-group sum so order can't matter
      .select(col("__ng"), col("__R2"),
        (col("__R2").cast(DoubleType) * col("__R2").cast(DoubleType)
          / (lit(4.0) * col("__ng"))).cast(DecimalType(38, 6)).as("__term"))
    val tieM = perScore.agg(
      sum(col("__t").cast(dec38) * col("__t") * col("__t") - col("__t")).as("__tie3"),
      sum(col("__t")).as("__n"))
    perGroup.agg(count(lit(1)).as("k"), sum(col("__term")).as("__T"))
      .crossJoin(tieM)
      .select(col("__n").cast("long").as("n"), col("k").cast("long").as("k"),
        col("__tie3").cast("long").as("tie3"),
        round(lit(12.0) * col("__T").cast(DoubleType) / col("__n") / (col("__n") + 1)
          - lit(3.0) * (col("__n") + 1), 6).as("h"),
        round((lit(12.0) * col("__T").cast(DoubleType) / col("__n") / (col("__n") + 1)
          - lit(3.0) * (col("__n") + 1))
          / (lit(1.0) - col("__tie3").cast(DoubleType)
            / (col("__n").cast(DoubleType) * col("__n") * col("__n") - col("__n"))),
          6).as("h_corrected"))
  }
}
