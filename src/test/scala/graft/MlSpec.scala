package graft

import org.apache.spark.sql.functions._
import graft.ops.MlOps

/** Distributed logistic-regression trainer: convergence on separable data, the
  * standardization contract, L2 shrinkage, and the verdict frame's accounting. */
class MlSpec extends SparkSpec {
  import spark.implicits._

  private def separable(n: Int) = {
    // y = 1 iff x1 > 5; x2 is a deterministic nuisance dimension
    (0 until n).map { i =>
      val x1 = (i % 11).toDouble
      val x2 = ((i * 7) % 13).toDouble / 13.0
      (i.toLong, x1, x2, if (x1 > 5) 1 else 0)
    }.toDF("id", "x1", "x2", "label")
  }

  test("logreg GD separates a linearly-separable rule at 100% train accuracy") {
    val df = separable(500)
    val model = MlOps.logregTrainGD(df, Seq("x1", "x2"), "label")
    val scored = MlOps.logregScore(df, Seq("x1", "x2"), model)
    val acc = scored.agg(avg((col("predicted") === (col("label") === 1)).cast("double")))
      .head().getDouble(0)
    assert(acc == 1.0, s"train accuracy $acc")
    // the learned direction loads on x1, not the nuisance dim
    assert(math.abs(model.weights(1)) > math.abs(model.weights(2)) * 3)
  }

  test("featureStats standardization guards zero-variance columns") {
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("a", "b")
    val st = MlOps.featureStats(df, Seq("a", "b"))
    assert(st.mean(0) == 2.0 && st.mean(1) == 7.0)
    assert(st.std(1) == 1.0) // zero-variance -> 1.0, standardizes to exactly 0
  }

  test("L2 regularization shrinks weight norm") {
    val df = separable(300)
    val free = MlOps.logregTrainGD(df, Seq("x1", "x2"), "label", iters = 40)
    val reg = MlOps.logregTrainGD(df, Seq("x1", "x2"), "label", iters = 40, l2 = 0.5)
    def norm(m: MlOps.LinearModel) = math.sqrt(m.weights.map(w => w * w).sum)
    assert(norm(reg) < norm(free))
  }

  test("Newton trainer separates the same rule in 8 passes and agrees with GD predictions") {
    val df = separable(500)
    val newton = MlOps.logregTrainNewton(df, Seq("x1", "x2"), "label")
    val scoredN = MlOps.logregScore(df, Seq("x1", "x2"), newton)
    val accN = scoredN.agg(avg((col("predicted") === (col("label") === 1)).cast("double")))
      .head().getDouble(0)
    assert(accN == 1.0, s"Newton train accuracy $accN")
    // ridge keeps the separable-data weights finite (unpenalized MLE diverges here)
    assert(newton.weights.forall(w => java.lang.Double.isFinite(w) && math.abs(w) < 1e4),
      s"weights must stay finite under separation: ${newton.weights.toSeq}")
    // and the decision boundary matches the 60-iteration GD reference everywhere
    val gd = MlOps.logregTrainGD(df, Seq("x1", "x2"), "label")
    val scoredG = MlOps.logregScore(df, Seq("x1", "x2"), gd)
      .select(col("id"), col("predicted").as("pg"))
    val disagree = scoredN.select(col("id"), col("predicted"))
      .join(scoredG, "id").filter(col("predicted") =!= col("pg")).count()
    assert(disagree == 0L, s"$disagree predictions differ between Newton and GD")
  }

  test("verdict frame counts positives and splits train/holdout correctly") {
    val df = separable(200).withColumn("is_test", pmod(col("id"), lit(4)) === 0)
    val model = MlOps.logregTrainGD(df.filter(!col("is_test")), Seq("x1", "x2"), "label")
    val scored = MlOps.logregScore(df, Seq("x1", "x2"), model)
    val v = MlOps.logregVerdict(scored, "label", "is_test", 0.97, 0.95).head()
    assert(v.getAs[Long]("n_docs") == 200L)
    assert(v.getAs[Long]("n_pos") == df.filter(col("label") === 1).count())
    assert(v.getAs[Boolean]("train_acc_ok") && v.getAs[Boolean]("test_acc_ok"))
  }

  test("scoring is a narrow plan — no Exchange") {
    val df = separable(100)
    val model = MlOps.logregTrainGD(df, Seq("x1", "x2"), "label", iters = 5)
    val plan = MlOps.logregScore(df, Seq("x1", "x2"), model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("groupedAuc: 1.0 on perfect separation, 0.0 reversed, 0.5 all-tied, ties half-credit") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Int)]): Double =
      MlOps.groupedAuc(rows.toDF("s", "label"), "s", "label").head().getAs[Double]("auc")
    val perfect = (1 to 10).map(i => (i.toDouble, if (i > 5) 1 else 0))
    assert(auc(perfect) == 1.0)
    assert(auc(perfect.map { case (s, l) => (s, 1 - l) }) == 0.0)
    assert(auc((1 to 10).map(i => (7.0, if (i > 5) 1 else 0))) == 0.5)
    // hand-computed with one tie block: scores pos={3,2}, neg={2,1}:
    // pairs: (3>2)=1, (3>1)=1, (2=2)=0.5, (2>1)=1 -> AUC = 3.5/4 = 0.875
    assert(auc(Seq((3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0))) == 0.875)
  }
}
