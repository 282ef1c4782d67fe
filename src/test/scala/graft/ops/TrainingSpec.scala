package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** [[Training.logisticTrain]]: batch-gradient logistic regression —
  * convergence on separable data, partition-order determinism (the
  * DECIMAL gradient-sum guarantee), and score/train consistency. */
class TrainingSpec extends GraftSuite {
  import spark.implicits._

  /** Linearly separable: y = 1 iff x > 0.5 (margin 0.2). */
  private def separable = (0 until 200).map { i =>
    val x = (i % 10) / 10.0
    (x, if (x > 0.5) 1.0 else 0.0)
  }.toDF("x", "y")

  test("learns a separable rule to 100% training accuracy") {
    val df = separable
    val w = Training.logisticTrain(df, Seq(col("x")), col("y"),
      iters = 30, lr = 4.0)
    assert(w(1) > 0.0, "positive slope on the informative feature")
    val acc = df.filter(
      (Training.score(w, Seq(col("x"))) > 0.5) === (col("y") > 0.5))
      .count()
    assert(acc === 200L)
  }

  test("weights are identical across partitionings and row orders") {
    val base = separable
    val a = Training.logisticTrain(base.repartition(1),
      Seq(col("x")), col("y"), iters = 5, lr = 2.0)
    val b = Training.logisticTrain(base.repartition(13),
      Seq(col("x")), col("y"), iters = 5, lr = 2.0)
    val c = Training.logisticTrain(base.orderBy(desc("x")).repartition(7),
      Seq(col("x")), col("y"), iters = 5, lr = 2.0)
    assert(a === b, "partition count must not perturb the gradient")
    assert(a === c, "row order must not perturb the gradient")
  }

  test("multi-feature training concentrates weight on the signal") {
    // x1 carries the label, x2 is constant noise
    val df = (0 until 100)
      .map(i => (i % 2.0, 0.7, if (i % 2 == 0) 0.0 else 1.0))
      .toDF("x1", "x2", "y")
    val w = Training.logisticTrain(df, Seq(col("x1"), col("x2")), col("y"),
      iters = 20, lr = 2.0)
    assert(math.abs(w(1)) > math.abs(w(2)),
      s"informative feature must dominate: $w")
    val acc = df.filter((Training.score(w, Seq(col("x1"), col("x2"))) > 0.5)
      === (col("y") > 0.5)).count()
    assert(acc === 100L)
  }
}
