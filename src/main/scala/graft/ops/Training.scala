package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed TRAINING of a model-based quality filter — the missing
  * half of `Retrieval.hashedLinearScore` (which scores with given
  * weights): learn the weights from labeled rows with batch-gradient
  * logistic regression, the fastText-style recipe behind production
  * quality classifiers (score documents, keep the top fraction).
  *
  * Scale posture: each iteration is ONE hash aggregate over the corpus
  * — `2 + features` partial-aggregated sums, no shuffle of rows, no
  * driver-side data beyond the weight vector. 3 iterations over 100 TB
  * cost 3 scans (cache the projected frame and it's 3 columnar passes
  * over a few numeric columns). The gradient is exact: every per-row
  * term rounds through DECIMAL(18,12)→6 dp (sigmoid is the only libm
  * call — pinning its output makes the trajectory engine-portable) and
  * sums as DECIMAL(28,12), so partition order cannot perturb the
  * result — the same determinism discipline as
  * [[Clustering.kmeansAssign]]'s pinned centroids.
  */
object Training {

  /** Pin a libm-derived double to 6 dp the way both engines' SQL does:
    * DECIMAL(18,12) pre-cast, then round — the x_quality_score
    * half-boundary lesson, applied driver-side. BigDecimal.valueOf
    * mirrors Spark's Cast(double → decimal) shortest-representation
    * semantics. */
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** The 6-dp-pinned sigmoid of `z` as a Column — shared by the
    * gradient pass and [[score]] so training and inference use ONE
    * rendering. */
  private def sigmoid6(z: Column): Column =
    round((lit(1.0) / (lit(1.0) + exp(-z))).cast(DecimalType(18, 12)), 6)
      .cast("double")

  private def zOf(w: Seq[Double], xs: Seq[Column]): Column =
    xs.zip(w.tail).foldLeft(lit(w.head) * lit(1.0)) {
      case (acc, (x, wi)) => acc + lit(wi) * x
    }

  /** Learn `1 + features.size` weights (bias first) by `iters` rounds
    * of full-batch gradient descent at learning rate `lr`, from zero
    * init. `label` must evaluate to 0.0/1.0. Weights round to 6 dp per
    * round, so the returned vector is reproducible across engines and
    * partitionings. */
  def logisticTrain(df: DataFrame, features: Seq[Column], label: Column,
      iters: Int = 3, lr: Double = 1.0): Seq[Double] = {
    require(features.nonEmpty && iters > 0, "need features and iterations")
    val xs = features.indices.map(i => col(s"x$i"))
    val data = df.select(label.cast("double").as("y") +:
      features.zipWithIndex.map { case (f, i) =>
        f.cast("double").as(s"x$i") }: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var w = Vector.fill(features.size + 1)(0.0)
      for (_ <- 1 to iters) {
        val err = sigmoid6(zOf(w, xs)) - col("y")
        val sums = (err +: xs.map(err * _)).zipWithIndex.map {
          case (term, j) =>
            sum(term.cast(DecimalType(28, 12))).as(s"s$j")
        }
        val row = data.agg(count(lit(1)).as("n"), sums: _*).head()
        val n = row.getLong(0)
        w = Vector.tabulate(w.size) { j =>
          val mean = row.getDecimal(j + 1).doubleValue() / n
          r6(w(j) - lr * mean)
        }
      }
      w
    } finally { data.unpersist(); () }
  }

  /** The trained model's 6-dp-pinned probability for a feature row —
    * `sigmoid(w · (1, x...))`, exactly the rendering the final training
    * round used. */
  def score(weights: Seq[Double], features: Seq[Column]): Column =
    sigmoid6(zOf(weights, features))
}
