package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral analysis of an embedding corpus: dominant principal direction
  * by distributed power iteration — the PCA-lite every embedding pipeline
  * wants (drift monitoring, whitening, anisotropy checks) without an MLlib
  * dependency.
  *
  * Each iteration computes w = Xᵀ(Xv) with v BROADCAST as a d-element
  * literal array: one row-local dot per corpus row, one d-cell hash
  * aggregate (map-side combined), and a d-value driver hop to build the
  * next broadcast — the same "iteration = one aggregation over the data"
  * shape as [[Graph.pageRank]], with driver state bounded by d (not n).
  * The corpus never shuffles.
  *
  * Cross-engine determinism uses the same trajectory pinning as the
  * k-means and PageRank queries: w and the normalized v re-snap to 10 dp
  * after every iteration (all rounding INSIDE engine SQL — `round(col,
  * 10)` here, `round(x, 10)` in the oracle), so both engines walk the
  * identical vector sequence regardless of their group-sum orders.
  */
object Spectral {

  /** (i, loading) rows — 1-based component index, 6 dp — of the dominant
    * right singular direction of the row matrix after `iters` pinned power
    * iterations from the uniform unit vector. */
  def powerIteration(df: DataFrame, vecCol: String, iters: Int,
      pinScale: Int = 10): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val spark = df.sparkSession
    val rows = df.select(Similarity.toDouble(col(vecCol)).as("e"))
      .localCheckpoint(false)
    val d = rows.select(size(col("e"))).first().getInt(0)
    // v0 = uniform unit vector, pinned (engine-side arithmetic: one row)
    var v: Array[Double] = {
      import spark.implicits._
      Seq(1).toDF("one")
        .select(round(lit(1.0) / sqrt(lit(d * 1.0)), pinScale).as("v"))
        .as[Double].collect()
    }.flatMap(x => Array.fill(d)(x))
    for (_ <- 1 to iters) {
      val vLit = array(v.toSeq.map(lit): _*)
      // w_i = Σ_rows dot(e, v) · e_i, pinned to 10 dp per cell
      val w = rows
        .select(Similarity.dot(col("e"), vLit).as("s"),
          posexplode(col("e")).as(Seq("i", "x")))
        .groupBy("i").agg(round(sum(col("s") * col("x")), pinScale).as("w"))
        .localCheckpoint(false)
      val norm = w.agg(sqrt(sum(col("w") * col("w")))).first().getDouble(0)
      v = w.select(col("i"), round(col("w") / lit(norm), pinScale).as("v"))
        .orderBy("i").collect().map(_.getDouble(1))
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i + 1, x) }.toSeq
      .toDF("i", "v")
      .select(col("i"), round(col("v"), 6).as("loading"))
  }
}
