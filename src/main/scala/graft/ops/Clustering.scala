package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space clustering (Lloyd's k-means) and SemDeDup-style
  * cluster-then-dedup — the corpus-curation tier that makes pairwise
  * semantic dedup tractable: clustering turns a global O(n²) problem into
  * per-cluster O(m²) with m = n/k, and k grows with the corpus.
  *
  * Determinism (the whole design hinges on it):
  *  - seeds are the k smallest ids (no RNG, reproducible on any engine);
  *  - distances use the dot-product expansion d = e·e − 2·e·c + c·c where
  *    every term runs through graft's native sequential-fold
  *    [[graft.expressions.DotProduct]] — bit-identical to DuckDB's
  *    `list_dot_product` (the same precedent as [[Similarity]]);
  *  - argmin ties break on centroid id;
  *  - updated centroids round to 6 dp through DECIMAL(18,12), so the
  *    (order-sensitive) member mean is pinned to the same value on every
  *    engine before the next assignment pass.
  *
  * Scale design: each Lloyd iteration is one 1-row centroid broadcast
  * cross-joined onto the corpus with a row-local array_min argmin (no
  * corpus shuffle at all), plus one hash aggregate of k·dim cells for the
  * centroid update. Nothing global; iterations add plan depth, so
  * localCheckpoint between iterations when iters is large (not needed for
  * the 2–5 typical of curation runs).
  */
object Clustering {

  import Similarity.{dot, toDouble}

  private def r6(c: Column) = round(c.cast("decimal(18,12)"), 6).cast("double")

  /** (id, cluster, dist) after `iters` Lloyd iterations from the
    * k-smallest-id seeds. `dist` is the squared-distance surrogate
    * e·e − 2·e·c + c·c (monotone in true distance), rounded to 6 dp.
    *
    * Assignment is SHUFFLE-FREE: the k centroids ride a 1-row broadcast
    * (`collect_list` of (cid, ce, cn) structs) cross-joined onto the
    * corpus, and the argmin is a row-local `array_min` over
    * struct(d, cid) — lexicographic struct ordering IS the
    * (distance, centroid-id) tie-break. The naive alternative (broadcast
    * join + per-id window) shuffles n·k rows per iteration; this shape
    * shuffles only the k·dim centroid-update cells.
    */
  def kmeansAssign(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    lloyd(corpus, idCol, vecCol, k, iters)._1

  /** [[kmeansAssign]] plus the CENTROIDS the final assignment was made
    * against, as `(assignments, centroids (cid, ce))` — the pair an IVF
    * index needs: cells to partition by and the probe table to route
    * queries with ([[VectorLake]]). Centroids are the 6-dp-pinned
    * vectors after `iters - 1` update passes, so `assignments` is
    * EXACTLY the nearest-centroid rule over `centroids` (same d, same
    * (d, cid) tie-break) — re-deriving the assignment from the returned
    * centroids reproduces it. */
  def kmeansFit(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, DataFrame) =
    lloyd(corpus, idCol, vecCol, k, iters)

  private def lloyd(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val v = corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("e"))
      .withColumn("en", dot(col("e"), col("e")))

    var cents = v.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("e").as("ce"))

    var assigned: DataFrame = null
    var used: DataFrame = cents
    for (_ <- 1 to iters) {
      used = cents
      val centsRow = cents
        .withColumn("cn", dot(col("ce"), col("ce")))
        .agg(collect_list(struct(col("cid"), col("ce"), col("cn"))).as("cs"))
      // row-local argmin over the broadcast centroid array; `e`/`en` are
      // bound attributes (never trees) per the NOTES HOF lesson
      assigned = v.crossJoin(broadcast(centsRow))
        .withColumn("best", array_min(transform(col("cs"), c =>
          struct(
            (col("en") - lit(2.0) * dot(col("e"), c.getField("ce"))
              + c.getField("cn")).as("d"),
            c.getField("cid").as("cid")))))
        .select(col("id"), col("best.cid").as("cid"),
          col("best.d").as("d"), col("e"))

      // element-wise member mean, pinned to 6 dp before the next pass
      cents = assigned
        .select(col("cid"), posexplode(col("e")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i")).agg(r6(avg(col("x"))).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          s => s.getField("m")).as("ce"))
    }
    (assigned.select(col("id"), col("cid").as("cluster"),
      r6(col("d")).as("dist")), used)
  }

  /** SemDeDup: k-means the corpus, then within each cluster mark every
    * vector that has a smaller-id neighbor at cosine >= threshold as a
    * duplicate (keep = false). The pairwise pass is per-cluster O(m²) —
    * the point of clustering first; k MUST scale with the corpus so m
    * stays bounded (fixed k makes total pair work n²/k — measured 37×
    * on a 10× corpus). `k <= 0` auto-sizes k = ⌈n/500⌉ from one count so
    * mean cluster mass stays ~500 regardless of corpus size; exact
    * duplicates are caught under ANY clustering (identical vectors always
    * land in the same cluster), while near-dup recall depends on cluster
    * granularity as in the paper. Fixed k remains for oracle-checked
    * runs (the SQL twin unrolls a fixed-k Lloyd chain). Cosine rounds to
    * 6 dp before the threshold compare so the keep/drop frontier is
    * identical cross-engine.
    *
    * Output: (id, cluster, keep).
    */
  def semDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("e"))
      .withColumn("n", sqrt(dot(col("e"), col("e"))))
    val kEff = if (k > 0) k else math.max(8, math.ceil(v.count() / 500.0).toInt)
    val a = kmeansAssign(corpus, idCol, vecCol, kEff, iters)
      .select(col("id"), col("cluster"))
      .join(v, Seq("id"))

    val left = a.select(col("cluster"), col("id").as("ida"),
      col("e").as("ea"), col("n").as("na"))
    val right = a.select(col("cluster"), col("id").as("idb"),
      col("e").as("eb"), col("n").as("nb"))
    val dupIds = left.join(right, Seq("cluster"))
      .filter(col("ida") < col("idb"))
      .filter(r6(dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        >= threshold)
      .select(col("idb").as("id")).distinct()

    a.join(dupIds.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        not(coalesce(col("__dup"), lit(false))).as("keep"))
  }
}
