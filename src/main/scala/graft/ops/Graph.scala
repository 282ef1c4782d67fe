package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step of every
  * near-duplicate pipeline: pair finders ([[Dedup.minHashLshPairs]],
  * [[Similarity.cosineLshPairs]]) emit edges; components are the duplicate
  * clusters; one survivor per component is kept.
  *
  * Algorithm: iterative min-label propagation. Each round every vertex
  * adopts the smallest label among itself and its neighbors; convergence is
  * detected with a distributed count of changed labels (one tiny action per
  * round). Rounds are plain shuffle joins — no driver-side graph, vertices
  * and edges stay fully partitioned.
  *
  * Scale posture: propagation converges in O(component diameter) rounds.
  * Near-dup clusters are shallow (stars/cliques around a template —
  * diameter ≤ ~3), so 5-10 rounds close real corpora; `maxIter` bounds
  * adversarial chains. Each round shuffles |E| label messages hash-
  * partitioned by vertex — the same cost profile as one aggregation over
  * the edge list. Labels are `localCheckpoint`ed per round to truncate
  * lineage (an iterative plan would otherwise grow exponentially).
  * For graphs with genuinely deep diameter at 100 TB, swap the propagation
  * loop for alternating large-star/small-star contraction (same join
  * primitives, O(log n) rounds).
  */
object Graph {

  /** Connected components of the undirected graph given by (srcCol, dstCol)
    * edge rows. Returns (vertex `id`, component `label`) with label = the
    * minimum vertex id in the component. Isolated vertices appear in the
    * output only if present as a self-loop or on either edge side.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // symmetrize once: undirected adjacency as directed both ways
    val adj = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(false)
    var labels = adj.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels: for edge a->b, a's label is a candidate for b
      val msgs = adj.join(labels.withColumnRenamed("id", "a"), Seq("a"))
        .select(col("b").as("id"), col("label"))
      val next = labels.select(col("id"), col("label"))
        .union(msgs)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(false)
      val changed = next.join(labels.withColumnRenamed("label", "__old"), Seq("id"))
        .filter(col("label") =!= col("__old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Duplicate-cluster survivors: from near-dup pair rows, the component id
    * (cluster label), size, and the kept document (min id) per cluster —
    * the standard "dedup by LSH clusters" tail of a training-data pipeline.
    */
  def dedupClusters(pairs: DataFrame, idaCol: String, idbCol: String): DataFrame =
    connectedComponents(pairs, idaCol, idbCol)
      .groupBy("label")
      .agg(count(lit(1)).as("cluster_size"), min("id").as("keep_id"))
      .select(col("label").as("cluster"), col("cluster_size"), col("keep_id"))
}
