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

  /** Convergence report for the iterative tiers — at 100 TB the difference
    * between 5 rounds and 20 rounds IS the job cost, so it must be visible
    * to callers (alerting, auto-switching to the star tier), not buried in
    * driver logs. `perRound` is labels-changed per round for propagation /
    * surviving-edge count per round for star contraction; a non-converged
    * run (hit `maxIter`) reports converged = false rather than returning
    * silently-partial labels. */
  final case class CcStats(rounds: Int, converged: Boolean, perRound: Seq[Long])

  /** Connected components of the undirected graph given by (srcCol, dstCol)
    * edge rows. Returns (vertex `id`, component `label`) with label = the
    * minimum vertex id in the component. Isolated vertices appear in the
    * output only if present as a self-loop or on either edge side.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame =
    connectedComponentsWithStats(edges, srcCol, dstCol, maxIter)._1

  /** [[connectedComponents]] plus its [[CcStats]]. The per-round changed
    * count rides the convergence-check action the loop already runs (the
    * join must execute either way; counting all changed rows instead of
    * probing for one costs the same shuffle and buys the metric). */
  def connectedComponentsWithStats(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): (DataFrame, CcStats) = {
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
    val perRound = Seq.newBuilder[Long]
    while (iter < maxIter && !converged) {
      // neighbor labels: for edge a->b, a's label is a candidate for b
      val msgs = adj.join(labels.withColumnRenamed("id", "a"), Seq("a"))
        .select(col("b").as("id"), col("label"))
      val next = labels.select(col("id"), col("label"))
        .union(msgs)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(false)
      val changed = next.join(labels.withColumnRenamed("label", "__old"), Seq("id"))
        .filter(col("label") =!= col("__old")).count()
      perRound += changed
      labels = next
      converged = changed == 0
      iter += 1
    }
    (labels, CcStats(iter, converged, perRound.result()))
  }

  /** PageRank over a directed edge list, fixed iteration count.
    *
    * Per round: one equi-join of ranks onto edges, one hash aggregate of
    * contributions by destination, one left join back onto the vertex set —
    * all hash-partitioned by vertex id, no driver-side graph. Dangling mass
    * (vertices with no out-edges) is collected as ONE scalar per round (the
    * same bounded-collect pattern as the CC convergence check) and
    * redistributed uniformly, so Σ rank stays 1. Lineage is truncated per
    * round with localCheckpoint, as in [[connectedComponents]].
    *
    * Ranks are pinned to `pinScale` decimal places after every iteration:
    * two engines computing group-sums of doubles in different orders drift
    * at ~1e-16 per round, and pinning re-snaps both trajectories to the
    * identical value — the same cross-engine determinism device as the
    * Lloyd-iteration centroid pinning in the k-means query. At 100 TB the
    * per-round cost is one shuffle of |E| contributions — the canonical
    * "iteration = aggregation over edges" shape; fixed `iters` (not a
    * convergence loop) keeps the job cost predictable.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, damping: Double = 0.85, pinScale: Int = 10): DataFrame = {
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v")).distinct()
      .localCheckpoint(false)
    val verts = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .distinct().localCheckpoint(false)
    val n = verts.count()
    val outd = e.groupBy("u").agg(count(lit(1)).as("od")).localCheckpoint(false)
    var ranks = verts.select(col("id"), round(lit(1.0) / n, pinScale).as("r"))
      .localCheckpoint(false)
    var i = 0
    while (i < iters) {
      val dangling = ranks
        .join(outd.withColumnRenamed("u", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0))).collect()(0).getDouble(0)
      val contribs = e.join(outd, Seq("u"))
        .join(ranks.withColumnRenamed("id", "u"), Seq("u"))
        .select(col("v").as("id"), (col("r") / col("od")).as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      ranks = verts.join(contribs, Seq("id"), "left")
        .select(col("id"),
          round(lit(1.0 - damping) / n +
            lit(damping) * (coalesce(col("s"), lit(0.0)) + lit(dangling) / n),
            pinScale).as("r"))
        .localCheckpoint(false)
      i += 1
    }
    ranks.select(col("id"), col("r").as("pagerank"))
  }

  /** Triangle enumeration over an undirected edge list, returned as one row
    * per triangle with vertices in ascending id order (a < b < c).
    *
    * Algorithm: degree-ordered edge orientation (the MapReduce-era standard,
    * Suri & Vassilvitskii "Counting Triangles and the Curse of the Last
    * Reducer"). Every edge is directed from its lower-(degree, id) endpoint
    * to the higher; wedges are built only from each vertex's OUT-neighbors
    * and closed against the oriented edge set. Orientation is what makes
    * this survive skew at 100 TB: a degree-D hub produces O(D²) wedges under
    * naive id ordering, but its out-degree after orientation is bounded by
    * O(√|E|) (every out-neighbor has degree ≥ its own), so per-vertex wedge
    * work — and with it the largest single task — is capped without any
    * sampling. Three hash shuffles total: degree agg, wedge self-join,
    * closing-edge join. Each triangle appears exactly once.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = undirected(edges, srcCol, dstCol)
    trianglesOn(und, degreesOf(und))
  }

  /** Canonical undirected edge set: (u < v), self-loops dropped, distinct. */
  private def undirected(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()

  /** (id, deg) over a canonical undirected edge set. */
  private def degreesOf(und: DataFrame): DataFrame =
    und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

  /** [[triangles]] body over precomputed (und, deg) — callers that need
    * degrees anyway ([[clusteringCoefficient]]) pass a materialized pair
    * so the edge set isn't derived twice. */
  private def trianglesOn(und: DataFrame, deg: DataFrame): DataFrame = {
    // orient by (deg, id): x -> y iff (deg_x, x) < (deg_y, y); carry y's rank
    // so the wedge join can order the two out-neighbors consistently
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("x"), col("v").as("y"), col("dv").as("dy")))
        .otherwise(struct(col("v").as("x"), col("u").as("y"), col("du").as("dy")))
        .as("e")).select(col("e.x"), col("e.y"), col("e.dy"))
    val f = oriented.select(col("x").as("xa"), col("y").as("p"), col("dy").as("dp"))
    val g = oriented.select(col("x").as("xb"), col("y").as("q"), col("dy").as("dq"))
    val wedges = f.join(g,
        col("xa") === col("xb") &&
          (col("dp") < col("dq") || (col("dp") === col("dq") && col("p") < col("q"))))
      .select(col("xa").as("x"), col("p"), col("q"))
    val closing = oriented.select(col("x").as("p"), col("y").as("q"))
    wedges.join(closing, Seq("p", "q"), "left_semi")
      .select(array_sort(array(col("x"), col("p"), col("q"))).as("t"))
      .select(col("t").getItem(0).as("a"), col("t").getItem(1).as("b"),
        col("t").getItem(2).as("c"))
  }

  /** Per-vertex triangle participation counts (vertices in ≥1 triangle):
    * explode each triangle to its three corners, one hash aggregate. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    triangles(edges, srcCol, dstCol)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))

  /** Local clustering coefficient per vertex: 2·T(v) / (deg(v)·(deg(v)−1)),
    * 0 for degree-<2 vertices — how close each neighborhood is to a clique
    * (community-structure signal). Rides [[triangles]]' degree-oriented
    * enumeration; the canonical edge set and degrees materialize ONCE
    * (localCheckpoint) and feed both the triangle pass and the coefficient
    * join — deriving them separately re-ran the whole upstream edge
    * construction (measured 3.7 s → shared). Output
    * (id, degree, triangles, coeff 6 dp). */
  def clusteringCoefficient(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = undirected(edges, srcCol, dstCol).localCheckpoint(false)
    val deg = degreesOf(und).localCheckpoint(false)
    val t = trianglesOn(und, deg)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.withColumnRenamed("deg", "degree").join(t, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("triangles"), lit(0L))
            / (col("degree") * (col("degree") - 1)), 6))
          .otherwise(lit(0.0)).as("coeff"))
  }

  /** Adamic–Adar link prediction: for non-adjacent pairs (u < v) with at
    * least one common neighbor, score = Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg w) —
    * rare shared neighbors weigh more. Common neighbors enumerate as
    * wedges through w (one self-join of the symmetric adjacency on w);
    * `maxHubDeg` drops hub wedges BEFORE pairing (a degree-D hub alone
    * yields D² candidate pairs — the stop-bucket guard of link prediction;
    * a hub's 1/ln(D) contribution is the least informative anyway).
    * Output (u, v, common, score 6 dp). */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      maxHubDeg: Int = 0): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    val sym = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .select(col("u").as("w"), col("v").as("n"))
    val deg = sym.groupBy("w").agg(count(lit(1)).as("dw"))
    val hubFiltered =
      if (maxHubDeg > 0) sym.join(deg.filter(col("dw") <= maxHubDeg), Seq("w"))
      else sym.join(deg, Seq("w"))
    val a = hubFiltered.select(col("w"), col("n").as("pu"), col("dw"))
    val b = hubFiltered.select(col("w"), col("n").as("pv"))
    val wedges = a.join(b, Seq("w")).filter(col("pu") < col("pv"))
    val scored = wedges.groupBy(col("pu").as("u"), col("pv").as("v"))
      .agg(count(lit(1)).as("common"),
        round(sum(lit(1.0) / log(col("dw"))), 6).as("score"))
    // link PREDICTION: existing edges are excluded
    scored.join(und, scored("u") === und("u") && scored("v") === und("v"),
        "left_anti")
      .select(scored("u"), scored("v"), col("common"), col("score"))
  }

  /** k-core decomposition: the maximal subgraph where every vertex has
    * degree ≥ k, by iterative peeling — drop under-degree vertices, drop
    * edges touching them, repeat. Each round is one degree aggregate + two
    * semi-joins over the shrinking edge set; peeling is monotone, so early
    * convergence equals running all `maxIter` rounds (the oracle unrolls a
    * fixed chain and matches either way). Output: core vertices with their
    * in-core degree.
    *
    * FAILS FAST if peeling has not stabilized within `maxIter` rounds — an
    * unconverged peel is a strict superset of the true k-core (e.g. a long
    * path needs O(n) rounds), and silently returning it would hand the
    * caller wrong vertices with no signal. Callers who want the partial
    * result plus convergence stats use [[kCoreWithStats]]. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 12): DataFrame = {
    val (core, stats) = kCoreWithStats(edges, srcCol, dstCol, k, maxIter)
    require(stats.converged,
      s"kCore did not converge within maxIter=$maxIter rounds " +
        s"(per-round edge counts: ${stats.perRound.mkString(",")}); " +
        "the partial result is a superset of the true k-core — raise " +
        "maxIter or use kCoreWithStats to inspect the unconverged state")
    core
  }

  /** [[kCore]] plus its [[CcStats]] (perRound = surviving edge count after
    * each peel round; converged = the edge set was stable at loop exit).
    * Does NOT throw on non-convergence — the caller owns the decision. */
  def kCoreWithStats(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 12): (DataFrame, CcStats) = {
    require(k >= 1, "k must be positive")
    var e = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    var iter = 0
    var stable = false
    val perRound = Seq.newBuilder[Long]
    while (iter < maxIter && !stable) {
      val deg = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("id")
      val next = e
        .join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(false)
      val (ec, nc) = (e.count(), next.count())
      perRound += nc
      stable = ec == nc
      e = next
      iter += 1
    }
    // degenerate/boundary guard: the loop can exit AT the fixpoint without
    // observing it (maxIter=0 on an already-valid core, or the last allowed
    // round doing the final peel). One degree probe settles it: if no
    // surviving vertex is under k, `e` IS the k-core and the peel converged.
    if (!stable) {
      val under = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
        .filter(col("d") < k).limit(1).count()
      stable = under == 0L
    }
    val core = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_degree"))
    (core, CcStats(iter, stable, perRound.result()))
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

  /** Connected components by alternating large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    * DEEP-graph tier: converges in O(log² n) rounds regardless of component
    * diameter, where [[connectedComponents]]' label propagation needs
    * O(diameter) rounds (fine for shallow near-dup clusters, hopeless for a
    * 10⁶-hop chain). Each round is two hash aggregations + joins over the
    * edge list; the edge set only shrinks toward the final star forest.
    *
    *  - large-star: every node u links its LARGER neighbors to
    *    m = min(Γ(u) ∪ u) — long chains fold toward small ids;
    *  - small-star: with edges oriented (larger → smaller), every node links
    *    its smaller neighbors AND itself to m — stars flatten.
    *
    * Same output contract as [[connectedComponents]]: (id, label = component
    * min), vertices taken from either edge side (self-loops allowed).
    */
  def connectedComponentsStar(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame =
    connectedComponentsStarWithStats(edges, srcCol, dstCol, maxIter)._1

  /** [[connectedComponentsStar]] plus its [[CcStats]] (perRound = surviving
    * edge count after each large-star/small-star round, straight from the
    * fixpoint signature the loop already computes). */
  def connectedComponentsStarWithStats(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): (DataFrame, CcStats) = {
    val verts = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct()
      .localCheckpoint(false)
    var e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(false)

    def largeStar(in: DataFrame): DataFrame = {
      val sym = in.union(in.select(col("b").as("a"), col("a").as("b")))
      val m = sym.groupBy("a").agg(min("b").as("mb"))
        .select(col("a"), least(col("mb"), col("a")).as("m"))
      sym.join(m, Seq("a"))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    def smallStar(in: DataFrame): DataFrame = {
      val oriented = in.select(
        greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      val m = oriented.groupBy("u").agg(min("v").as("m")) // neighbors all < u
      val linked = oriented.join(m, Seq("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .union(m.select(col("u").as("a"), col("m").as("b")))
      linked.filter(col("a") =!= col("b")).distinct()
    }

    // edge-set fixpoint detected by (count, order-free XOR checksum) — one
    // aggregate action per round, no join-based diff; XOR never overflows
    // and is exact on a distinct edge set
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b")))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevSig = sig(e)
    var iter = 0
    var converged = false
    val perRound = Seq.newBuilder[Long]
    while (iter < maxIter && !converged) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = sig(next)
      perRound += nextSig._1
      converged = nextSig == prevSig
      prevSig = nextSig
      e = next
      iter += 1
    }
    // converged edges form stars (v → component min); roots label themselves
    val labels = e.select(col("a").as("id"), col("b").as("label"))
    (verts.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label")),
      CcStats(iter, converged, perRound.result()))
  }
}
