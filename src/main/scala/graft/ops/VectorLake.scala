package graft.ops

import graft.storage.TxnCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** An IVF-partitioned vector index ON the lake: k-means cells become
  * [[TxnCatalog]] partitions, the centroid table becomes the router, and
  * an ANN query is a manifest-pruned read of `nProbe` partitions plus an
  * exact cosine rerank — FAISS's IVF flat layout re-expressed as table
  * layout, so the "index" inherits every storage property for free
  * (atomic rebuild via one commit, time travel, vacuum, incremental
  * `diffData` consumption, Catalyst-planned reads).
  *
  * 100 TB shape: the corpus writes once, clustered by cell; centroids are
  * k rows (driver/broadcast-sized BY DESIGN — k ~ √n even at billions of
  * vectors keeps the router in MBs); a query touches `nProbe / k` of the
  * data and the pruning decision costs one manifest read, no file IO.
  * Contrast the brute-force tier ([[Similarity.bruteForceTopK]]): same
  * answer on the probed subset, but every query scans the corpus.
  *
  * Determinism: cells come from [[Clustering.kmeansFit]] (smallest-id
  * seeds, 6-dp-pinned centroids), probe routing uses the same
  * d = q·q − 2·q·c + c·c expansion with the same sequential-fold dot
  * product ([[graft.expressions.DotProduct]] semantics) and (d, cid)
  * tie-break, and reranks round cosine to 6 dp before ordering — the
  * whole build→route→rerank path replays identically cross-engine
  * (oracle query `s_ann_lake`).
  */
object VectorLake {

  /** Vector-table column names (`id`, `cluster`, `vec`). */
  val IdCol = "id"
  val CellCol = "cluster"
  val VecCol = "vec"

  /** The centroid router table that [[build]] writes beside `table`. */
  def centroidsTable(table: String): String = s"${table}_centroids"

  /** Cluster `corpus` into k cells and commit the index atomically: one
    * `cluster=<cid>` partition per non-empty cell (columns (id, cluster,
    * vec), range stats on `cluster` — each partition's min = max = cid,
    * so probes prune exactly) plus the k-row centroid router
    * `<table>_centroids` (cid, ce), all in ONE txn — readers see the
    * whole index or none of it, and a rebuild replaces it atomically.
    * The cells land through [[TxnCatalog.commitPartitioned]]: ONE
    * partitionBy write job and ONE grouped stats job regardless of k,
    * with the router staged beside them in the same manifest CAS.
    * Ids must be numeric (cell dirs + probe ordering key off them).
    * Returns the committed txn. */
  def build(spark: SparkSession, root: String, table: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, metaCols: Seq[String] = Nil): Long = {
    metaCols.foreach(c => require(corpus.columns.contains(c),
      s"no metadata column '$c' in the corpus"))
    val (assigned, cents) = Clustering.kmeansFit(corpus, idCol, vecCol,
      k, iters)
    // metadata columns ride each cell row (FILTERED vector search:
    // a query predicate applies before the rerank, and their min/max
    // stats let a selective filter prune whole cells at manifest cost)
    val v = corpus.select(col(idCol).as(IdCol) +:
      Similarity.toDouble(col(vecCol)).as(VecCol) +:
      metaCols.map(col): _*)
    // pin the Lloyd result once: the bulk write and the grouped stats
    // pass both read this frame — without the checkpoint each would
    // replay the full k-means
    val cells = v.join(assigned.select(col("id"), col("cluster").as(CellCol)),
      Seq(IdCol)).localCheckpoint()
    // a REBUILD swaps out every live index partition — cells of any
    // previous build, append generations, and the old router — in the
    // SAME txn, so stale cells from a different k or appended
    // generations can never linger beside the fresh tiling
    val stale = TxnCatalog.snapshot(spark, root).map { snap =>
      snap.partitions(table).map((table, _)) ++
        snap.partitions(centroidsTable(table))
          .map((centroidsTable(table), _))
    }.getOrElse(Nil)
    TxnCatalog.commitPartitioned(spark, root, table, cells, CellCol,
      statsColumns = CellCol +: metaCols,
      extraUpdates = Seq((centroidsTable(table), "all",
        cents.select(col("cid"), col("ce")))),
      drops = stale.filterNot { case (t, p) =>
        // entries this commit replaces by name drop implicitly
        t == centroidsTable(table) && p == "all"
      })
  }

  /** Incrementally index NEW vectors: route each to the EXISTING
    * router's nearest centroid (one broadcast argmin over the corpus —
    * the same distance expansion and (d, cid) tie-break the build and
    * the query side use) and land them as a fresh GENERATION of cell
    * partitions, `g<txn>-cluster=<cid>`, via one bulk commit. Pruning
    * reads stats, never names, so a probe scans every generation of its
    * cells and nothing else; centroids do not move (classic IVF add —
    * rebuild when drift warrants, the generational-clustering trade).
    * Returns the committed txn. */
  def append(spark: SparkSession, root: String, table: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      metaCols: Seq[String] = Nil): Long = {
    val snap = TxnCatalog.snapshot(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no catalog at $root"))
    val cents = snap.read(centroidsTable(table)).getOrElse(
      throw new IllegalArgumentException(
        s"no centroid table for '$table' — build the index first"))
    val v = corpus.select(col(idCol).as(IdCol) +:
        Similarity.toDouble(col(vecCol)).as(VecCol) +:
        metaCols.map(col): _*)
      .withColumn("en", Similarity.dot(col(VecCol), col(VecCol)))
    val centsRow = cents
      .withColumn("cn", Similarity.dot(col("ce"), col("ce")))
      .agg(collect_list(struct(col("cid"), col("ce"), col("cn"))).as("cs"))
    val assigned = v.crossJoin(broadcast(centsRow))
      .withColumn("best", array_min(transform(col("cs"), c =>
        struct(
          (col("en") - lit(2.0) * Similarity.dot(col(VecCol), c.getField("ce"))
            + c.getField("cn")).as("d"),
          c.getField("cid").as("cid")))))
      .select(col(IdCol) +: col(VecCol) +: col("best.cid").as(CellCol) +:
        metaCols.map(col): _*)
    // the generation name carries a nonce beside the txn: two appends
    // racing from the same pinned snapshot then land DISTINCT
    // partitions instead of the later one silently replacing the
    // earlier one's same-named entries
    val nonce = java.util.UUID.randomUUID().toString.take(4)
    TxnCatalog.commitPartitioned(spark, root, table, assigned, CellCol,
      statsColumns = CellCol +: metaCols,
      partPrefix = s"g${snap.txn + 1}$nonce-")
  }

  /** The `nProbe` cells nearest to `q`, in (distance, cid) order — the
    * router step alone, for callers that want the pruning decision
    * (tests assert `partitionsWhereIn` keeps exactly these). Distances
    * use the same sequential-fold dot product as the SQL side, so the
    * ranking is bit-identical to `list_dot_product` arithmetic. */
  def probeCells(spark: SparkSession, root: String, table: String,
      q: Seq[Double], nProbe: Int): Seq[Long] =
    probeCells(snapshotOf(spark, root), table, q, nProbe)

  /** [[probeCells]] against a PINNED snapshot — [[query]] threads one
    * snapshot through routing AND reading, so a rebuild committed
    * between the two steps can never mix one generation's centroids
    * with another's cells. */
  def probeCells(snap: TxnCatalog.Snapshot, table: String,
      q: Seq[Double], nProbe: Int): Seq[Long] = {
    require(nProbe > 0, "nProbe must be positive")
    val cents = snap.read(centroidsTable(table)).getOrElse(
      throw new IllegalArgumentException(
        s"no centroid table for '$table' — build the index first"))
      .select("cid", "ce").collect()
    val qn = fold(q, q)
    cents.toSeq.map { r =>
      val cid = r.get(0).asInstanceOf[Number].longValue()
      val ce = r.getSeq[Double](1)
      (qn - 2.0 * fold(q, ce) + fold(ce, ce), cid)
    }.sorted.take(nProbe).map(_._2)
  }

  private def snapshotOf(spark: SparkSession, root: String) =
    TxnCatalog.snapshot(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no catalog at $root"))

  /** ANN top-k: route `q` to its `nProbe` nearest cells, read ONLY those
    * partitions (manifest-pruned `readWhereIn` on the cell column), and
    * exact-rerank by cosine — (id, cluster, sim, rank), best first.
    * The global sort is a TakeOrderedAndProject (top-k per partition,
    * k-row merge on the driver), never a full sort. */
  def query(spark: SparkSession, root: String, table: String,
      q: Seq[Double], nProbe: Int, topK: Int): DataFrame =
    query(spark, root, table, q, nProbe, topK, where = None)

  /** FILTERED ANN: [[query]] with an attribute predicate over the
    * indexed metadata columns ([[build]]'s `metaCols`), applied to the
    * probed cells BEFORE the rerank — hybrid search (`label = 3 AND
    * cosine top-k`) at one scan of the probe set. Selective filters
    * can return fewer than `topK` rows from the probed cells (the
    * classic IVF-filter recall trade) — raise `nProbe` when the
    * predicate is narrow. */
  def query(spark: SparkSession, root: String, table: String,
      q: Seq[Double], nProbe: Int, topK: Int,
      where: Option[Column]): DataFrame = {
    require(topK > 0, "topK must be positive")
    // ONE snapshot for routing and reading (atomic-rebuild safety)
    val snap = snapshotOf(spark, root)
    val probes = probeCells(snap, table, q, nProbe)
    val cand0 = snap.readWhereIn(table, CellCol, probes).getOrElse(
      throw new IllegalArgumentException(s"no vector table '$table'"))
    val cand = where.foldLeft(cand0)(_.filter(_))
    val qArr: Column = array(q.map(lit): _*)
    val qNorm = math.sqrt(fold(q, q))
    cand
      .withColumn("sim", round(
        Similarity.dot(col(VecCol), qArr) /
          (lit(qNorm) * sqrt(Similarity.dot(col(VecCol), col(VecCol)))), 6))
      .orderBy(col("sim").desc, col(IdCol))
      .limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col(IdCol))))
      .select(col(IdCol), col(CellCol), col("sim"), col("rank"))
  }

  /** Sequential-fold dot product — the iteration order
    * [[graft.expressions.DotProduct]] and DuckDB's `list_dot_product`
    * share, so driver-side routing reproduces their doubles exactly. */
  private def fold(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }
}
