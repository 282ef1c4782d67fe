package graft.ops

import graft.GraftSuite
import graft.storage.TxnCatalog
import org.apache.spark.sql.functions._

/** [[VectorLake]]: IVF cells as TxnCatalog partitions, manifest-pruned
  * ANN queries, exact-rerank equivalence against brute force. */
class VectorLakeSpec extends GraftSuite {
  import spark.implicits._

  /** 3 well-separated 4-d clusters around axis corners, 6 points each;
    * ids chosen so the k smallest ids (seeds) land one per cluster. */
  private def corpus = Seq(
    // cluster around (10, 0, 0, 0): ids 0, 3..7
    (0L, Seq(10.0, 0.0, 0.0, 0.0)), (3L, Seq(10.5, 0.2, 0.1, 0.0)),
    (4L, Seq(9.5, -0.2, 0.0, 0.1)), (5L, Seq(10.2, 0.1, -0.1, 0.0)),
    (6L, Seq(9.8, 0.0, 0.2, -0.1)), (7L, Seq(10.1, -0.1, 0.0, 0.2)),
    // cluster around (0, 10, 0, 0): ids 1, 8..12
    (1L, Seq(0.0, 10.0, 0.0, 0.0)), (8L, Seq(0.2, 10.4, 0.1, 0.0)),
    (9L, Seq(-0.1, 9.6, 0.0, 0.1)), (10L, Seq(0.1, 10.1, -0.2, 0.0)),
    (11L, Seq(0.0, 9.9, 0.2, -0.1)), (12L, Seq(-0.2, 10.2, 0.0, 0.1)),
    // cluster around (0, 0, 10, 0): ids 2, 13..17
    (2L, Seq(0.0, 0.0, 10.0, 0.0)), (13L, Seq(0.1, 0.2, 10.3, 0.0)),
    (14L, Seq(-0.1, 0.0, 9.7, 0.1)), (15L, Seq(0.2, -0.1, 10.1, 0.0)),
    (16L, Seq(0.0, 0.1, 9.9, -0.2)), (17L, Seq(-0.2, 0.0, 10.2, 0.1))
  ).toDF("vid", "emb")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("vlake").toString

  test("build commits one partition per non-empty cell plus the router, atomically") {
    val root = tmp()
    VectorLake.build(spark, root, "v", corpus, "vid", "emb",
      k = 3, iters = 2)
    val snap = TxnCatalog.snapshot(spark, root).get
    val cells = snap.partitions("v")
    assert(cells.size === 3)
    assert(cells.forall(_.startsWith("cluster=")))
    // the router holds exactly k centroids, dim 4
    val cents = snap.read(VectorLake.centroidsTable("v")).get.collect()
    assert(cents.length === 3)
    assert(cents.forall(_.getSeq[Double](1).length === 4))
    // one txn: cells and router share it
    assert(TxnCatalog.currentTxn(spark, root).get === 1L)
    // every corpus row landed in exactly one cell
    assert(snap.read("v").get.count() === 18L)
    assert(snap.read("v").get.select("id").distinct().count() === 18L)
  }

  test("probe routing prunes the read to exactly nProbe partitions") {
    val root = tmp()
    VectorLake.build(spark, root, "v", corpus, "vid", "emb",
      k = 3, iters = 2)
    val q = Seq(9.9, 0.3, 0.0, 0.0) // near cluster 1's corner
    val probes = VectorLake.probeCells(spark, root, "v", q, nProbe = 1)
    assert(probes.size === 1)
    val snap = TxnCatalog.snapshot(spark, root).get
    val kept = snap.partitionsWhereIn("v", VectorLake.CellCol, probes)
    assert(kept === probes.map(c => s"cluster=$c").sorted)
    // the 1-probe read returns exactly that cell's 6 members
    val got = VectorLake.query(spark, root, "v", q, nProbe = 1, topK = 10)
    assert(got.count() === 6L)
    // all six are the (10,0,0,0)-corner points
    val ids = got.select("id").as[Long].collect().toSet
    assert(ids === Set(0L, 3L, 4L, 5L, 6L, 7L))
  }

  test("query equals brute-force top-k restricted to the probed cells") {
    val root = tmp()
    VectorLake.build(spark, root, "v", corpus, "vid", "emb",
      k = 3, iters = 2)
    val q = Seq(5.0, 5.0, 0.5, 0.0) // between clusters 1 and 2
    val probes = VectorLake.probeCells(spark, root, "v", q, nProbe = 2)
    val got = VectorLake.query(spark, root, "v", q, nProbe = 2, topK = 5)
      .orderBy("rank").collect()
    assert(got.length === 5)
    // brute force over the same candidate set, straight from the source
    val snap = TxnCatalog.snapshot(spark, root).get
    val cand = snap.readWhereIn("v", VectorLake.CellCol, probes).get
    val qn = math.sqrt(q.map(x => x * x).sum)
    val expected = cand.collect().map { r =>
      val id = r.getAs[Long]("id")
      val e = r.getSeq[Double](r.fieldIndex("vec"))
      val dot = e.zip(q).map { case (a, b) => a * b }.sum
      val sim = BigDecimal(dot / (qn * math.sqrt(e.map(x => x * x).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, sim)
    }.sortBy { case (id, sim) => (-sim, id) }.take(5)
    got.zip(expected).foreach { case (row, (id, sim)) =>
      assert(row.getAs[Long]("id") === id)
      assert(math.abs(row.getAs[Double]("sim") - sim) < 1e-9)
    }
    // full recall here: separated clusters mean the true top-5 lives in
    // the probed cells, so ANN == exact over the whole corpus
    val all = corpus.collect().map { r =>
      val id = r.getAs[Long]("vid")
      val e = r.getSeq[Double](1)
      val dot = e.zip(q).map { case (a, b) => a * b }.sum
      (id, dot / (qn * math.sqrt(e.map(x => x * x).sum)))
    }.sortBy { case (id, sim) => (-sim, id) }.take(5).map(_._1)
    assert(got.map(_.getAs[Long]("id")).toSeq === all.toSeq)
  }

  test("append lands a new generation per cell; queries span generations") {
    val root = tmp()
    VectorLake.build(spark, root, "v", corpus, "vid", "emb",
      k = 3, iters = 2)
    // two new vectors, one clearly in each of two different cells
    val fresh = Seq(
      (100L, Seq(10.05, 0.05, 0.0, 0.0)),  // corner (10,0,0,0)
      (101L, Seq(0.0, 10.05, 0.05, 0.0))   // corner (0,10,0,0)
    ).toDF("vid", "emb")
    VectorLake.append(spark, root, "v", fresh, "vid", "emb")
    val snap = TxnCatalog.snapshot(spark, root).get
    val parts = snap.partitions("v")
    assert(parts.count(_.startsWith("cluster=")) === 3,
      "original cells untouched")
    assert(parts.count(_.matches("g2[0-9a-f]{4}-cluster=.*")) === 2,
      s"one nonce'd generation partition per touched cell: $parts")
    // the appended vector is findable and ranks first for a near-query
    val q = Seq(10.05, 0.05, 0.0, 0.0)
    val got = VectorLake.query(spark, root, "v", q, nProbe = 1, topK = 3)
      .orderBy("rank").collect()
    assert(got.head.getAs[Long]("id") === 100L)
    // pruning spans generations: a 1-probe read touches exactly the
    // probed cell's partitions (both generations), nothing else
    val probes = VectorLake.probeCells(spark, root, "v", q, nProbe = 1)
    val kept = snap.partitionsWhereIn("v", VectorLake.CellCol, probes)
    assert(kept.size === 2 && kept.forall(_.endsWith(s"=${probes.head}")),
      s"probe must keep exactly the cell's generations: $kept")
    // and the full index still holds every row exactly once
    assert(snap.read("v").get.select("id").distinct().count() === 20L)
  }

  test("filtered query: the predicate applies before the rerank") {
    val root = tmp()
    val labeled = corpus.withColumn("lab", (col("vid") % 2).cast("int"))
    VectorLake.build(spark, root, "v", labeled, "vid", "emb",
      k = 3, iters = 2, metaCols = Seq("lab"))
    val q = Seq(10.0, 0.0, 0.0, 0.0)
    val filtered = VectorLake.query(spark, root, "v", q,
        nProbe = 3, topK = 5, where = Some(col("lab") === 0))
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1)))
    // reference: unfiltered over ALL cells, filter even ids, re-rank
    val all = VectorLake.query(spark, root, "v", q, nProbe = 3, topK = 18)
      .filter(col("id") % 2 === 0)
      .limit(5).collect().map(_.getLong(0))
    assert(filtered.map(_._1).toSeq === all.toSeq,
      "filter-then-rank must equal rank-then-filter on the same probes")
    assert(filtered.map(_._2).toSeq === (1 to filtered.length),
      "ranks are dense over the filtered candidates")
    assert(filtered.forall(_._1 % 2 == 0), "the predicate held")
  }

  test("rebuild replaces the index atomically; old snapshot still queryable") {
    val root = tmp()
    VectorLake.build(spark, root, "v", corpus, "vid", "emb",
      k = 3, iters = 2)
    // append a generation so the rebuild has BOTH cell shapes to clear
    VectorLake.append(spark, root, "v",
      Seq((100L, Seq(10.0, 0.1, 0.0, 0.0))).toDF("vid", "emb"),
      "vid", "emb")
    val txn1 = TxnCatalog.currentTxn(spark, root).get
    // rebuild with a coarser k over a shifted corpus: ONE commit swaps
    // everything — stale cells AND append generations are gone
    val moved = corpus.withColumn("emb",
      transform(col("emb"), x => x + lit(1.0)))
    VectorLake.build(spark, root, "v", moved, "vid", "emb",
      k = 2, iters = 2)
    val snap2 = TxnCatalog.snapshot(spark, root).get
    assert(snap2.partitions("v").size === 2,
      s"rebuild must leave only the fresh cells: ${snap2.partitions("v")}")
    assert(snap2.read("v").get.count() === 18L,
      "the appended vector belongs to the OLD index, not the rebuild")
    assert(TxnCatalog.currentTxn(spark, root).get === txn1 + 1,
      "a rebuild is exactly one txn")
    // time travel: the pre-rebuild index (with its generation) answers
    val old = TxnCatalog.snapshotAt(spark, root, txn1)
    assert(old.partitions("v").size === 4)
    assert(old.read("v").get.count() === 19L)
  }
}
