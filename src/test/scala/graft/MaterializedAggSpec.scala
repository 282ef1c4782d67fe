package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.storage.{MaterializedAgg, TxnCatalog}
import graft.storage.MaterializedAgg.AggSpec

/** [[MaterializedAgg]]: materialized GROUP BY views that refresh by
  * folding ONLY the new partitions into the stored aggregate, with a
  * manifest-derived classification that falls back to a full recompute
  * for every non-additive history. */
class MaterializedAggSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def commitBatch(root: String, part: String, lo: Int,
      hi: Int): Long =
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", part,
        (lo until hi).map(i => (i.toLong, s"g${i % 3}", i * 10L))
          .toDF("k", "grp", "v"))),
      statsColumns = Seq("k"))

  private def aggs = Seq(AggSpec("count"), AggSpec("sum", "v"),
    AggSpec("min", "v"), AggSpec("max", "v"))

  private def expected(root: String): Array[org.apache.spark.sql.Row] =
    TxnCatalog.read(spark, root, "ev").get
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum($"v").cast("long").as("sum_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy("grp").collect()

  private def view(root: String): Array[org.apache.spark.sql.Row] =
    TxnCatalog.read(spark, root, "ev_agg").get.orderBy("grp").collect()

  test("create materializes the full aggregate with its watermark") {
    val root = tmp("mv")
    commitBatch(root, "b0", 0, 100)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"), aggs)
    assert(view(root) === expected(root))
    val props = TxnCatalog.tableProperties(spark, root, "ev_agg")
    assert(props(MaterializedAgg.WatermarkProp).toLong > 0)
  }

  test("append then refresh folds only the new partitions (incremental)") {
    val root = tmp("mvinc")
    commitBatch(root, "b0", 0, 100)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"), aggs)
    commitBatch(root, "b1", 100, 150)
    commitBatch(root, "b2", 150, 160)
    val r = MaterializedAgg.refresh(spark, root, "ev_agg")
    assert(r.mode === "incremental" && r.partitionsRead === 2,
      s"two appended partitions are the whole delta, got $r")
    assert(view(root) === expected(root))
    // a second refresh with nothing new is a no-op
    assert(MaterializedAgg.refresh(spark, root, "ev_agg").mode === "noop")
  }

  test("a compaction inside the window stays incremental (reorg ignored)") {
    val root = tmp("mvopt")
    commitBatch(root, "b0", 0, 50)
    commitBatch(root, "b1", 50, 100)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"), aggs)
    TxnCatalog.compactPartitions(spark, root, "ev", Seq("b0", "b1"), "c0")
    commitBatch(root, "b2", 100, 120)
    val r = MaterializedAgg.refresh(spark, root, "ev_agg")
    assert(r.mode === "incremental" && r.partitionsRead === 1,
      s"the fold of seen batches is not a delta, got $r")
    assert(view(root) === expected(root))
  }

  test("a window with ONLY a compaction advances the watermark, reads nothing") {
    val root = tmp("mvnoop")
    commitBatch(root, "b0", 0, 50)
    commitBatch(root, "b1", 50, 100)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"), aggs)
    TxnCatalog.compactPartitions(spark, root, "ev", Seq("b0", "b1"), "c0")
    val r = MaterializedAgg.refresh(spark, root, "ev_agg")
    assert(r.mode === "incremental" && r.partitionsRead === 0, s"got $r")
    assert(view(root) === expected(root))
    assert(TxnCatalog.tableProperties(spark, root, "ev_agg")(
      MaterializedAgg.WatermarkProp).toLong ===
      TxnCatalog.currentTxn(spark, root).get)
  }

  test("equality deletes in the window force a full recompute") {
    val root = tmp("mvdel")
    commitBatch(root, "b0", 0, 100)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"), aggs)
    TxnCatalog.deleteKeys(spark, root, "ev", "k", Seq(5L, 6L).toDF("k"))
    commitBatch(root, "b1", 100, 110)
    val r = MaterializedAgg.refresh(spark, root, "ev_agg")
    assert(r.mode === "full", s"subtraction is not additive, got $r")
    assert(view(root) === expected(root))
  }

  test("a partition REWRITE in the window forces a full recompute") {
    val root = tmp("mvrw")
    commitBatch(root, "b0", 0, 100)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"), aggs)
    // rewrite b0 in place: same partition name, changed rows
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b0",
        (0 until 90).map(i => (i.toLong, s"g${i % 3}", i * 10L))
          .toDF("k", "grp", "v"))),
      statsColumns = Seq("k"))
    val r = MaterializedAgg.refresh(spark, root, "ev_agg")
    assert(r.mode === "full",
      s"a rewrite holds old rows too — adding it double-counts, got $r")
    assert(view(root) === expected(root))
  }

  test("a RESTORE of the source in the window forces a full recompute") {
    val root = tmp("mvrst")
    commitBatch(root, "b0", 0, 100)
    val t1 = TxnCatalog.currentTxn(spark, root).get
    commitBatch(root, "b1", 100, 150)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"), aggs)
    TxnCatalog.restoreTable(spark, root, "ev", t1)
    val r = MaterializedAgg.refresh(spark, root, "ev_agg")
    assert(r.mode === "full", s"a rollback subtracts rows, got $r")
    assert(view(root) === expected(root))
  }

  test("refreshes keep a stable schema across many rounds (sum type pinned)") {
    val root = tmp("mvschema")
    commitBatch(root, "b0", 0, 30)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"), aggs)
    val s0 = TxnCatalog.read(spark, root, "ev_agg").get.schema
    (1 to 3).foreach { i =>
      commitBatch(root, s"b$i", i * 30, i * 30 + 30)
      MaterializedAgg.refresh(spark, root, "ev_agg")
    }
    assert(TxnCatalog.read(spark, root, "ev_agg").get.schema === s0,
      "repeated merges must not widen the stored types")
    assert(view(root) === expected(root))
  }

  test("decimal sums stay exact: incremental equals full equals direct") {
    val root = tmp("mvdec")
    def dec(part: String, lo: Int, hi: Int): Unit =
      TxnCatalog.commitPartitions(spark, root,
        Seq(("ev", part,
          (lo until hi).map(i => (i.toLong, s"g${i % 3}", s"$i.25"))
            .toDF("k", "grp", "v")
            .withColumn("v", $"v".cast("decimal(18,2)")))),
        statsColumns = Seq("k"))
    dec("b0", 0, 100)
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("grp"),
      Seq(AggSpec("count"), AggSpec("sum", "v")))
    dec("b1", 100, 177)
    assert(MaterializedAgg.refresh(spark, root, "ev_agg").mode ===
      "incremental")
    val got = TxnCatalog.read(spark, root, "ev_agg").get
      .orderBy("grp").collect()
    val want = TxnCatalog.read(spark, root, "ev").get
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum($"v").cast("decimal(38,2)").as("sum_v"))
      .orderBy("grp").collect()
    assert(got === want)
  }
}
