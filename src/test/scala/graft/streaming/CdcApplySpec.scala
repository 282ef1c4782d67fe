package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.storage.TxnCatalog

/** [[Streams.cdcApplySink]] — APPLY CHANGES INTO: a row-level change
  * stream maintains the target as its latest-row-per-key projection,
  * exactly-once (ledgered), O(changes) per trigger (merge-on-read,
  * never a target rewrite). */
class CdcApplySpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def bronzeWith(root: String, rows: Seq[(Long, String)]): Unit =
    TxnCatalog.commitPartitions(spark, root,
      Seq(("src", "b0", rows.toDF("k", "v"))),
      statsColumns = Seq("k"))

  private def feedOf(root: String) =
    spark.readStream.format("graft-lake")
      .option("root", root).option("table", "src")
      .option("readChangeFeed", "true").load()

  private def silverRows(root: String): Set[(Long, String)] =
    TxnCatalog.read(spark, root, "tgt").get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("latest-per-key projection: upserts, deletes, re-inserts") {
    val bronze = tmp("cdcb"); val silver = tmp("cdcs"); val ckpt = tmp("cdcc")
    bronzeWith(bronze, Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val q = Streams.cdcApplySink(feedOf(bronze), silver, "tgt", "k", ckpt,
      statsColumns = Seq("k"))
    try {
      q.processAllAvailable()
      assert(silverRows(silver) === Set((1L, "a"), (2L, "b"), (3L, "c")))
      // delete 2, update 1, insert 4 — arriving as later txns
      TxnCatalog.deleteKeys(spark, bronze, "src", "k", Seq(2L).toDF("k"))
      TxnCatalog.commitPartitions(spark, bronze,
        Seq(("src", "b1", Seq((1L, "a2"), (4L, "d")).toDF("k", "v"))))
      q.processAllAvailable()
      assert(silverRows(silver) === Set((1L, "a2"), (3L, "c"), (4L, "d")))
      // delete-then-reinsert of the same key across two bronze txns,
      // both landing in ONE micro-batch: the re-insert (higher txn) wins
      TxnCatalog.deleteKeys(spark, bronze, "src", "k", Seq(3L).toDF("k"))
      TxnCatalog.commitPartitions(spark, bronze,
        Seq(("src", "b2", Seq((3L, "c3")).toDF("k", "v"))))
      q.processAllAvailable()
      assert(silverRows(silver) === Set((1L, "a2"), (3L, "c3"), (4L, "d")))
    } finally q.stop()
  }

  test("restart resumes exactly-once; a replayed batch is a ledger no-op") {
    val bronze = tmp("cdcrb"); val silver = tmp("cdcrs"); val ckpt = tmp("cdcrc")
    bronzeWith(bronze, Seq((1L, "a"), (2L, "b")))
    def run(): Unit = {
      val q = Streams.cdcApplySink(feedOf(bronze), silver, "tgt", "k", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(silverRows(silver) === Set((1L, "a"), (2L, "b")))
    // changes while the stream is down; restart applies only the delta
    TxnCatalog.deleteKeys(spark, bronze, "src", "k", Seq(1L).toDF("k"))
    run()
    assert(silverRows(silver) === Set((2L, "b")))
    // storage-level replay: re-applying an already-ledgered version
    // commits nothing (false) and the table is unchanged
    val applied = TxnCatalog.mergeBatchLedgered(spark, silver, "tgt", "k",
      Some(Seq(2L).toDF("k")), None, ckpt, 0L)
    assert(!applied, "a ledgered version must be refused on replay")
    assert(silverRows(silver) === Set((2L, "b")))
  }

  test("apply is O(changes): untouched target partitions keep their dirs") {
    val bronze = tmp("cdcob"); val silver = tmp("cdcos"); val ckpt = tmp("cdcoc")
    bronzeWith(bronze, Seq((1L, "a"), (2L, "b")))
    val q = Streams.cdcApplySink(feedOf(bronze), silver, "tgt", "k", ckpt)
    try {
      q.processAllAvailable()
      val dirsBefore = new java.io.File(s"$silver/tgt").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      TxnCatalog.commitPartitions(spark, bronze,
        Seq(("src", "b1", Seq((9L, "i")).toDF("k", "v"))))
      q.processAllAvailable()
      val dirsAfter = new java.io.File(s"$silver/tgt").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirsBefore.subsetOf(dirsAfter),
        "CDC apply must append, never rewrite existing batches")
      assert(silverRows(silver) ===
        Set((1L, "a"), (2L, "b"), (9L, "i")))
    } finally q.stop()
  }

  test("null-keyed change rows are dropped, not crashed on") {
    val bronze = tmp("cdcnb"); val silver = tmp("cdcns"); val ckpt = tmp("cdcnc")
    TxnCatalog.commitPartitions(spark, bronze,
      Seq(("src", "b0",
        Seq((Some(1L), "a"), (None, "ghost"), (Some(2L), "b"))
          .toDF("k", "v"))),
      statsColumns = Seq("k"))
    val q = Streams.cdcApplySink(feedOf(bronze), silver, "tgt", "k", ckpt)
    try {
      q.processAllAvailable()
      assert(silverRows(silver) === Set((1L, "a"), (2L, "b")))
    } finally q.stop()
  }
}
