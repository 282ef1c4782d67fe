package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.storage.TxnCatalog

/** [[Streams.scd2ApplySink]] — APPLY CHANGES ... STORED AS SCD TYPE 2:
  * the target keeps every key's full version history, append-only
  * (closed rows immutable), exactly-once (ledgered), batch-split
  * invariant. Versions bracket by source txn: `__valid_from` = the
  * change's txn, `__valid_to` = the key's next change (NULL while
  * open), `__current` marks the open version. */
class Scd2ApplySpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def feedOf(root: String) =
    spark.readStream.format("graft-lake")
      .option("root", root).option("table", "src")
      .option("readChangeFeed", "true").load()

  /** (key, value, valid_from, valid_to (-1 = open), current) */
  private def history(root: String): Set[(Long, String, Long, Long, Boolean)] =
    TxnCatalog.read(spark, root, "tgt").get
      .select(col("k"), col("v"), col("__valid_from"),
        coalesce(col("__valid_to"), lit(-1L)), col("__current"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet

  test("full lifecycle: load, update, delete, re-insert — history exact") {
    val bronze = tmp("s2b"); val silver = tmp("s2s"); val ckpt = tmp("s2c")
    TxnCatalog.commitPartitions(spark, bronze,              // txn 1
      Seq(("src", "b0", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))),
      statsColumns = Seq("k"))
    val q = Streams.scd2ApplySink(feedOf(bronze), silver, "tgt", "k", ckpt,
      statsColumns = Seq("k"))
    try {
      q.processAllAvailable()
      assert(history(silver) === Set(
        (1L, "a", 1L, -1L, true), (2L, "b", 1L, -1L, true)))
      TxnCatalog.commitPartitions(spark, bronze,            // txn 2: update 1
        Seq(("src", "b1", Seq((1L, "a2")).toDF("k", "v"))))
      q.processAllAvailable()
      assert(history(silver) === Set(
        (1L, "a", 1L, 2L, false), (1L, "a2", 2L, -1L, true),
        (2L, "b", 1L, -1L, true)))
      TxnCatalog.deleteKeys(spark, bronze, "src", "k",      // txn 3: delete 2
        Seq(2L).toDF("k"))
      q.processAllAvailable()
      assert(history(silver) === Set(
        (1L, "a", 1L, 2L, false), (1L, "a2", 2L, -1L, true),
        (2L, "b", 1L, 3L, false)))
      TxnCatalog.commitPartitions(spark, bronze,            // txn 4: re-insert 2
        Seq(("src", "b2", Seq((2L, "b4")).toDF("k", "v"))))
      q.processAllAvailable()
      assert(history(silver) === Set(
        (1L, "a", 1L, 2L, false), (1L, "a2", 2L, -1L, true),
        (2L, "b", 1L, 3L, false), (2L, "b4", 4L, -1L, true)))
    } finally q.stop()
  }

  test("batch-split invariance: 1 micro-batch ≡ N micro-batches") {
    def commits(bronze: String): Seq[() => Unit] = Seq(
      () => TxnCatalog.commitPartitions(spark, bronze,
        Seq(("src", "b0", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))),
        statsColumns = Seq("k")),
      () => TxnCatalog.commitPartitions(spark, bronze,
        Seq(("src", "b1", Seq((1L, "a2"), (3L, "c")).toDF("k", "v")))),
      () => TxnCatalog.deleteKeys(spark, bronze, "src", "k",
        Seq(2L).toDF("k")),
      () => TxnCatalog.commitPartitions(spark, bronze,
        Seq(("src", "b2", Seq((2L, "b2"), (1L, "a3")).toDF("k", "v")))))
    // incremental: one trigger per bronze txn
    val b1 = tmp("s2ib"); val s1 = tmp("s2is"); val c1 = tmp("s2ic")
    val cs1 = commits(b1); cs1.head.apply()
    val q1 = Streams.scd2ApplySink(feedOf(b1), s1, "tgt", "k", c1)
    try {
      q1.processAllAvailable()
      cs1.tail.foreach { c => c.apply(); q1.processAllAvailable() }
    } finally q1.stop()
    // bulk: every txn already in bronze before the stream starts
    val b2 = tmp("s2bb"); val s2 = tmp("s2bs"); val c2 = tmp("s2bc")
    commits(b2).foreach(_.apply())
    val q2 = Streams.scd2ApplySink(feedOf(b2), s2, "tgt", "k", c2)
    try q2.processAllAvailable() finally q2.stop()
    assert(history(s1) === history(s2),
      "the same feed split differently must yield the identical history")
    assert(history(s1) === Set(
      (1L, "a", 1L, 2L, false), (1L, "a2", 2L, 4L, false),
      (1L, "a3", 4L, -1L, true),
      (2L, "b", 1L, 3L, false), (2L, "b2", 4L, -1L, true),
      (3L, "c", 2L, -1L, true)))
  }

  test("restart resumes exactly-once; closed history survives") {
    val bronze = tmp("s2rb"); val silver = tmp("s2rs"); val ckpt = tmp("s2rc")
    TxnCatalog.commitPartitions(spark, bronze,
      Seq(("src", "b0", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))),
      statsColumns = Seq("k"))
    def run(): Unit = {
      val q = Streams.scd2ApplySink(feedOf(bronze), silver, "tgt", "k", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // changes while the stream is down; restart applies only the delta
    TxnCatalog.commitPartitions(spark, bronze,
      Seq(("src", "b1", Seq((1L, "a2")).toDF("k", "v"))))
    run()
    run() // an idle restart replays nothing
    assert(history(silver) === Set(
      (1L, "a", 1L, 2L, false), (1L, "a2", 2L, -1L, true),
      (2L, "b", 1L, -1L, true)))
  }

  test("append-only: a later change leaves earlier batch dirs untouched") {
    val bronze = tmp("s2ab"); val silver = tmp("s2as"); val ckpt = tmp("s2ac")
    TxnCatalog.commitPartitions(spark, bronze,
      Seq(("src", "b0", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))),
      statsColumns = Seq("k"))
    val q = Streams.scd2ApplySink(feedOf(bronze), silver, "tgt", "k", ckpt)
    try {
      q.processAllAvailable()
      def dirs(): Set[String] = new java.io.File(s"$silver/tgt").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      val before = dirs()
      TxnCatalog.commitPartitions(spark, bronze,
        Seq(("src", "b1", Seq((1L, "a2")).toDF("k", "v"))))
      q.processAllAvailable()
      val after = dirs()
      assert(before.subsetOf(after),
        "closing a version must append, never rewrite earlier batches")
    } finally q.stop()
  }

  test("null keys are dropped") {
    val bronze = tmp("s2nb"); val silver = tmp("s2ns"); val ckpt = tmp("s2nc")
    TxnCatalog.commitPartitions(spark, bronze,
      Seq(("src", "b0",
        Seq((Some(1L), "a"), (None, "x")).toDF("k", "v"))),
      statsColumns = Seq("k"))
    val q = Streams.scd2ApplySink(feedOf(bronze), silver, "tgt", "k", ckpt)
    try q.processAllAvailable() finally q.stop()
    assert(history(silver) === Set((1L, "a", 1L, -1L, true)))
  }
}
