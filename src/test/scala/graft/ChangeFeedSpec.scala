package graft

import graft.storage.TxnCatalog
import org.apache.spark.sql.functions._

/** [[TxnCatalog.changeFeed]]: row-level CDC derived from the manifest —
  * inserts at their data txn, delete keys as events, reorgs invisible,
  * and replay reconstructing the snapshot. */
class ChangeFeedSpec extends GraftSuite {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("cdc").toString

  private def feed(root: String, from: Long, to: Long) =
    TxnCatalog.changeFeed(spark, root, "t", from, to).get
      .select("k", "v", "_change_type", "_txn")

  test("inserts tag their committing txn; the window filters by it") {
    val root = tmp()
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=0", Seq((1L, "a"), (2L, "b")).toDF("k", "v")),
      ("t", "b=1", Seq((3L, "c")).toDF("k", "v"))))
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=2", Seq((4L, "d")).toDF("k", "v"))))
    val all = feed(root, 0, 2).collect()
    assert(all.length === 4)
    assert(all.forall(_.getAs[String]("_change_type") === "insert"))
    assert(all.filter(_.getAs[Long]("_txn") == 1L).map(_.getAs[Long]("k"))
      .toSet === Set(1L, 2L, 3L))
    assert(all.filter(_.getAs[Long]("_txn") == 2L).map(_.getAs[Long]("k"))
      .toSet === Set(4L))
    // an advanced watermark delivers only the newer commit
    assert(feed(root, 1, 2).select("k").as[Long].collect().toSet === Set(4L))
    // empty window: zero rows, feed schema intact
    val empty = feed(root, 2, 2)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("k", "v", "_change_type", "_txn"))
  }

  test("delete keys emit as delete events with null payload") {
    val root = tmp()
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=0", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))))
    TxnCatalog.deleteKeys(spark, root, "t", "k",
      Seq(2L, 99L).toDF("k")) // 99 never existed — still an event
    val f = feed(root, 0, 2).collect()
    val dels = f.filter(_.getAs[String]("_change_type") == "delete")
    assert(dels.map(_.getAs[Long]("k")).toSet === Set(2L, 99L))
    assert(dels.forall(_.isNullAt(1))) // v is null on delete events
    assert(dels.forall(_.getAs[Long]("_txn") === 2L))
    // the insert events are unaffected (CDC replays history, not state)
    assert(f.count(_.getAs[String]("_change_type") == "insert") === 3)
  }

  test("compaction inside the window emits nothing (reorgs are invisible)") {
    val root = tmp()
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=0", Seq((1L, "a")).toDF("k", "v")),
      ("t", "b=1", Seq((2L, "b")).toDF("k", "v"))))
    TxnCatalog.compactPartitions(spark, root, "t",
      Seq("b=0", "b=1"), "c=0")
    // consumer already saw txn 1: the compaction (txn 2) delivers zero
    assert(feed(root, 1, 2).count() === 0)
    // a consumer starting from scratch still gets the data, once
    assert(feed(root, 0, 2).select("k").as[Long].collect().toSet
      === Set(1L, 2L))
  }

  test("replaying the feed reconstructs the snapshot for append+delete histories") {
    val root = tmp()
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=0", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))))
    TxnCatalog.deleteKeys(spark, root, "t", "k", Seq(2L).toDF("k"))
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=1", Seq((2L, "b2"), (3L, "c")).toDF("k", "v")))) // re-insert
    val to = TxnCatalog.currentTxn(spark, root).get
    val f = feed(root, 0, to)
    // fold: a row survives iff no delete event on its key has a LATER txn
    val ins = f.filter($"_change_type" === "insert")
    val del = f.filter($"_change_type" === "delete")
      .select($"k".as("dk"), $"_txn".as("dtxn"))
    val replayed = ins.join(del,
        ins("k") === del("dk") && del("dtxn") > ins("_txn"), "left_anti")
      .select("k", "v")
    val state = TxnCatalog.read(spark, root, "t").get.select("k", "v")
    assert(replayed.collect().toSet === state.collect().toSet)
    // and the re-inserted key is back with its new value
    assert(state.filter($"k" === 2L).select("v").as[String].collect()
      .toSeq === Seq("b2"))
  }

  test("a rewrite re-emits survivors as inserts at the new data txn") {
    val root = tmp()
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=0", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))),
      statsColumns = Seq("k"))
    TxnCatalog.deleteWhere(spark, root, "t", "k", 2L, 2L)
    val f = feed(root, 1, 2).collect()
    // the rewritten partition re-delivers its SURVIVING rows
    assert(f.forall(_.getAs[String]("_change_type") === "insert"))
    assert(f.map(_.getAs[Long]("k")).toSet === Set(1L, 3L))
  }
}
