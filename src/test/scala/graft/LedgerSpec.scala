package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.storage.{TwinCommit, TxnCatalog}

/** Streaming-sink idempotence ledger (appId → version in `~p`): replay
  * evidence must survive inline maintenance renaming `batch=*`
  * partitions — partition-existence alone breaks the exactly-once
  * guarantee the moment compaction folds a batch before the stream's
  * checkpoint records it. */
class LedgerSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "s")

  test("ledgered appendBatch replay after compaction is a no-op") {
    val root = tmp("ledg")
    val app = "ck-A"
    TxnCatalog.appendBatch(spark, root, "t", "b0", rows(0, 50),
      ledger = Some((app, 0L)))
    TxnCatalog.appendBatch(spark, root, "t", "b1", rows(50, 80),
      ledger = Some((app, 1L)))
    assert(TxnCatalog.lastLedgerVersion(spark, root, "t", app) === Some(1L))
    // inline maintenance folds every batch partition into c<txn> — the
    // batch=b* names the old idempotence check relied on are gone
    val parts = TxnCatalog.partitions(spark, root, "t")
    TxnCatalog.compactPartitions(spark, root, "t", parts, "cX")
    assert(TxnCatalog.partitions(spark, root, "t") === Seq("cX"))
    // crash-before-checkpoint redelivery of both batches: ledger says
    // applied → nothing lands twice
    TxnCatalog.appendBatch(spark, root, "t", "b0", rows(0, 50),
      ledger = Some((app, 0L)))
    TxnCatalog.appendBatch(spark, root, "t", "b1", rows(50, 80),
      ledger = Some((app, 1L)))
    assert(TxnCatalog.partitions(spark, root, "t") === Seq("cX"),
      "replayed batches must not re-append after the fold")
    assert(TxnCatalog.read(spark, root, "t").get.count() === 80)
    // a genuinely NEW batch still lands
    TxnCatalog.appendBatch(spark, root, "t", "b2", rows(80, 90),
      ledger = Some((app, 2L)))
    assert(TxnCatalog.read(spark, root, "t").get.count() === 90)
  }

  test("unledgered replay after compaction duplicates — the ledger is load-bearing") {
    val root = tmp("ledg0")
    TxnCatalog.appendBatch(spark, root, "t", "b0", rows(0, 10))
    TxnCatalog.compactPartitions(spark, root, "t",
      TxnCatalog.partitions(spark, root, "t"), "cX")
    TxnCatalog.appendBatch(spark, root, "t", "b0", rows(0, 10))
    assert(TxnCatalog.read(spark, root, "t").get.count() === 20,
      "this pins the failure mode the ledger exists to prevent")
  }

  test("ledgered twin append replay after maintain folds is a no-op") {
    val root = tmp("ledgt")
    val app = "ck-T"
    def twin(id: Long, lo: Int, hi: Int): Unit =
      TwinCommit.append(spark, root, s"b$id",
        rows(lo, hi), "cat",
        rows(lo, hi).select($"id", lit(id).as("batch")), "lin",
        ledger = Some((app, id)))
    twin(0, 0, 30); twin(1, 30, 50)
    assert(TwinCommit.maintain(spark, root, "cat", "lin",
      maxBatches = 2).isDefined)
    // redeliver both after the fold: ledger blocks both tables at once
    twin(0, 0, 30); twin(1, 30, 50)
    assert(TxnCatalog.read(spark, root, "cat").get.count() === 50)
    assert(TxnCatalog.read(spark, root, "lin").get.count() === 50)
    twin(2, 50, 60)
    assert(TxnCatalog.read(spark, root, "cat").get.count() === 60)
    assert(TxnCatalog.read(spark, root, "lin").get.count() === 60)
  }

  test("two apps' ledgers on one table never lose updates to each other") {
    val root = tmp("ledg2")
    // interleaved appends under different app ids: each ledger write is
    // a conditional read-modify-write of the shared ~p entry, so a lost
    // update would silently drop the other app's high-water mark
    val threads = (0 until 2).map { a =>
      new Thread(() => {
        (0 until 5).foreach { v =>
          TxnCatalog.appendBatch(spark, root, "t", s"a$a-b$v",
            rows(a * 1000 + v * 10, a * 1000 + v * 10 + 10),
            ledger = Some((s"app$a", v.toLong)))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(TxnCatalog.lastLedgerVersion(spark, root, "t", "app0") === Some(4L))
    assert(TxnCatalog.lastLedgerVersion(spark, root, "t", "app1") === Some(4L))
    assert(TxnCatalog.read(spark, root, "t").get.count() === 100)
  }

  test("ledger survives clustering and carries through whole-table overwrite rules") {
    val root = tmp("ledg3")
    val app = "ck-Z"
    TxnCatalog.appendBatch(spark, root, "t", "b0",
      (0 until 200).map(i => (i.toLong, (i * 7 % 100).toLong)).toDF("x", "y"),
      statsColumns = Seq("x", "y"), ledger = Some((app, 0L)))
    TxnCatalog.clusterPartitions(spark, root, "t",
      TxnCatalog.partitions(spark, root, "t"), "z", "x", "y",
      buckets = 4)
    assert(TxnCatalog.lastLedgerVersion(spark, root, "t", app) === Some(0L),
      "clustering must not erase the ledger")
    TxnCatalog.appendBatch(spark, root, "t", "b0",
      (0 until 200).map(i => (i.toLong, (i * 7 % 100).toLong)).toDF("x", "y"),
      statsColumns = Seq("x", "y"), ledger = Some((app, 0L)))
    assert(TxnCatalog.read(spark, root, "t").get.count() === 200)
  }
}
