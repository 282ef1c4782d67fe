package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.storage.TxnCatalog

/** [[TxnCatalog.deleteWhere]]: skipping-aware physical DELETE —
  * overlapping partitions rewritten, disjoint partitions carried forward
  * byte-identical, nulls survive, rival commits fail the delete cleanly.
  */
class DeleteSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  /** 4 batches range-disjoint on k: [0,100), [100,200), ... */
  private def rangeLake(root: String): Unit = {
    val df = (0 until 400).map(i => (i.toLong, s"r$i")).toDF("k", "name")
    TxnCatalog.commitPartitions(spark, root,
      (0 until 4).map(b => ("t", s"batch=$b",
        df.filter($"k" >= b * 100L && $"k" < (b + 1) * 100L))),
      statsColumns = Seq("k"), bloomColumns = Seq("k"))
  }

  private def dirOf(root: String, part: String): String = {
    // the live version dir name of a partition, via the partition listing
    val p = new java.io.File(s"$root/t/$part")
    p.listFiles().filter(_.isDirectory).map(_.getName).sorted.mkString(",")
  }

  test("deleteWhere rewrites only overlapping partitions") {
    val root = tmp("delrange"); rangeLake(root)
    val b0Before = dirOf(root, "batch=0")
    val b3Before = dirOf(root, "batch=3")
    val touchedBefore = dirOf(root, "batch=1")
    TxnCatalog.deleteWhere(spark, root, "t", "k", 150L, 249L)
    val got = TxnCatalog.read(spark, root, "t").get
      .select("k").as[Long].collect().sorted
    assert(got === (0 until 400).map(_.toLong)
      .filterNot(k => k >= 150 && k <= 249).toArray)
    // disjoint partitions: same version dirs, no rewrite
    assert(dirOf(root, "batch=0") === b0Before,
      "batch=0 is disjoint from [150,249] and must carry forward untouched")
    assert(dirOf(root, "batch=3") === b3Before)
    // overlapping partition gained a new version dir
    assert(dirOf(root, "batch=1") !== touchedBefore)
    // stats re-measured on the rewritten slice: range probe now prunes
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.partitionsWhere("t", "k", 150L, 199L).isEmpty,
      "rewritten batch=1 stats must exclude the deleted range")
  }

  test("deleteWhere keeps null keys (SQL DELETE semantics)") {
    val root = tmp("delnull")
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (null, "n1"), (3L, "c"), (null, "n2")).toDF("k", "name")
    TxnCatalog.commitPartitions(spark, root, Seq(("t", "b0", df)),
      statsColumns = Seq("k"))
    TxnCatalog.deleteWhere(spark, root, "t", "k", 1L, 2L)
    val names = TxnCatalog.read(spark, root, "t").get
      .select("name").as[String].collect().sorted
    assert(names === Array("c", "n1", "n2"))
  }

  test("deleteWhere touching nothing commits nothing") {
    val root = tmp("delnoop"); rangeLake(root)
    val before = TxnCatalog.currentTxn(spark, root)
    val ret = TxnCatalog.deleteWhere(spark, root, "t", "k", 5000L, 6000L)
    assert(TxnCatalog.currentTxn(spark, root) === before)
    assert(ret === before.get)
    assert(TxnCatalog.read(spark, root, "t").get.count() === 400L)
  }

  test("deleteWhere is conditional: rival commit fails it cleanly") {
    val root = tmp("delrace"); rangeLake(root)
    intercept[java.io.IOException] {
      TxnCatalog.deleteWhereHooked(spark, root, "t", "k", 0L, 50L) { () =>
        TxnCatalog.commitPartitions(spark, root,
          Seq(("t", "batch=9",
            Seq((900L, "x")).toDF("k", "name"))),
          statsColumns = Seq("k"))
      }
    }
    // the rival's commit stands; no rows were deleted
    assert(TxnCatalog.read(spark, root, "t").get.count() === 401L)
  }

  test("deleteWhere on a whole-table entry rewrites through commit") {
    val root = tmp("delwhole")
    TxnCatalog.commit(spark, root, Seq("t" ->
      (0 until 100).map(i => (i.toLong, s"r$i")).toDF("k", "name")))
    TxnCatalog.deleteWhere(spark, root, "t", "k", 10L, 19L)
    assert(TxnCatalog.read(spark, root, "t").get.count() === 90L)
  }
}
