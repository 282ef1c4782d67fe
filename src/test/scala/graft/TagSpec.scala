package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.storage.TxnCatalog

/** [[TxnCatalog.createTag]] and friends: named, vacuum-exempt txn
  * references, readable as `VERSION AS OF 'name'` through the SQL
  * catalog. */
class TagSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def commitBatch(root: String, part: String, lo: Int,
      hi: Int): Long =
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", part,
        (lo until hi).map(i => (i.toLong, s"e$i")).toDF("k", "nm"))),
      statsColumns = Seq("k"))

  test("create / list / resolve / drop; duplicates and bad names refused") {
    val root = tmp("tag")
    val t1 = commitBatch(root, "b0", 0, 10)
    TxnCatalog.createTag(spark, root, "stable", t1)
    assert(TxnCatalog.tags(spark, root) === Map("stable" -> t1))
    assert(TxnCatalog.snapshotAtTag(spark, root, "stable").txn === t1)
    intercept[IllegalArgumentException] {
      TxnCatalog.createTag(spark, root, "stable", t1) // exists
    }
    intercept[IllegalArgumentException] {
      TxnCatalog.createTag(spark, root, "42", t1) // numeric shadows txns
    }
    intercept[IllegalArgumentException] {
      TxnCatalog.createTag(spark, root, "nope", 99L) // uncommitted txn
    }
    assert(TxnCatalog.dropTag(spark, root, "stable"))
    assert(!TxnCatalog.dropTag(spark, root, "stable"))
    assert(TxnCatalog.tags(spark, root).isEmpty)
  }

  test("a tag pins its txn and data through vacuum; drop releases them") {
    val root = tmp("tagvac")
    val t1 = commitBatch(root, "b0", 0, 10)
    TxnCatalog.createTag(spark, root, "keepme", t1)
    commitBatch(root, "b1", 10, 20)
    // destructive: replace the table entirely, then vacuum hard
    TxnCatalog.commit(spark, root,
      Seq(("ev", Seq((99L, "zz")).toDF("k", "nm"))))
    TxnCatalog.vacuum(spark, root, keep = 1)
    // untagged intermediate txns are gone, the tagged one survives
    val kept = TxnCatalog.txns(spark, root)
    assert(kept.contains(t1), s"tagged txn must survive vacuum, got $kept")
    assert(!kept.contains(t1 + 1), "untagged intermediate reclaimed")
    // and its DATA is still readable, byte-exact
    assert(TxnCatalog.snapshotAtTag(spark, root, "keepme")
      .read("ev").get.select("k").as[Long].collect().sorted ===
      (0L until 10L).toArray)
    // dropping the tag releases the pin: the next vacuum reclaims it
    TxnCatalog.dropTag(spark, root, "keepme")
    TxnCatalog.vacuum(spark, root, keep = 1)
    assert(!TxnCatalog.txns(spark, root).contains(t1))
  }

  test("SQL: VERSION AS OF a tag name; CALL tag/tags/drop_tag round trip") {
    val root = tmp("tagsql")
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-tag-test")
      .config("spark.sql.catalog.lake", "graft.storage.GraftCatalog")
      .config("spark.sql.catalog.lake.root", root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b0", (0 until 10).map(i => (i.toLong, s"e$i"))
          .toDF("k", "nm"))), statsColumns = Seq("k"))
      val r = s2.sql("CALL lake.system.tag(name => 'v1')").collect().head
      val t1 = r.getLong(1)
      assert(r.getString(0) === "v1" &&
        t1 === TxnCatalog.currentTxn(s2, root).get)
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b1", (10 until 30).map(i => (i.toLong, s"e$i"))
          .toDF("k", "nm"))), statsColumns = Seq("k"))
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .collect().head.getLong(0) === 30L)
      assert(s2.sql("SELECT count(*) FROM lake.default.ev VERSION AS OF 'v1'")
        .collect().head.getLong(0) === 10L,
        "the tag name resolves through time travel")
      assert(s2.sql("CALL lake.system.tags()").collect()
        .map(r2 => (r2.getString(0), r2.getLong(1))).toSeq ===
        Seq(("v1", t1)))
      // RESTORE by tag: revert the table to the tagged state by name
      val rr = s2.sql(
        "CALL lake.system.restore(table => 'ev', tag => 'v1')")
        .collect().head
      assert(rr.getBoolean(1))
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .collect().head.getLong(0) === 10L,
        "restore-by-tag reverts to the tagged state")
      assert(s2.sql("CALL lake.system.drop_tag(name => 'v1')")
        .collect().head.getBoolean(0))
      val e = intercept[Exception] {
        s2.sql("SELECT * FROM lake.default.ev VERSION AS OF 'v1'").collect()
      }
      assert(e.getMessage.contains("v1"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("concurrent creates of one tag name get exactly one winner") {
    val root = tmp("tagrace")
    val t1 = commitBatch(root, "b0", 0, 5)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val attempts = (0 until 4).map { _ =>
      scala.concurrent.Future {
        try { TxnCatalog.createTag(spark, root, "racing", t1); true }
        catch { case _: IllegalArgumentException => false }
      }
    }
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(attempts),
      scala.concurrent.duration.Duration(60, "s"))
    pool.shutdown()
    assert(results.count(identity) === 1,
      s"exactly one creator may win, got $results")
    assert(TxnCatalog.tags(spark, root) === Map("racing" -> t1))
  }
}
