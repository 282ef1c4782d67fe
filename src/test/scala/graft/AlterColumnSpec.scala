package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.{MaterializedAgg, TxnCatalog}

/** [[TxnCatalog.renameColumn]] / [[TxnCatalog.dropColumn]] and their
  * SQL surface (`ALTER TABLE ... RENAME/DROP COLUMN`): a full-rewrite
  * txn that preserves partition layout, follows the skipping config,
  * and refuses every change that would silently break a dependent
  * constraint or view. */
class AlterColumnSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def build(root: String): Unit =
    (0 until 3).foreach { b =>
      TxnCatalog.commitPartitions(spark, root,
        Seq(("ev", s"b=$b",
          (b * 50 until (b + 1) * 50).map(i => (i.toLong, s"n$i", i * 2L))
            .toDF("k", "nm", "v"))),
        statsColumns = Seq("k"))
    }

  test("renameColumn rewrites every partition; layout and values survive") {
    val root = tmp("ren")
    build(root)
    val t1 = TxnCatalog.currentTxn(spark, root).get
    TxnCatalog.renameColumn(spark, root, "ev", "v", "value")
    val df = TxnCatalog.read(spark, root, "ev").get
    assert(df.columns.toSeq === Seq("k", "nm", "value"))
    assert(df.select(sum("value")).collect().head.getLong(0) ===
      (0 until 150).map(_ * 2L).sum)
    assert(TxnCatalog.partitions(spark, root, "ev").toSet ===
      Set("b=0", "b=1", "b=2"), "partition grain preserved")
    // time travel still reads the old schema
    assert(TxnCatalog.snapshotAt(spark, root, t1).read("ev").get
      .columns.contains("v"))
  }

  test("dropColumn removes the column everywhere; the rest is intact") {
    val root = tmp("drp")
    build(root)
    TxnCatalog.dropColumn(spark, root, "ev", "nm")
    val df = TxnCatalog.read(spark, root, "ev").get
    assert(df.columns.toSeq === Seq("k", "v"))
    assert(df.count() === 150L)
  }

  test("rename follows the skipping config and re-measures stats") {
    val root = tmp("renstats")
    build(root)
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.StatsColumnsProp -> "k,v"))
    TxnCatalog.renameColumn(spark, root, "ev", "v", "value")
    val props = TxnCatalog.tableProperties(spark, root, "ev")
    assert(props(TxnCatalog.StatsColumnsProp) === "k,value")
    // the rewritten entries carry stats under the NEW name
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.stats("ev", "b=0").contains("value"),
      s"got ${snap.stats("ev", "b=0").keys}")
  }

  test("refusals: missing/existing names, constraints, views, pending deletes") {
    val root = tmp("refuse")
    build(root)
    intercept[IllegalArgumentException] {
      TxnCatalog.renameColumn(spark, root, "ev", "zzz", "a")
    }
    intercept[IllegalArgumentException] {
      TxnCatalog.renameColumn(spark, root, "ev", "v", "nm") // exists
    }
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.ConstraintPrefix + "pos" -> "v >= 0"))
    intercept[IllegalArgumentException] {
      TxnCatalog.renameColumn(spark, root, "ev", "v", "value")
    }
    intercept[IllegalArgumentException] {
      TxnCatalog.dropColumn(spark, root, "ev", "v")
    }
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.ConstraintPrefix + "pos" -> ""))
    MaterializedAgg.create(spark, root, "ev_agg", "ev", Seq("nm"),
      Seq(MaterializedAgg.AggSpec("sum", "v")))
    intercept[IllegalArgumentException] {
      TxnCatalog.renameColumn(spark, root, "ev", "v", "value")
    }
    TxnCatalog.dropTable(spark, root, "ev_agg")
    TxnCatalog.deleteKeys(spark, root, "ev", "k", Seq(1L).toDF("k"))
    intercept[IllegalArgumentException] {
      TxnCatalog.renameColumn(spark, root, "ev", "v", "value")
    }
    TxnCatalog.applyDeletes(spark, root, "ev")
    // all blockers cleared: the rename goes through
    TxnCatalog.renameColumn(spark, root, "ev", "v", "value")
    assert(TxnCatalog.read(spark, root, "ev").get
      .columns.contains("value"))
  }

  test("SQL ALTER TABLE RENAME and DROP COLUMN work by identifier") {
    val root = tmp("sqlalter")
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-alter-test")
      .config("spark.sql.catalog.lake", "graft.storage.GraftCatalog")
      .config("spark.sql.catalog.lake.root", root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=0",
          (0 until 50).map(i => (i.toLong, s"n$i", i * 2L))
            .toDF("k", "nm", "v"))),
        statsColumns = Seq("k"))
      s2.sql("ALTER TABLE lake.default.ev RENAME COLUMN v TO value")
      assert(s2.sql("SELECT sum(value) FROM lake.default.ev")
        .collect().head.getLong(0) === (0 until 50).map(_ * 2L).sum)
      s2.sql("ALTER TABLE lake.default.ev DROP COLUMN nm")
      assert(s2.table("lake.default.ev").columns.toSeq ===
        Seq("k", "value"))
      val e = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.ev DROP COLUMN nope")
      }
      assert(e.getMessage.toLowerCase.contains("nope") ||
        e.getMessage.contains("no column"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
