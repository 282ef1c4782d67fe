package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.storage.{Branch, TxnCatalog}

/** RENAME TABLE: one zero-copy conditional manifest commit — the new
  * name serves the same bytes by reference, the old name is gone in
  * the same txn, history still time-travels to the old name, and
  * vacuum keeps the physically-src-named dirs alive because liveness
  * is path-based. */
class RenameTableSpec extends GraftSuite {

  private def withCatalog[A](f: (SparkSession, String) => A): A = {
    val root = Files.createTempDirectory("ren").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rename-test")
      .config("spark.sql.catalog.lake", "graft.storage.GraftCatalog")
      .config("spark.sql.catalog.lake.root", root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s2, root)
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("rename serves identical rows under the new name only; " +
    "old txns still read the old name") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        (0 until 3).map(b => ("ev", s"b=$b",
          (b * 10 until (b + 1) * 10).map(i => (i.toLong, s"n$i"))
            .toDF("k", "nm"))),
        statsColumns = Seq("k"))
      val preTxn = TxnCatalog.snapshot(s2, root).get.txn
      s2.sql("ALTER TABLE lake.default.ev RENAME TO events2")
      assert(s2.sql("SHOW TABLES IN lake.default").collect()
        .map(_.getString(1)).toSet === Set("events2"))
      assert(s2.sql("SELECT count(*) FROM lake.default.events2")
        .collect().head.getLong(0) === 30L)
      // the rename copied no data: every entry references src dirs
      val parts = s2.sql(
        "SELECT bloom_columns FROM lake.default.events2.partitions")
      assert(parts.count() === 3L)
      // pre-rename history still reads under the OLD name
      val old = TxnCatalog.snapshotAt(s2, root, preTxn)
      assert(old.tables.contains("ev") && !old.tables.contains("events2"))
      // writes to the new name land normally; stats config carried
      s2.sql("INSERT INTO lake.default.events2 VALUES (100, 'x')")
      assert(s2.sql("SELECT count(*) FROM lake.default.events2")
        .collect().head.getLong(0) === 31L)
    }
  }

  test("renamed table survives a hard vacuum (path-based liveness)") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0", (0 until 20).map(i => (i.toLong, s"v$i"))
          .toDF("k", "v"))),
        statsColumns = Seq("k"))
      Branch.renameTable(s2, root, "t", "u")
      TxnCatalog.vacuum(s2, root, keep = 1)
      val got = TxnCatalog.read(s2, root, "u").get.orderBy("k")
        .as[(Long, String)].collect()
      assert(got === (0 until 20).map(i => (i.toLong, s"v$i")).toArray)
    }
  }

  test("rename refuses live branches, dangling MVs, and collisions") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("a", "b=0", Seq((1L, 2.0)).toDF("k", "x")),
          ("b", "b=0", Seq((9L, 9.0)).toDF("k", "x"))))
      val e0 = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.a RENAME TO b")
      }
      assert(e0.getMessage.toLowerCase.contains("exists"))
      Branch.create(s2, root, "a", "wip")
      val e1 = intercept[Exception] {
        Branch.renameTable(s2, root, "a", "c")
      }
      assert(e1.getMessage.contains("branch"))
      Branch.drop(s2, root, "a", "wip")
      graft.storage.MaterializedAgg.create(s2, root, "mv_a", "a",
        Seq("k"),
        Seq(graft.storage.MaterializedAgg.AggSpec("sum", "x")))
      val e2 = intercept[Exception] {
        Branch.renameTable(s2, root, "a", "c")
      }
      assert(e2.getMessage.contains("materialized view"))
    }
  }
}
