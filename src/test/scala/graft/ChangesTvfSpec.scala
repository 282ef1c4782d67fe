package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.storage.{ChangesTvf, TxnCatalog}

/** [[ChangesTvf]]: the change feed as a SQL table-valued function —
  * session install, extensions injection, literal-argument contract. */
class ChangesTvfSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def lake(): (String, String) = {
    val root = tmp("tvf")
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b0", (0 until 10).map(i => (i.toLong, s"e$i"))
        .toDF("id", "name"))))
    TxnCatalog.deleteKeys(spark, root, "ev", "id", Seq(3L, 5L).toDF("id"))
    val cat = s"tvf${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (root, cat)
  }

  test("install: SQL reads the feed; window and filters behave") {
    val (_, cat) = lake()
    ChangesTvf.install(spark)
    val rows = spark.sql(
      s"SELECT id, _change_type, _txn FROM " +
        s"graft_table_changes('$cat.ev', 0, 2) ORDER BY _txn, id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length === 12, "10 inserts + 2 deletes")
    assert(rows.count(_._2 == "delete") === 2)
    assert(rows.filter(_._2 == "delete").map(_._1).toSet === Set(3L, 5L))
    // window excludes txn 1: only the delete events remain
    val tail = spark.sql(
      s"SELECT id FROM graft_table_changes('$cat.ev', 1, 2)")
      .collect().map(_.getLong(0)).sorted
    assert(tail.toSeq === Seq(3L, 5L))
    // WHERE over the feed composes (plans as ordinary scans)
    assert(spark.sql(
      s"SELECT count(*) FROM graft_table_changes('$cat.ev', 0, 2) " +
        "WHERE _change_type = 'insert' AND id >= 8")
      .collect().head.getLong(0) === 2L)
  }

  test("extensions injection registers the TVF on a fresh session") {
    val (root, cat) = lake()
    // getOrCreate would hand back the shared session (extensions are
    // build-time); detach, build with extensions, restore after — the
    // SkewAndExtensionsSpec pattern (same SparkContext, never stopped)
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val fresh = SparkSession.builder()
      .master("local[2]")
      .appName("graft-tvf-test")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      fresh.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
      fresh.conf.set(s"spark.sql.catalog.$cat.root", root)
      assert(fresh.sql(
        s"SELECT count(*) FROM graft_table_changes('$cat.ev', 0, 2)")
        .collect().head.getLong(0) === 12L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("contract errors: non-literal args, unknown catalog/table") {
    val (_, cat) = lake()
    ChangesTvf.install(spark)
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table_changes('$cat.ev', 0, 1 + 1)")
        .collect()
    }
    assert(e1.getMessage.contains("integer literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_table_changes('nope.ev', 0, 2)")
        .collect()
    }
    assert(e2.getMessage.contains("not a registered graft catalog"))
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table_changes('$cat.ghost', 0, 2)")
        .collect()
    }
    assert(e3.getMessage.contains("unknown table"))
  }
}
