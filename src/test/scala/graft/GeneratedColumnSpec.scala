package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.storage.TxnCatalog

/** GENERATED ALWAYS AS columns: the SQL INSERT path computes the
  * expression for NULL arrivals and refuses disagreeing values at
  * execution; the auto-created CHECK constraint makes every OTHER
  * write path (raw engine appends, rewrites) refuse a stale pair, so
  * the invariant holds no matter who writes. */
class GeneratedColumnSpec extends GraftSuite {

  private def withCatalog[A](f: (SparkSession, String) => A): A = {
    val root = Files.createTempDirectory("gen").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-generated-test")
      .config("spark.sql.catalog.lake", "graft.storage.GraftCatalog")
      .config("spark.sql.catalog.lake.root", root)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions())
      .getOrCreate()
    try f(s2, root)
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("INSERT computes omitted values, accepts matches, " +
    "raises on disagreement") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.g (k BIGINT, " +
        "k2 BIGINT GENERATED ALWAYS AS (k + 1)) USING graft")
      s2.sql("INSERT INTO lake.default.g (k) VALUES (1)")
      s2.sql("INSERT INTO lake.default.g VALUES (2, 3)")
      val e = intercept[Exception] {
        s2.sql("INSERT INTO lake.default.g VALUES (4, 99)")
      }
      assert(e.getMessage.contains("generated column k2"))
      val got = s2.sql("SELECT k, k2 FROM lake.default.g ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got === Array((1L, 2L), (2L, 3L)))
    }
  }

  test("raw appends refuse via the auto CHECK; SQL UPDATE recomputes") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      s2.sql("CREATE TABLE lake.default.g (k BIGINT, " +
        "k2 BIGINT GENERATED ALWAYS AS (k + 1)) USING graft")
      s2.sql("INSERT INTO lake.default.g (k) VALUES (1), (5)")
      val e1 = intercept[Exception] {
        TxnCatalog.appendBatch(s2, root, "g", "raw",
          Seq((10L, 99L)).toDF("k", "k2"))
      }
      assert(e1.getMessage.contains("gen_k2"))
      // an UPDATE rewriting k recomputes k2 over the POST-update row
      // (the generation SQL with the new-value expression substituted)
      s2.sql("UPDATE lake.default.g SET k = k + 10 WHERE k = 5")
      val got = s2.sql("SELECT k, k2 FROM lake.default.g ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got === Array((1L, 2L), (15L, 16L)))
      // a direct SET on the generated column refuses, like Delta
      val e2 = intercept[Exception] {
        s2.sql("UPDATE lake.default.g SET k2 = 42 WHERE k = 1")
      }
      assert(e2.getMessage.contains("generated column"))
    }
  }

  test("generated and defaulted columns coexist; NULL-input rows " +
    "compute NULL without tripping the constraint") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.h (k BIGINT, " +
        "tag STRING DEFAULT 'x', " +
        "ksq BIGINT GENERATED ALWAYS AS (k * k)) USING graft")
      s2.sql("INSERT INTO lake.default.h (k) VALUES (3)")
      s2.sql("INSERT INTO lake.default.h (k) VALUES (NULL)")
      val got = s2.sql("SELECT k, tag, ksq FROM lake.default.h " +
        "ORDER BY k NULLS FIRST").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      assert(got === Array((-1L, "x", -1L), (3L, "x", 9L)))
    }
  }
}
