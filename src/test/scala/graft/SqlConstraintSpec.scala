package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** ANSI constraint DDL over the lake catalog: CHECK constraints in
  * CREATE TABLE and ALTER TABLE ADD/DROP CONSTRAINT ride the same
  * `constraint.*` enforcement funnel raw TBLPROPERTIES use — validated
  * against existing rows on ADD, enforced on every write path, and
  * reported back through `Table.constraints()`. */
class SqlConstraintSpec extends GraftSuite {

  private def withCatalog[A](f: (SparkSession, String) => A): A = {
    val root = Files.createTempDirectory("cons").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-constraint-test")
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

  test("CREATE TABLE with CHECK enforces from birth") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.c (k BIGINT, v DOUBLE, " +
        "CONSTRAINT v_pos CHECK (v >= 0)) USING graft")
      s2.sql("INSERT INTO lake.default.c VALUES (1, 2.5)")
      val e = intercept[Exception] {
        s2.sql("INSERT INTO lake.default.c VALUES (2, -1.0)")
      }
      assert(e.getMessage.toLowerCase.contains("v_pos") ||
        e.getMessage.contains("CHECK"))
      assert(s2.sql("SELECT count(*) FROM lake.default.c")
        .collect().head.getLong(0) === 1L)
    }
  }

  test("ADD CONSTRAINT validates existing rows; DROP releases it") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.d (k BIGINT, v DOUBLE) " +
        "USING graft")
      s2.sql("INSERT INTO lake.default.d VALUES (1, 5.0), (2, -3.0)")
      // existing rows violate: the ADD must refuse, nothing published
      val e = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.d ADD CONSTRAINT v_pos " +
          "CHECK (v >= 0)")
      }
      assert(e.getMessage.contains("violate"))
      // after cleaning the data the ADD goes through and enforces
      s2.sql("DELETE FROM lake.default.d WHERE k = 2")
      s2.sql("ALTER TABLE lake.default.d ADD CONSTRAINT v_pos " +
        "CHECK (v >= 0)")
      intercept[Exception] {
        s2.sql("INSERT INTO lake.default.d VALUES (3, -1.0)")
      }
      s2.sql("ALTER TABLE lake.default.d DROP CONSTRAINT v_pos")
      s2.sql("INSERT INTO lake.default.d VALUES (3, -1.0)")
      assert(s2.sql("SELECT count(*) FROM lake.default.d")
        .collect().head.getLong(0) === 2L)
    }
  }

  test("the generated-column invariant cannot be dropped; " +
    "PRIMARY KEY refuses") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.g (k BIGINT, " +
        "k2 BIGINT GENERATED ALWAYS AS (k + 1)) USING graft")
      val e1 = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.g DROP CONSTRAINT gen_k2")
      }
      assert(e1.getMessage.contains("GENERATED"))
      val e2 = intercept[Exception] {
        s2.sql("CREATE TABLE lake.default.p (k BIGINT, " +
          "CONSTRAINT pk PRIMARY KEY (k)) USING graft")
      }
      assert(e2.getMessage.contains("CHECK"))
    }
  }
}
