package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** COLUMN DEFAULT VALUES through the SQL catalog: `DEFAULT <expr>`
  * declared at CREATE fills omitted INSERT columns at write time (the
  * analyzer resolves the persisted SQL), `ALTER COLUMN SET/DROP
  * DEFAULT` flips future inserts without touching committed files, and
  * the half-supported shapes (ADD COLUMN WITH DEFAULT, dropping a
  * still-defaulted column) refuse with an actionable message. */
class DefaultValueSpec extends GraftSuite {

  private def withCatalog[A](f: (SparkSession, String) => A): A = {
    val root = Files.createTempDirectory("dflt").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-default-test")
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

  test("CREATE ... DEFAULT fills omitted INSERT columns and persists") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.d (k BIGINT, " +
        "status STRING DEFAULT 'new', score DOUBLE DEFAULT 1.5) " +
        "USING graft")
      s2.sql("INSERT INTO lake.default.d (k) VALUES (1)")
      s2.sql("INSERT INTO lake.default.d VALUES (2, DEFAULT, DEFAULT)")
      s2.sql("INSERT INTO lake.default.d VALUES (3, 'done', 9.0)")
      val got = s2.sql(
        "SELECT k, status, score FROM lake.default.d ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(got === Array((1L, "new", 1.5), (2L, "new", 1.5),
        (3L, "done", 9.0)))
    }
  }

  test("ALTER COLUMN SET/DROP DEFAULT flips future inserts only") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.e (k BIGINT, " +
        "v STRING DEFAULT 'a') USING graft")
      s2.sql("INSERT INTO lake.default.e (k) VALUES (1)")
      s2.sql("ALTER TABLE lake.default.e ALTER COLUMN v SET DEFAULT 'b'")
      s2.sql("INSERT INTO lake.default.e (k) VALUES (2)")
      s2.sql("ALTER TABLE lake.default.e ALTER COLUMN v DROP DEFAULT")
      s2.sql("INSERT INTO lake.default.e (k) VALUES (3)")
      val got = s2.sql("SELECT k, v FROM lake.default.e ORDER BY k")
        .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      assert(got === Array((1L, Some("a")), (2L, Some("b")), (3L, None)))
    }
  }

  test("ADD COLUMN WITH DEFAULT and dropping a defaulted column refuse") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.f (k BIGINT, " +
        "v STRING DEFAULT 'x') USING graft")
      s2.sql("INSERT INTO lake.default.f (k) VALUES (1)")
      val e1 = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.f ADD COLUMN w INT DEFAULT 7")
      }
      assert(e1.getMessage.contains("DEFAULT"))
      val e2 = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.f DROP COLUMN v")
      }
      assert(e2.getMessage.contains("DROP DEFAULT"))
      // detach, then the drop goes through
      s2.sql("ALTER TABLE lake.default.f ALTER COLUMN v DROP DEFAULT")
      s2.sql("ALTER TABLE lake.default.f DROP COLUMN v")
      assert(s2.sql("SELECT * FROM lake.default.f").columns === Array("k"))
    }
  }

  test("non-foldable DEFAULT is refused at CREATE by the analyzer") {
    withCatalog { (s2, _) =>
      intercept[Exception] {
        s2.sql("CREATE TABLE lake.default.g (k BIGINT, " +
          "v STRING DEFAULT upper(k)) USING graft")
      }
      // the refusal must not leave a half-created table behind
      assert(!s2.sql("SHOW TABLES IN lake.default").collect()
        .map(_.getString(1)).contains("g"))
    }
  }
}
