package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** COLUMN DEFAULT VALUES through the SQL catalog: `DEFAULT <expr>`
  * declared at CREATE fills omitted INSERT columns at write time (the
  * analyzer resolves the persisted SQL), `ALTER COLUMN SET/DROP
  * DEFAULT` flips future inserts without touching committed files,
  * ADD COLUMN ... DEFAULT follows the TWO-DEFAULT model (pre-alter
  * rows read the frozen exists-default, never NULL — through deletes,
  * compaction, and the streaming source), and dropping a
  * still-defaulted column refuses with an actionable message. */
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

  test("dropping a defaulted column refuses until the default is detached") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.f (k BIGINT, " +
        "v STRING DEFAULT 'x') USING graft")
      s2.sql("INSERT INTO lake.default.f (k) VALUES (1)")
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

  test("ADD COLUMN DEFAULT: pre-alter rows read the default, not NULL " +
    "(two-default model)") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.h (k BIGINT) USING graft")
      s2.sql("INSERT INTO lake.default.h VALUES (1), (2)")
      s2.sql("ALTER TABLE lake.default.h ADD COLUMN w INT DEFAULT 7")
      // pre-alter rows fill the EXISTS_DEFAULT at read; an omitted
      // INSERT column fills CURRENT_DEFAULT at write; an explicit
      // post-alter NULL stays NULL (absence vs. declared null)
      s2.sql("INSERT INTO lake.default.h (k) VALUES (3)")
      s2.sql("INSERT INTO lake.default.h VALUES (4, 9)")
      s2.sql("INSERT INTO lake.default.h VALUES (5, NULL)")
      val got = s2.sql("SELECT k, w FROM lake.default.h ORDER BY k")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getInt(1))))
      assert(got === Array((1L, Some(7)), (2L, Some(7)), (3L, Some(7)),
        (4L, Some(9)), (5L, None)))
    }
  }

  test("exists-default is frozen at ADD COLUMN: SET DEFAULT flips " +
    "future inserts but never rewrites history") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.i (k BIGINT) USING graft")
      s2.sql("INSERT INTO lake.default.i VALUES (1)")
      s2.sql("ALTER TABLE lake.default.i ADD COLUMN w STRING DEFAULT 'old'")
      s2.sql("ALTER TABLE lake.default.i ALTER COLUMN w SET DEFAULT 'new'")
      s2.sql("INSERT INTO lake.default.i (k) VALUES (2)")
      val got = s2.sql("SELECT k, w FROM lake.default.i ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // row 1 predates the column -> the ADD-time default, not 'new'
      assert(got === Array((1L, "old"), (2L, "new")))
    }
  }

  test("exists-default survives compaction (materialized) and filtering " +
    "works on the filled column") {
    withCatalog { (s2, root) =>
      s2.sql("CREATE TABLE lake.default.j (k BIGINT) USING graft")
      s2.sql("INSERT INTO lake.default.j VALUES (1), (2)")
      s2.sql("ALTER TABLE lake.default.j ADD COLUMN w INT DEFAULT 7")
      s2.sql("INSERT INTO lake.default.j VALUES (3, 9)")
      // filter ON the filled column must see pre-alter rows
      assert(s2.sql("SELECT count(*) FROM lake.default.j WHERE w = 7")
        .collect().head.getLong(0) === 2L)
      // OPTIMIZE folds everything; the fold reads THROUGH the fill, so
      // the values materialize physically and survive a hard vacuum
      s2.sql("CALL lake.system.optimize(table => 'j')")
      graft.storage.TxnCatalog.vacuum(s2, root, keep = 1)
      val got = s2.sql("SELECT k, w FROM lake.default.j ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(got === Array((1L, 7), (2L, 7), (3L, 9)))
      // dropping the column still refuses while the exists-default
      // property is attached (stale re-attachment hazard), with the
      // detach path named
      s2.sql("ALTER TABLE lake.default.j ALTER COLUMN w DROP DEFAULT")
      val e = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.j DROP COLUMN w")
      }
      assert(e.getMessage.contains("UNSET TBLPROPERTIES"))
      s2.sql("ALTER TABLE lake.default.j UNSET TBLPROPERTIES " +
        "('graft.existsdefault.w')")
      s2.sql("ALTER TABLE lake.default.j DROP COLUMN w")
      assert(s2.sql("SELECT * FROM lake.default.j").columns === Array("k"))
    }
  }

  test("ADD COLUMN DEFAULT composes with merge-on-read deletes and " +
    "the streaming source") {
    withCatalog { (s2, root) =>
      import graft.storage.TxnCatalog
      s2.sql("CREATE TABLE lake.default.m (k BIGINT) USING graft")
      s2.sql("INSERT INTO lake.default.m VALUES (1), (2), (3)")
      s2.sql("ALTER TABLE lake.default.m ADD COLUMN w INT DEFAULT 7")
      s2.sql("DELETE FROM lake.default.m WHERE k = 2")
      val got = s2.sql("SELECT k, w FROM lake.default.m ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(got === Array((1L, 7), (3L, 7)))
      // the graft-lake streaming source reads the same filled view
      val name = "t_defaults_stream"
      s2.catalog.dropTempView(name)
      val tab = TxnCatalog.snapshot(s2, root).get.tables.head
      val q = s2.readStream.format("graft-lake")
        .option("root", root).option("table", tab).load()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val sgot = s2.table(name).orderBy("k")
          .collect().map(r => (r.getLong(0), r.getInt(1)))
        assert(sgot === Array((1L, 7), (3L, 7)))
      } finally q.stop()
    }
  }

  test("time travel respects the alter boundary: before it the column " +
    "is absent, after it pre-alter rows read the fill") {
    withCatalog { (s2, root) =>
      import graft.storage.{GraftLake, TxnCatalog}
      s2.sql("CREATE TABLE lake.default.n (k BIGINT) USING graft")
      s2.sql("INSERT INTO lake.default.n VALUES (1)")
      val beforeAlter = TxnCatalog.currentTxn(s2, root).get
      s2.sql("ALTER TABLE lake.default.n ADD COLUMN w INT DEFAULT 7")
      s2.sql("INSERT INTO lake.default.n VALUES (2, 9)")
      // at the pre-alter txn the table has no `w` at all — the
      // exists-default property did not exist in that snapshot
      val old = GraftLake.tableAsOf(s2, root, "n", beforeAlter).get
      assert(old.columns.toSeq === Seq("k"))
      // at the post-alter txn both rows surface, the old one filled
      val now = GraftLake.table(s2, root, "n").get
        .orderBy("k").collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(now === Array((1L, 7), (2L, 9)))
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
