package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.storage.TxnCatalog

/** [[graft.storage.GraftMerge]]'s POSITIONAL path: MERGE with arbitrary
  * ON conditions (multi-column keys, expressions) and the full clause
  * surface including NOT MATCHED BY SOURCE UPDATE — one deletion vector
  * + one batch per statement, never a partition rewrite. */
class PositionalMergeSpec extends GraftSuite {

  private def withCatalog[A](f: (SparkSession, String) => A): A = {
    val root = Files.createTempDirectory("posmerge").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-posmerge-test")
      .config("spark.sql.catalog.lake", "graft.storage.GraftCatalog")
      .config("spark.sql.catalog.lake.root", root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.storage.GraftMerge.install(s2)
    try f(s2, root)
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  /** (a, b, v): composite key (a, b). */
  private def lake(s2: SparkSession, root: String): Unit = {
    import s2.implicits._
    TxnCatalog.commitPartitions(s2, root,
      (0 until 2).map(p => ("t", s"batch=$p",
        (0 until 6).filter(_ % 2 == p)
          .map(i => (i.toLong, s"b${i % 3}", s"v$i")).toDF("a", "b", "v"))))
  }

  private def dirOf(root: String, part: String): String =
    new java.io.File(s"$root/t/$part").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.mkString(",")

  private def rows(s2: SparkSession) =
    s2.sql("SELECT a, b, v FROM lake.default.t ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("composite-key ON merges as DV + batch, no partition rewrite") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      val before = (0 until 2).map(p => dirOf(root, s"batch=$p"))
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(2 AS BIGINT), 'b2', 'UP'),
               |(CAST(9 AS BIGINT), 'b9', 'NEW') AS s(a, b, v)""".stripMargin)
      s2.sql("""MERGE INTO lake.default.t USING src
               |ON t.a = src.a AND t.b = src.b
               |WHEN MATCHED THEN UPDATE SET v = src.v
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(rows(s2) === Seq((0L, "b0", "v0"), (1L, "b1", "v1"),
        (2L, "b2", "UP"), (3L, "b0", "v3"), (4L, "b1", "v4"),
        (5L, "b2", "v5"), (9L, "b9", "NEW")))
      assert((0 until 2).map(p => dirOf(root, s"batch=$p")) === before,
        "composite-key MERGE must land as a deletion vector, not a rewrite")
      assert(TxnCatalog.snapshot(s2, root).get.deleteEntries("t")
        .map(_._3) === Seq(TxnCatalog.DeletePosMarker))
    }
  }

  test("expression ON plus conditional clauses and NBS DELETE") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      val t0 = TxnCatalog.currentTxn(s2, root).get
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(102 AS BIGINT), 'z', 'two'),
               |(CAST(104 AS BIGINT), 'z', 'four'),
               |(CAST(108 AS BIGINT), 'z', 'eight') AS s(a, b, v)""".stripMargin)
      // ON is an EXPRESSION over the target column — no keyed rendering
      s2.sql("""MERGE INTO lake.default.t USING src ON t.a + 100 = src.a
               |WHEN MATCHED AND t.b <> 'b1' THEN UPDATE SET v = src.v
               |WHEN NOT MATCHED AND src.v = 'eight' THEN INSERT (a, b, v)
               |  VALUES (src.a, src.b, src.v)
               |WHEN NOT MATCHED BY SOURCE AND t.a = 5 THEN DELETE
               |""".stripMargin)
      // a=2 matched + b!='b1' → updated; a=4 matched but b='b1' → kept;
      // 108 inserted (its condition holds), 5 NBS-deleted, others kept
      assert(rows(s2) === Seq((0L, "b0", "v0"), (1L, "b1", "v1"),
        (2L, "b2", "two"), (3L, "b0", "v3"), (4L, "b1", "v4"),
        (108L, "z", "eight")))
      assert(TxnCatalog.currentTxn(s2, root).get === t0 + 1,
        "the whole clause surface lands in ONE txn")
    }
  }

  test("NOT MATCHED BY SOURCE UPDATE routes positionally even for keyed ON") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(0 AS BIGINT)) AS s(a)""".stripMargin)
      s2.sql("""MERGE INTO lake.default.t USING src ON t.a = src.a
               |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'
               |""".stripMargin)
      assert(rows(s2).map(_._3) ===
        Seq("v0", "stale", "stale", "stale", "stale", "stale"))
      assert(TxnCatalog.snapshot(s2, root).get.deleteEntries("t")
        .map(_._3) === Seq(TxnCatalog.DeletePosMarker))
    }
  }

  test("cardinality violation detected by physical coordinate") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW dup AS SELECT * FROM VALUES
               |(CAST(2 AS BIGINT), 'x'), (CAST(2 AS BIGINT), 'y')
               |AS s(a, v)""".stripMargin)
      val err = intercept[Exception] {
        s2.sql("""MERGE INTO lake.default.t USING dup
                 |ON t.a = dup.a AND t.b = 'b2'
                 |WHEN MATCHED THEN UPDATE SET v = dup.v""".stripMargin)
      }
      assert(err.getMessage.contains("MERGE_CARDINALITY_VIOLATION"))
      assert(rows(s2).map(_._3) === (0 until 6).map(i => s"v$i"),
        "a violating MERGE publishes nothing")
    }
  }

  test("CDC sees a positional merge as precise delete+insert events") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(3 AS BIGINT), 'b0', 'three') AS s(a, b, v)""".stripMargin)
      s2.sql("""MERGE INTO lake.default.t USING src
               |ON t.a = src.a AND t.b = src.b
               |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
      val feed = TxnCatalog.changeFeed(s2, root, "t", 1, 2).get
      val events = feed.select("a", "v", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(events === Set((3L, "v3", "delete"), (3L, "three", "insert")))
    }
  }

  // --- ordered multi-clause families (first-match-wins, VERDICT r8 #2)

  test("ordered MATCHED clauses: the FIRST qualifying clause wins") {
    withCatalog { (s2, root) =>
      lake(s2, root) // rows (i, b{i%3}, v{i}) for i in 0..5
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(0 AS BIGINT), 'b0', 'DEL'),
               |(CAST(2 AS BIGINT), 'b2', 'UP'),
               |(CAST(4 AS BIGINT), 'b1', 'other') AS s(a, b, v)""".stripMargin)
      // row 0 satisfies BOTH the delete and the fallback update — the
      // DELETE is first, so it must win; row 2 satisfies only the
      // second clause; row 4 matches no condition except the fallback
      s2.sql("""MERGE INTO lake.default.t USING src
               |ON t.a = src.a AND t.b = src.b
               |WHEN MATCHED AND src.v = 'DEL' THEN DELETE
               |WHEN MATCHED AND src.v = 'UP' THEN UPDATE SET v = src.v
               |WHEN MATCHED THEN UPDATE SET v = 'FALLBACK'""".stripMargin)
      assert(rows(s2) === Seq((1L, "b1", "v1"), (2L, "b2", "UP"),
        (3L, "b0", "v3"), (4L, "b1", "FALLBACK"), (5L, "b2", "v5")))
    }
  }

  test("ordered MATCHED clauses: all-conditional, no-winner rows stay") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(1 AS BIGINT), 'b1', 'skip'),
               |(CAST(3 AS BIGINT), 'b0', 'DEL') AS s(a, b, v)""".stripMargin)
      // row 1 is MATCHED but satisfies neither condition: untouched —
      // its coordinates must not be masked
      s2.sql("""MERGE INTO lake.default.t USING src
               |ON t.a = src.a AND t.b = src.b
               |WHEN MATCHED AND src.v = 'DEL' THEN DELETE
               |WHEN MATCHED AND src.v = 'UP' THEN UPDATE SET v = src.v
               |""".stripMargin)
      assert(rows(s2) === Seq((0L, "b0", "v0"), (1L, "b1", "v1"),
        (2L, "b2", "v2"), (4L, "b1", "v4"), (5L, "b2", "v5")))
    }
  }

  test("ordered NOT MATCHED inserts: first qualifying clause supplies the row") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(100 AS BIGINT), 'hi', 'big'),
               |(CAST(101 AS BIGINT), 'lo', 'small') AS s(a, b, v)""".stripMargin)
      s2.sql("""MERGE INTO lake.default.t USING src
               |ON t.a = src.a AND t.b = src.b
               |WHEN NOT MATCHED AND src.b = 'hi' THEN INSERT
               |  (a, b, v) VALUES (src.a, src.b, 'PRIORITY')
               |WHEN NOT MATCHED THEN INSERT (a, b, v)
               |  VALUES (src.a, src.b, 'DEFAULT')""".stripMargin)
      assert(rows(s2).filter(_._1 >= 100) ===
        Seq((100L, "hi", "PRIORITY"), (101L, "lo", "DEFAULT")))
    }
  }

  test("single-equality ON with multiple MATCHED clauses routes positionally") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      val before = (0 until 2).map(p => dirOf(root, s"batch=$p"))
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(0 AS BIGINT), 'x'), (CAST(1 AS BIGINT), 'y')
               |AS s(a, v)""".stripMargin)
      // the keyed fast path handles ONE clause per family; the ordered
      // list must fall through to the positional engine and still
      // apply first-match-wins under a plain key equality
      s2.sql("""MERGE INTO lake.default.t USING src
               |ON t.a = src.a
               |WHEN MATCHED AND src.v = 'x' THEN DELETE
               |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
      assert(rows(s2) === Seq((1L, "b1", "y"), (2L, "b2", "v2"),
        (3L, "b0", "v3"), (4L, "b1", "v4"), (5L, "b2", "v5")))
      assert((0 until 2).map(p => dirOf(root, s"batch=$p")) === before,
        "multi-clause MERGE must land as a deletion vector, not a rewrite")
    }
  }

  test("ordered NBS clauses: conditional UPDATE shadows the DELETE sweep") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(0 AS BIGINT), 'b0', 'keep') AS s(a, b, v)""".stripMargin)
      // target rows with no source match: b1 rows get tombstoned by
      // the first clause, everything else unmatched-by-source deletes
      s2.sql("""MERGE INTO lake.default.t USING src
               |ON t.a = src.a AND t.b = src.b
               |WHEN NOT MATCHED BY SOURCE AND t.b = 'b1' THEN UPDATE
               |  SET v = 'TOMBSTONE'
               |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(rows(s2) === Seq((0L, "b0", "v0"), (1L, "b1", "TOMBSTONE"),
        (4L, "b1", "TOMBSTONE")))
    }
  }

  // --- MERGE schema evolution (VERDICT r8 task #3)

  test("WITH SCHEMA EVOLUTION: new source column lands, old rows null") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(2 AS BIGINT), 'b2', 'UP', CAST(7.5 AS DOUBLE)),
               |(CAST(9 AS BIGINT), 'b9', 'NEW', CAST(1.25 AS DOUBLE))
               |AS s(a, b, v, score)""".stripMargin)
      s2.sql("""MERGE WITH SCHEMA EVOLUTION INTO lake.default.t
               |USING src ON t.a = src.a AND t.b = src.b
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val out = s2.sql(
        "SELECT a, b, v, score FROM lake.default.t ORDER BY a, b")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          Option(r.get(3)).map(_.asInstanceOf[Double])))
      assert(out.toSeq === Seq(
        (0L, "b0", "v0", None), (1L, "b1", "v1", None),
        (2L, "b2", "UP", Some(7.5)), (3L, "b0", "v3", None),
        (4L, "b1", "v4", None), (5L, "b2", "v5", None),
        (9L, "b9", "NEW", Some(1.25))))
    }
  }

  test("WITH SCHEMA EVOLUTION: explicit INSERT naming the new column") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(9 AS BIGINT), 'b9', 'NEW', CAST(42.0 AS DOUBLE))
               |AS s(a, b, v, score)""".stripMargin)
      s2.sql("""MERGE WITH SCHEMA EVOLUTION INTO lake.default.t
               |USING src ON t.a = src.a AND t.b = src.b
               |WHEN NOT MATCHED THEN INSERT (a, b, v, score)
               |  VALUES (src.a, src.b, src.v, src.score)""".stripMargin)
      val added = s2.sql(
        "SELECT a, score FROM lake.default.t WHERE a = 9").collect()
      assert(added.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
        Seq((9L, 42.0)))
      assert(s2.sql("SELECT count(*) FROM lake.default.t " +
        "WHERE score IS NULL").collect().head.getLong(0) === 6L)
    }
  }

  test("without SCHEMA EVOLUTION, an unknown insert column is refused") {
    withCatalog { (s2, root) =>
      lake(s2, root)
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(9 AS BIGINT), 'b9', 'NEW', CAST(42.0 AS DOUBLE))
               |AS s(a, b, v, score)""".stripMargin)
      intercept[Exception] {
        s2.sql("""MERGE INTO lake.default.t USING src
                 |ON t.a = src.a AND t.b = src.b
                 |WHEN NOT MATCHED THEN INSERT (a, b, v, score)
                 |  VALUES (src.a, src.b, src.v, src.score)""".stripMargin)
      }
      assert(rows(s2).size === 6, "refused MERGE publishes nothing")
    }
  }
}
