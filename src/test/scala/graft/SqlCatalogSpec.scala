package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.storage.TxnCatalog

/** [[graft.storage.GraftCatalog]]: the lake as a Spark SQL catalog —
  * SELECT/INSERT/CREATE/DROP by identifier, filters pruning through the
  * manifest inside the V1 bridge. */
class SqlCatalogSpec extends GraftSuite {

  /** A fresh session (shared context) with the catalog mounted at a
    * fresh root. Restores the shared session afterwards. */
  private def withCatalog[A](f: (SparkSession, String) => A): A = {
    val root = Files.createTempDirectory("sqlcat").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-sqlcat-test")
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

  test("SELECT by identifier reads committed tables with filters applied") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        (0 until 4).map(b => ("ev", s"b=$b",
          (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"n$i"))
            .toDF("k", "nm"))),
        statsColumns = Seq("k"))
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .collect().head.getLong(0) === 400L)
      val got = s2.sql(
        "SELECT k FROM lake.default.ev WHERE k >= 150 AND k <= 155 ORDER BY k")
        .as[Long].collect()
      assert(got === (150L to 155L).toArray)
      assert(s2.sql("SHOW TABLES IN lake.default").collect()
        .map(_.getString(1)).toSet === Set("ev"))
    }
  }

  test("INSERT INTO appends atomically; INSERT OVERWRITE replaces") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0", Seq((1L, "a")).toDF("k", "v"))))
      s2.sql("INSERT INTO lake.default.t VALUES (2, 'b'), (3, 'c')")
      assert(s2.sql("SELECT k FROM lake.default.t ORDER BY k")
        .as[Long].collect() === Array(1L, 2L, 3L))
      // the append landed as one batch partition
      assert(TxnCatalog.partitions(s2, root, "t")
        .count(_.startsWith("batch=")) === 1)
      s2.sql("INSERT OVERWRITE lake.default.t VALUES (9, 'z')")
      assert(s2.sql("SELECT k, v FROM lake.default.t").collect()
        .map(r => (r.getLong(0), r.getString(1))) === Array((9L, "z")))
    }
  }

  test("CREATE TABLE then INSERT; DROP TABLE removes it, time travel keeps it") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      s2.sql("CREATE TABLE lake.default.fresh (k BIGINT, v STRING)")
      assert(s2.sql("SELECT count(*) FROM lake.default.fresh")
        .collect().head.getLong(0) === 0L)
      s2.sql("INSERT INTO lake.default.fresh VALUES (1, 'x')")
      assert(s2.sql("SELECT v FROM lake.default.fresh WHERE k = 1")
        .collect().head.getString(0) === "x")
      intercept[Exception] {
        s2.sql("CREATE TABLE lake.default.fresh (k BIGINT)")
      }
      val atDrop = TxnCatalog.currentTxn(s2, root).get
      s2.sql("DROP TABLE lake.default.fresh")
      assert(!TxnCatalog.tables(s2, root).contains("fresh"))
      intercept[Exception] {
        s2.sql("SELECT * FROM lake.default.fresh").collect()
      }
      // older snapshots still read the dropped table
      assert(TxnCatalog.snapshotAt(s2, root, atDrop)
        .read("fresh").get.count() === 1L)
    }
  }

  test("VERSION AS OF and TIMESTAMP AS OF time-travel through SQL") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0", Seq((1L, "a")).toDF("k", "v"))))
      val txn1 = TxnCatalog.currentTxn(s2, root).get
      Thread.sleep(1100L) // mtime clock granularity
      val betweenMs = System.currentTimeMillis()
      Thread.sleep(1100L)
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=1", Seq((2L, "b")).toDF("k", "v"))))
      assert(s2.sql("SELECT count(*) FROM lake.default.t")
        .collect().head.getLong(0) === 2L)
      assert(s2.sql(s"SELECT count(*) FROM lake.default.t VERSION AS OF $txn1")
        .collect().head.getLong(0) === 1L)
      val ts = new java.sql.Timestamp(betweenMs)
      assert(s2.sql(
        s"SELECT count(*) FROM lake.default.t TIMESTAMP AS OF '$ts'")
        .collect().head.getLong(0) === 1L,
        "a timestamp between the commits must resolve to txn 1")
    }
  }

  test("SHOW TBLPROPERTIES surfaces TxnCatalog properties and constraints") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0", Seq((1L, 5.0)).toDF("k", "v"))))
      TxnCatalog.setTableProperties(s2, root, "t",
        Map("team" -> "etl", "constraint.pos" -> "v > 0"))
      // note: RESERVED Spark property names (owner, comment, ...) are
      // filtered from SHOW TBLPROPERTIES by the engine
      val props = s2.sql("SHOW TBLPROPERTIES lake.default.t")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props === Map("team" -> "etl", "constraint.pos" -> "v > 0"))
    }
  }

  test("DELETE FROM supports equality, IN, closed ranges, and truncate") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        (0 until 2).map(b => ("t", s"b=$b",
          (b * 50 until (b + 1) * 50).map(i => (i.toLong, i * 1.0))
            .toDF("k", "v"))),
        statsColumns = Seq("k", "v"))
      s2.sql("DELETE FROM lake.default.t WHERE k = 7")
      s2.sql("DELETE FROM lake.default.t WHERE k IN (11, 13, 999)")
      s2.sql("DELETE FROM lake.default.t WHERE k >= 90 AND k <= 94")
      val got = s2.sql("SELECT k FROM lake.default.t ORDER BY k")
        .as[Long].collect()
      assert(got === (0L until 100L)
        .filterNot(Set(7L, 11L, 13L)).filterNot(k => k >= 90L && k <= 94L)
        .toArray)
      // an untranslatable shape is refused, not mis-deleted
      intercept[Exception] {
        s2.sql("DELETE FROM lake.default.t WHERE k % 2 = 0")
      }
      assert(s2.sql("SELECT count(*) FROM lake.default.t")
        .collect().head.getLong(0) === 92L)
      // truncate
      s2.sql("DELETE FROM lake.default.t")
      assert(s2.sql("SELECT count(*) FROM lake.default.t")
        .collect().head.getLong(0) === 0L)
    }
  }

  test("ALTER TABLE ADD COLUMN evolves the schema; old rows read null") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0", Seq((1L, "a")).toDF("k", "v"))))
      s2.sql("ALTER TABLE lake.default.t ADD COLUMN score DOUBLE")
      val rows = s2.sql("SELECT k, v, score FROM lake.default.t").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1))) === Array((1L, "a")))
      assert(rows.head.isNullAt(2), "pre-evolution rows read null")
      s2.sql("INSERT INTO lake.default.t VALUES (2, 'b', 4.5)")
      assert(s2.sql(
        "SELECT score FROM lake.default.t WHERE k = 2")
        .collect().head.getDouble(0) === 4.5)
      // properties through ALTER ... SET TBLPROPERTIES
      s2.sql("ALTER TABLE lake.default.t SET TBLPROPERTIES ('team' = 'ml')")
      assert(TxnCatalog.tableProperties(s2, root, "t")("team") === "ml")
      // unsupported change shapes are refused (DROP/RENAME COLUMN are
      // supported since the rewrite path — see AlterColumnSpec)
      intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.t ALTER COLUMN k TYPE STRING")
      }
      intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.t ADD COLUMN nn BIGINT NOT NULL")
      }
    }
  }

  test("CREATE TABLE keeps its TBLPROPERTIES; constraints enforce from birth") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.c (k BIGINT, v DOUBLE)
               |TBLPROPERTIES ('constraint.pos' = 'v > 0', 'team' = 'ml')
               |""".stripMargin)
      assert(TxnCatalog.tableProperties(s2, root, "c")
        === Map("constraint.pos" -> "v > 0", "team" -> "ml"))
      s2.sql("INSERT INTO lake.default.c VALUES (1, 2.5)")
      intercept[Exception] {
        s2.sql("INSERT INTO lake.default.c VALUES (2, -1.0)")
      }
      assert(s2.sql("SELECT count(*) FROM lake.default.c")
        .collect().head.getLong(0) === 1L)
    }
  }

  test("CTAS and RTAS are ATOMIC: one txn, no drop-then-create window") {
    withCatalog { (s2, root) =>
      val before = TxnCatalog.currentTxn(s2, root).getOrElse(0L)
      s2.sql("""CREATE TABLE lake.default.c TBLPROPERTIES('team'='ml')
               |AS SELECT id AS k, id * 2 AS v FROM range(5)""".stripMargin)
      val afterCreate = TxnCatalog.currentTxn(s2, root).get
      assert(afterCreate === before + 1,
        "CTAS = exactly ONE txn (schema + rows + properties together)")
      assert(s2.sql("SELECT k, v FROM lake.default.c ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        (0L until 5L).map(i => (i, i * 2)))
      assert(TxnCatalog.tableProperties(s2, root, "c").get("team")
        .contains("ml"))
      // CTAS into an existing table refuses before anything runs
      intercept[Exception] {
        s2.sql("CREATE TABLE lake.default.c AS SELECT 1 AS x")
      }
      // RTAS: one txn replaces content, schema, and properties; the
      // pre-replace state stays time-travelable
      s2.sql("REPLACE TABLE lake.default.c AS SELECT id AS k FROM range(3)")
      val afterReplace = TxnCatalog.currentTxn(s2, root).get
      assert(afterReplace === afterCreate + 1, "RTAS = exactly ONE txn")
      assert(s2.sql("SELECT * FROM lake.default.c").columns.toSeq === Seq("k"))
      assert(s2.sql("SELECT count(*) FROM lake.default.c")
        .collect().head.getLong(0) === 3L)
      assert(s2.sql(
        s"SELECT count(*) FROM lake.default.c VERSION AS OF $afterCreate")
        .collect().head.getLong(0) === 5L)
      // REPLACE of a missing table errors; CREATE OR REPLACE creates
      intercept[Exception] {
        s2.sql("REPLACE TABLE lake.default.nope AS SELECT 1 AS x")
      }
      s2.sql("CREATE OR REPLACE TABLE lake.default.cor AS SELECT 7 AS x")
      assert(s2.sql("SELECT x FROM lake.default.cor")
        .collect().head.getInt(0) === 7)
      s2.sql("CREATE OR REPLACE TABLE lake.default.cor AS SELECT 8 AS x")
      assert(s2.sql("SELECT x FROM lake.default.cor")
        .collect().head.getInt(0) === 8)
    }
  }

  test("MERGE INTO: upsert, expression SET, matched DELETE, refusals") {
    withCatalog { (s2, root) =>
      graft.storage.GraftMerge.install(s2)
      TxnCatalog.commitPartitions(s2, root, Seq(("t", "batch=0",
        s2.range(0, 3).selectExpr("id AS k", "concat('v', id) AS v"))))
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(2 AS BIGINT), 'B'), (CAST(5 AS BIGINT), 'E') AS s(k, v)
               |""".stripMargin)
      // the canonical upsert: matched rows replaced, new keys inserted
      s2.sql("""MERGE INTO lake.default.t USING src ON t.k = src.k
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      def rows() = s2.sql("SELECT k, v FROM lake.default.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows() === Seq((0L, "v0"), (1L, "v1"), (2L, "B"), (5L, "E")))
      // O(source) posture: the merge landed ONE key list + ONE batch —
      // no pre-merge partition was rewritten
      val parts = TxnCatalog.partitions(s2, root, "t")
      assert(parts.contains("batch=0") && parts.exists(_.startsWith("batch=m")),
        s"merge must append beside the original batch, got $parts")
      // expression SET reading both sides
      s2.sql("""MERGE INTO lake.default.t USING src ON t.k = src.k
               |WHEN MATCHED THEN UPDATE SET v = concat(t.v, '+', src.v)
               |""".stripMargin)
      assert(rows() === Seq((0L, "v0"), (1L, "v1"), (2L, "B+B"), (5L, "E+E")))
      // matched DELETE
      s2.sql("""MERGE INTO lake.default.t USING src ON t.k = src.k
               |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(rows() === Seq((0L, "v0"), (1L, "v1")))
      // cardinality violation: duplicate source keys with a matched action
      s2.sql("""CREATE OR REPLACE TEMP VIEW dup AS SELECT * FROM VALUES
               |(CAST(1 AS BIGINT), 'x'), (CAST(1 AS BIGINT), 'y') AS s(k, v)
               |""".stripMargin)
      val err = intercept[Exception] {
        s2.sql("""MERGE INTO lake.default.t USING dup ON t.k = dup.k
                 |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      }
      assert(err.getMessage.contains("MERGE_CARDINALITY_VIOLATION"))
      // non-key ON shapes route to the POSITIONAL path (deletion
      // vector + batch — PositionalMergeSpec pins its mechanics); here
      // just pin that the compound ON executes with SQL semantics.
      // After the deletes above the table holds (0,v0) and (1,v1);
      // src holds (2,'B') and (5,'E') — nothing matches k AND v, so
      // a matched-only merge is a no-op
      s2.sql("""MERGE INTO lake.default.t USING src
               |ON t.k = src.k AND t.v = src.v
               |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      assert(rows() === Seq((0L, "v0"), (1L, "v1")),
        "compound-ON merge with no matches must not change the table")
    }
  }

  test("MERGE INTO: conditional actions and NOT MATCHED BY SOURCE DELETE") {
    withCatalog { (s2, root) =>
      graft.storage.GraftMerge.install(s2)
      TxnCatalog.commitPartitions(s2, root, Seq(("t", "batch=0",
        s2.range(0, 5).selectExpr("id AS k", "id * 10 AS v"))))
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(1 AS BIGINT), CAST(100 AS BIGINT)),
               |(CAST(2 AS BIGINT), CAST(5 AS BIGINT)),
               |(CAST(9 AS BIGINT), CAST(90 AS BIGINT)),
               |(CAST(10 AS BIGINT), CAST(3 AS BIGINT)) AS s(k, v)
               |""".stripMargin)
      def rows() = s2.sql("SELECT k, v FROM lake.default.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // conditional UPDATE + conditional INSERT: rows failing the
      // condition stay untouched / uninserted
      s2.sql("""MERGE INTO lake.default.t USING src ON t.k = src.k
               |WHEN MATCHED AND src.v > 50 THEN UPDATE SET v = src.v
               |WHEN NOT MATCHED AND src.v > 50 THEN INSERT *
               |""".stripMargin)
      assert(rows() === Seq((0L, 0L), (1L, 100L), (2L, 20L), (3L, 30L),
        (4L, 40L), (9L, 90L)),
        "k=2 fails the matched condition; k=10 fails the insert condition")
      // conditional matched DELETE: only qualifying matched keys masked
      s2.sql("""MERGE INTO lake.default.t USING src ON t.k = src.k
               |WHEN MATCHED AND src.v < 50 THEN DELETE""".stripMargin)
      assert(rows() === Seq((0L, 0L), (1L, 100L), (3L, 30L), (4L, 40L),
        (9L, 90L)), "only k=2 (src.v=5) qualifies for the delete")
      // the sync shape: target keys absent from the source are deleted
      s2.sql("""MERGE INTO lake.default.t USING src ON t.k = src.k
               |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(rows() === Seq((1L, 100L), (9L, 90L)),
        "0, 3, 4 have no source match and are deleted")
      // conditional NOT MATCHED BY SOURCE: only qualifying rows deleted
      TxnCatalog.commitPartitions(s2, root, Seq(("u", "batch=0",
        s2.range(0, 4).selectExpr("id AS k", "id * 10 AS v"))))
      s2.sql("""MERGE INTO lake.default.u USING src ON u.k = src.k
               |WHEN NOT MATCHED BY SOURCE AND u.v >= 30 THEN DELETE
               |""".stripMargin)
      assert(s2.sql("SELECT k FROM lake.default.u ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L),
        "k=3 is unmatched AND v>=30; k=0 is unmatched but v<30 survives")
    }
  }

  test("MERGE INTO: insert-only and update-only shapes") {
    withCatalog { (s2, root) =>
      graft.storage.GraftMerge.install(s2)
      TxnCatalog.commitPartitions(s2, root, Seq(("t", "batch=0",
        s2.range(0, 3).selectExpr("id AS k", "id * 10 AS v"))))
      s2.sql("""CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM VALUES
               |(CAST(2 AS BIGINT), CAST(99 AS BIGINT)),
               |(CAST(7 AS BIGINT), CAST(70 AS BIGINT)) AS s(k, v)
               |""".stripMargin)
      def rows() = s2.sql("SELECT k, v FROM lake.default.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // insert-only: matched keys untouched
      s2.sql("""MERGE INTO lake.default.t USING src ON t.k = src.k
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(rows() === Seq((0L, 0L), (1L, 10L), (2L, 20L), (7L, 70L)))
      // update-only: unmatched source keys must NOT insert
      s2.sql("""CREATE OR REPLACE TEMP VIEW src2 AS SELECT * FROM VALUES
               |(CAST(1 AS BIGINT), CAST(111 AS BIGINT)),
               |(CAST(404 AS BIGINT), CAST(4 AS BIGINT)) AS s(k, v)
               |""".stripMargin)
      s2.sql("""MERGE INTO lake.default.t USING src2 ON t.k = src2.k
               |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      assert(rows() === Seq((0L, 0L), (1L, 111L), (2L, 20L), (7L, 70L)))
    }
  }

  test("UPDATE: expression SET, range pruning, whole-table, refusals") {
    withCatalog { (s2, root) =>
      graft.storage.GraftMerge.install(s2)
      TxnCatalog.commitPartitions(s2, root,
        (0 until 4).map(k => ("t", s"b=$k",
          s2.range(k * 25, (k + 1) * 25)
            .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"))),
        statsColumns = Seq("k"))
      def rows() = s2.sql("SELECT k, v FROM lake.default.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // range WHERE with an expression SET over the row's own columns
      val before = TxnCatalog.currentTxn(s2, root).get
      s2.sql("UPDATE lake.default.t SET v = v + 1000 WHERE k >= 90 AND k <= 95")
      assert(rows() === (0 until 100).map(i =>
        (i.toLong, if (i >= 90 && i <= 95) i + 1000.0 else i * 1.0)))
      // skipping: only the partition whose stats overlap was rewritten
      val changed = TxnCatalog.diff(s2, root, before,
        TxnCatalog.currentTxn(s2, root).get)
      assert(changed.map(c => (c.table, c.partition, c.change))
        === Seq(("t", "b=3", "updated")),
        s"only b=3 overlaps [90,95]; got $changed")
      // unconditional UPDATE (no WHERE) touches every row
      s2.sql("UPDATE lake.default.t SET v = 0.5 WHERE true")
      assert(rows().forall(_._2 === 0.5))
      // subqueries are refused at planning, table unchanged
      val err = intercept[Exception] {
        s2.sql("""UPDATE lake.default.t SET v = 1.0
                 |WHERE k IN (SELECT k FROM lake.default.t)""".stripMargin)
      }
      assert(err.getMessage.contains("subquer"))
      assert(rows().forall(_._2 === 0.5))
    }
  }

  test("CREATE TABLE with TBLPROPERTIES is one txn — no constraint-less window") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.a (k BIGINT)
               |TBLPROPERTIES ('constraint.pos' = 'k > 0')""".stripMargin)
      // the creating txn already carries the properties: any snapshot
      // that can see the table sees its constraints
      val txn = TxnCatalog.currentTxn(s2, root).get
      val born = TxnCatalog.snapshotAt(s2, root, txn)
      assert(born.tables.contains("a"))
      assert(born.properties("a") === Map("constraint.pos" -> "k > 0"))
      // an unresolvable constraint expression refuses the CREATE whole
      intercept[Exception] {
        s2.sql("""CREATE TABLE lake.default.bad (k BIGINT)
                 |TBLPROPERTIES ('constraint.x' = 'no_such_col > 0')""".stripMargin)
      }
      assert(!TxnCatalog.tables(s2, root).contains("bad"),
        "a refused CREATE must not leave a half-made table")
    }
  }

  test("concurrent ALTER ADD COLUMN never silently drops a column") {
    withCatalog { (s2, root) =>
      s2.sql("CREATE TABLE lake.default.r (k BIGINT)")
      // two ALTERs racing: the deterministic batch=schema<txn+1> name
      // collides unless the commit is conditional — the loser must
      // re-read and land beside the winner, not replace it
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = Seq("c1", "c2").map { c =>
        new Thread(() => {
          try s2.sql(s"ALTER TABLE lake.default.r ADD COLUMN $c DOUBLE")
          catch { case e: Throwable => errs.add(e); () }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, s"unexpected ALTER failures: ${errs}")
      val cols = graft.storage.GraftLake.table(s2, root, "r").get
        .schema.fieldNames.toSet
      assert(cols === Set("k", "c1", "c2"),
        "both concurrently added columns must survive")
    }
  }

  test("whole-table tables: INSERT unions without lost rows; equality DELETE refused") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commit(s2, root,
        Seq(("w", Seq((1L, "a")).toDF("k", "v"))))
      s2.sql("INSERT INTO lake.default.w VALUES (2, 'b')")
      s2.sql("INSERT INTO lake.default.w VALUES (3, 'c')")
      assert(s2.sql("SELECT k FROM lake.default.w ORDER BY k")
        .as[Long].collect() === Array(1L, 2L, 3L))
      // equality DELETE would need merge-on-read: refused at planning
      intercept[Exception] {
        s2.sql("DELETE FROM lake.default.w WHERE k = 2")
      }
      assert(s2.sql("SELECT count(*) FROM lake.default.w")
        .collect().head.getLong(0) === 3L)
      // truncate still works on whole-table tables
      s2.sql("DELETE FROM lake.default.w")
      assert(s2.sql("SELECT count(*) FROM lake.default.w")
        .collect().head.getLong(0) === 0L)
    }
  }

  test("merge-on-read deletes apply through the SQL read path") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0",
          (0 until 50).map(i => (i.toLong, s"r$i")).toDF("k", "nm"))),
        statsColumns = Seq("k"))
      TxnCatalog.deleteKeys(s2, root, "t", "k", Seq(7L, 13L).toDF("k"))
      val got = s2.sql("SELECT k FROM lake.default.t ORDER BY k")
        .as[Long].collect()
      assert(got === (0L until 50L).filterNot(Set(7L, 13L)).toArray)
    }
  }

  test("TRUNCATE TABLE empties a lake table through the delete bridge") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=0", (0L until 40L).map(i => (i, s"r$i"))
          .toDF("k", "nm"))))
      s2.sql("TRUNCATE TABLE lake.default.ev")
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .collect().head.getLong(0) === 0L)
      // still a live (empty) table: INSERT works after truncate
      s2.sql("INSERT INTO lake.default.ev VALUES (7, 'x')")
      assert(s2.sql("SELECT k FROM lake.default.ev").collect()
        .map(_.getLong(0)).toSeq === Seq(7L))
    }
  }

  test("metadata tables: history / partitions / changes / files resolve under the data table") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=0",
          (0L until 50L).map(i => (i, s"r$i")).toDF("k", "nm"))),
        statsColumns = Seq("k"), bloomColumns = Seq("k"))
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=1",
          (50L until 80L).map(i => (i, s"r$i")).toDF("k", "nm"))),
        statsColumns = Seq("k"))
      TxnCatalog.deleteKeys(s2, root, "ev", "k", Seq(7L).toDF("k"))
      // history: one row per txn the table exists in, rows tracked
      val hist = s2.sql(
        "SELECT txn, partitions, row_count FROM lake.default.ev.history " +
          "ORDER BY txn").collect()
      assert(hist.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
      assert(hist.map(_.getInt(1)).toSeq === Seq(1, 2, 2))
      assert(hist.head.getLong(2) === 50L && hist(1).getLong(2) === 80L)
      // partitions: manifest entries with their stats inventory
      val parts = s2.sql(
        "SELECT partition, rows, stat_columns, bloom_columns " +
          "FROM lake.default.ev.partitions ORDER BY partition").collect()
      assert(parts.map(_.getString(0)).toSeq === Seq("b=0", "b=1"))
      assert(parts.map(_.getLong(1)).toSeq === Seq(50L, 30L))
      assert(parts.forall(_.getString(2) === "k"))
      assert(parts.map(_.getString(3)).toSeq === Seq("k", ""))
      // changes: the full CDC feed — 80 inserts + 1 delete event
      val ch = s2.sql(
        "SELECT _change_type, count(*) AS n FROM lake.default.ev.changes " +
          "GROUP BY 1 ORDER BY 1").collect()
      assert(ch.map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq(("delete", 1L), ("insert", 80L)))
      // filters push into the metadata frame
      assert(s2.sql("SELECT k FROM lake.default.ev.changes " +
        "WHERE _change_type = 'delete'").collect().head.getLong(0) === 7L)
      // files: every live data file with its physical size, per entry
      val files = s2.sql(
        "SELECT partition, file_path, size_bytes " +
          "FROM lake.default.ev.files ORDER BY partition, file_path")
        .collect()
      assert(files.map(_.getString(0)).distinct.toSeq === Seq("b=0", "b=1"),
        "delete-key entries are not data files")
      assert(files.forall(_.getString(1).endsWith(".parquet")))
      assert(files.forall(_.getLong(2) > 0L))
      // sizes are the real physical bytes
      val onDisk = files.map { r =>
        new java.io.File(new java.net.URI(r.getString(1))).length }
      assert(files.map(_.getLong(2)).toSeq === onDisk.toSeq)
      // detail: one row of table-level facts — entry/byte totals exact,
      // row_count NULL while the delete above is pending (the same
      // exact-or-absent rule as the metadata folds), maintenance
      // counters naming what's due
      val det = s2.sql("SELECT * FROM lake.default.ev.detail")
        .collect().head
      assert(det.getAs[String]("table") === "ev")
      assert(det.getAs[Int]("entries") === 2)
      assert(det.isNullAt(det.fieldIndex("row_count")),
        "a pending delete sends row_count dark")
      assert(det.getAs[Long]("size_bytes") === onDisk.sum)
      assert(det.getAs[Int]("pending_deletes") === 1)
      assert(det.getAs[Int]("external_entries") === 0)
      assert(det.getAs[String]("stats_columns") === "")
      // apply the delete: row_count comes back, counters clear
      s2.sql("CALL lake.system.apply_deletes(table => 'ev')")
      val det2 = s2.sql("SELECT row_count, pending_deletes " +
        "FROM lake.default.ev.detail").collect().head
      assert(det2.getLong(0) === 79L)
      assert(det2.getInt(1) === 0)
    }
  }

  test("auto-compact folds accumulated INSERT batches at the declared threshold") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      // partitioned from birth (a CREATE TABLE shell takes the
      // whole-table snapshot path, which never accretes batches)
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "batch=seed", Seq((1L, "a"), (2L, "b")).toDF("k", "nm"))),
        statsColumns = Seq("k"))
      s2.sql("ALTER TABLE lake.default.ev SET TBLPROPERTIES (" +
        "'graft.autocompact.min-batches' = '3', " +
        "'graft.stats-columns' = 'k')")
      def batches = TxnCatalog.partitions(s2, root, "ev")
        .count(_.startsWith("batch="))
      def compacted = TxnCatalog.partitions(s2, root, "ev")
        .count(_.startsWith("c"))
      s2.sql("INSERT INTO lake.default.ev VALUES (3, 'c')")
      assert(batches === 2 && compacted === 0, "below threshold: no fold")
      s2.sql("INSERT INTO lake.default.ev VALUES (4, 'd')")
      assert(batches === 0 && compacted === 1,
        "the third batch crossed the threshold and folded all three")
      assert(s2.sql("SELECT k FROM lake.default.ev ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
      // the fold measured the declared stats columns: k still prunes
      val snap = TxnCatalog.snapshot(s2, root).get
      assert(snap.entrySizes("ev").nonEmpty)
      assert(snap.partitionsWhereEq("ev", "k", 99L).isEmpty,
        "compacted entry carries k stats - an absent key prunes")
      // accumulation restarts below the threshold
      s2.sql("INSERT INTO lake.default.ev VALUES (5, 'e')")
      assert(batches === 1 && compacted === 1)
    }
  }

  test("concurrent SQL INSERTs all land: the append path's txn-race retry holds") {
    withCatalog { (s2, _) =>
      s2.sql("CREATE TABLE lake.default.ev (k BIGINT, nm STRING)")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val writes = (0 until 6).map { w =>
        scala.concurrent.Future {
          SparkSession.setActiveSession(s2)
          s2.sql(s"INSERT INTO lake.default.ev VALUES ($w, 'w$w')")
        }
      }
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(writes),
        scala.concurrent.duration.Duration(120, "s"))
      finally pool.shutdown()
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .collect().head.getLong(0) === 6L,
        "every racing INSERT must land exactly once")
      assert(s2.sql("SELECT k FROM lake.default.ev ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === (0L until 6L))
    }
  }

  test("manifest row counts drive join planning: a small lake table auto-broadcasts") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("dim", "b=0",
          (0L until 100L).map(i => (i, s"d$i")).toDF("k", "dn"))),
        statsColumns = Seq("k")) // stats ⇒ rows recorded in the manifest
      (0L until 5000L).map(i => (i % 100, i)).toDF("k", "v")
        .createOrReplaceTempView("facts")
      // AQE off: only STATIC planning can choose the broadcast, and
      // static planning sees exactly the scan's manifest statistics —
      // without them the v2 relation defaults to defaultSizeInBytes
      // (= never broadcast) and this would plan a sort-merge join
      val aqe = s2.conf.get("spark.sql.adaptive.enabled")
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val joined = s2.sql(
          """SELECT f.k, f.v, d.dn FROM facts f
            |JOIN lake.default.dim d ON f.k = d.k""".stripMargin)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"small lake table should broadcast statically:\n$plan")
        assert(!plan.contains("SortMergeJoin"), s"no SMJ expected:\n$plan")
        assert(joined.count() === 5000L)
      } finally s2.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("TBLPROPERTIES graft.stats-columns: every writer's commits carry skippable stats") {
    withCatalog { (s2, root) =>
      import s2.implicits._
      s2.sql("""CREATE TABLE lake.default.ev (k BIGINT, nm STRING)
               |TBLPROPERTIES ('graft.stats-columns' = 'k',
               |               'graft.bloom-columns' = 'k')""".stripMargin)
      // SQL INSERT: no per-call stats knob anywhere in the statement
      s2.sql("INSERT INTO lake.default.ev VALUES (5, 'a'), (9, 'b')")
      // DataFrame primitive: caller passes NO statsColumns either
      TxnCatalog.appendBatch(s2, root, "ev", "df1",
        (100L until 200L).map(i => (i, s"r$i")).toDF("k", "nm"))
      val snap = TxnCatalog.snapshot(s2, root).get
      val dataParts = snap.partitions("ev")
        .filter(p => snap.rowCount("ev", p).exists(_ > 0))
      assert(dataParts.nonEmpty)
      dataParts.foreach { p =>
        val st = snap.stats("ev", p)
        assert(st.contains("k"), s"partition $p must carry k stats")
        assert(st("k").bloom.nonEmpty, s"partition $p must carry a k Bloom")
      }
      // and the stats actually skip: a probe outside [100, 200) prunes
      // the appendBatch partition (the stat-less zero-row init
      // partition stays conservatively kept — that's the contract)
      val hit = snap.partitionsWhereEq("ev", "k", 5L)
      assert(!hit.contains("batch=df1"), s"expected df1 pruned, kept $hit")
      // compaction (no stats args) inherits the config too
      s2.sql("CALL lake.system.optimize(table => 'ev', prefix => '')")
      val snap2 = TxnCatalog.snapshot(s2, root).get
      val parts2 = snap2.partitions("ev")
        .filter(p => snap2.rowCount("ev", p).exists(_ > 0))
      assert(parts2.forall(p => snap2.stats("ev", p).contains("k")),
        "compacted partition must inherit the configured stats")
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .collect().head.getLong(0) === 102L)
    }
  }
}
