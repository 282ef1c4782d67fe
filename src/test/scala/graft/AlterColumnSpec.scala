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

  // --- ALTER COLUMN TYPE widening (VERDICT r8 task #6)

  private def withSqlCatalog[A](tag: String)(
      f: (SparkSession, String) => A): A = {
    val root = tmp(tag)
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-$tag-test")
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

  test("ALTER COLUMN TYPE int->bigint is a manifest-only widen") {
    withSqlCatalog("widen") { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=0",
          (0 until 50).map(i => (i, s"n$i")).toDF("k", "nm"))),
        statsColumns = Seq("k"))
      val dirsBefore = new java.io.File(s"$root/ev/b=0").listFiles()
        .map(_.getName).sorted.toSeq
      s2.sql("ALTER TABLE lake.default.ev ALTER COLUMN k TYPE BIGINT")
      // schema widened, values intact, narrow files NOT rewritten
      assert(s2.table("lake.default.ev").schema("k").dataType ===
        org.apache.spark.sql.types.LongType)
      assert(s2.sql("SELECT sum(k) FROM lake.default.ev")
        .collect().head.getLong(0) === (0 until 50).sum.toLong)
      assert(new java.io.File(s"$root/ev/b=0").listFiles()
        .map(_.getName).sorted.toSeq === dirsBefore,
        "widening must not rewrite existing data")
      // appends conform to the WIDE type; mixed-width footers still read
      s2.sql("INSERT INTO lake.default.ev VALUES " +
        "(CAST(5000000000 AS BIGINT), 'wide')")
      assert(s2.sql("SELECT count(*) FROM lake.default.ev " +
        "WHERE k > 2000000000").collect().head.getLong(0) === 1L)
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .collect().head.getLong(0) === 51L)
    }
  }

  test("ALTER COLUMN TYPE float->double and decimal growth") {
    withSqlCatalog("widenf") { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("m", "b=0",
          (0 until 10).map(i => (i.toLong, i.toFloat, i))
            .toDF("k", "f", "d0")
            .withColumn("d", col("d0").cast("decimal(10,2)")).drop("d0"))),
        statsColumns = Seq("k"))
      s2.sql("ALTER TABLE lake.default.m ALTER COLUMN f TYPE DOUBLE")
      s2.sql("ALTER TABLE lake.default.m ALTER COLUMN d TYPE DECIMAL(38,4)")
      val sch = s2.table("lake.default.m").schema
      assert(sch("f").dataType === org.apache.spark.sql.types.DoubleType)
      assert(sch("d").dataType ===
        org.apache.spark.sql.types.DecimalType(38, 4))
      assert(s2.sql("SELECT sum(f), sum(d) FROM lake.default.m")
        .collect().head.getDouble(0) === 45.0)
    }
  }

  test("ALTER COLUMN TYPE refuses narrowing and non-numeric casts") {
    withSqlCatalog("widenref") { (s2, root) =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=0",
          (0 until 5).map(i => (i.toLong, s"n$i")).toDF("k", "nm"))),
        statsColumns = Seq("k"))
      // Spark's own analysis refuses narrowing/non-numeric changes
      // (NOT_SUPPORTED_CHANGE_COLUMN) before the catalog sees them;
      // the catalog's widening gate is the second line of defense for
      // direct TableChange callers
      val e1 = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.ev ALTER COLUMN k TYPE INT")
      }
      assert(e1.getMessage.contains("widening") ||
        e1.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
      val e2 = intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.ev ALTER COLUMN nm TYPE BIGINT")
      }
      assert(e2.getMessage.contains("widening") ||
        e2.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
      val e3 = intercept[Exception] {
        // direct TableChange path: bypasses SQL analysis, hits the gate
        s2.sessionState.catalogManager.catalog("lake")
          .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
          .alterTable(
            org.apache.spark.sql.connector.catalog.Identifier
              .of(Array("default"), "ev"),
            org.apache.spark.sql.connector.catalog.TableChange
              .updateColumnType(Array("k"),
                org.apache.spark.sql.types.IntegerType))
      }
      assert(e3.getMessage.contains("widening"))
      // nothing half-applied
      assert(s2.table("lake.default.ev").schema("k").dataType ===
        org.apache.spark.sql.types.LongType)
    }
  }

  test("widened column stays readable through the engine read paths") {
    withSqlCatalog("widenrd") { (s2, root) =>
      import s2.implicits._
      (0 until 2).foreach { b =>
        TxnCatalog.commitPartitions(s2, root,
          Seq(("ev", s"b=$b",
            (b * 10 until (b + 1) * 10).map(i => (i, i * 2L))
              .toDF("k", "v"))),
          statsColumns = Seq("k"))
      }
      s2.sql("ALTER TABLE lake.default.ev ALTER COLUMN k TYPE BIGINT")
      // TxnCatalog.read (funnel), readWhere (stats pruning), and the
      // Catalyst GraftLake path all serve the widened schema
      val funnel = TxnCatalog.read(s2, root, "ev").get
      assert(funnel.schema("k").dataType ===
        org.apache.spark.sql.types.LongType)
      assert(funnel.count() === 20L)
      val pruned = TxnCatalog.snapshot(s2, root).get
        .readWhere("ev", "k", 0L, 5L).get
      assert(pruned.filter(col("k") <= 5).count() === 6L)
      val lake = graft.storage.GraftLake.table(s2, root, "ev").get
      assert(lake.where(col("k") === 15L).count() === 1L)
      // equality-delete with narrow key list still masks after widen
      TxnCatalog.deleteKeys(s2, root, "ev", "k", Seq(3L).toDF("k"))
      assert(TxnCatalog.read(s2, root, "ev").get.count() === 19L)
    }
  }
}
