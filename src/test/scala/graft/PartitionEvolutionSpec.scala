package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.storage.{PartitionSpec, TxnCatalog}

/** Partition-spec EVOLUTION ([[TxnCatalog.evolvePartitionSpec]] /
  * `CALL system.evolve_partitioning` / `ALTER TABLE ... SET
  * TBLPROPERTIES('graft.partition-spec' = ...)`) — one manifest-only
  * commit: future writes route under the new transforms, existing
  * partitions stay byte-identical, pruning config merges (never
  * shrinks), invalid specs refuse without committing. */
class PartitionEvolutionSpec extends GraftSuite {

  private def withCatalog[A](f: (SparkSession, String) => A): A = {
    val root = Files.createTempDirectory("evopart").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-evopart-test")
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

  private def mkMonthTable(s2: SparkSession): Unit = {
    s2.sql("""CREATE TABLE lake.default.ev (
             |  id BIGINT, ts TIMESTAMP, v DOUBLE)
             |PARTITIONED BY (months(ts))""".stripMargin)
    s2.sql("""INSERT INTO lake.default.ev SELECT
             |  id, timestamp'2024-01-15 00:00:00' + make_interval(0,
             |    CAST(id % 2 AS INT), 0, 0, 0, 0, 0), CAST(id AS DOUBLE)
             |FROM range(0, 100)""".stripMargin)
  }

  test("evolve months->days: new writes route new, old dirs untouched") {
    withCatalog { (s2, root) =>
      mkMonthTable(s2) // 2 month partitions (Jan, Feb)
      val before = TxnCatalog.snapshot(s2, root).get.partitions("ev")
        .filter(_.contains("ts=")).toSet
      assert(before.forall(_.matches(""".*\.ts=\d{4}-\d{2}""")), before)
      s2.sql("CALL lake.system.evolve_partitioning(" +
        "table => 'ev', spec => 'days(ts)')")
      s2.sql("""INSERT INTO lake.default.ev SELECT
               |  id, timestamp'2024-03-05 00:00:00' + make_interval(0,0,0,
               |    CAST(id % 2 AS INT), 0, 0, 0), CAST(id AS DOUBLE)
               |FROM range(100, 150)""".stripMargin)
      val after = TxnCatalog.snapshot(s2, root).get.partitions("ev")
        .filter(_.contains("ts=")).toSet
      assert(before.subsetOf(after),
        "evolution must leave existing partitions in place")
      val fresh = after -- before
      assert(fresh.nonEmpty &&
        fresh.forall(_.matches(""".*\.ts=\d{4}-\d{2}-\d{2}""")),
        s"post-evolution inserts must route per-day: $fresh")
      // both generations answer exactly
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .head.getLong(0) === 150L)
      assert(s2.sql("""SELECT count(*) FROM lake.default.ev
                      |WHERE ts >= timestamp'2024-03-01 00:00:00'
                      |""".stripMargin).head.getLong(0) === 50L)
    }
  }

  test("pruning config merges: bucket source joins blooms, old stats stay") {
    withCatalog { (s2, root) =>
      mkMonthTable(s2)
      s2.sql("CALL lake.system.evolve_partitioning(" +
        "table => 'ev', spec => 'bucket(4,id)')")
      val props = TxnCatalog.tableProperties(s2, root, "ev")
      assert(props(PartitionSpec.Prop) === "bucket(4,id)")
      // the months(ts) stats column survives; the bucket source joins
      // the Bloom list — neither generation loses skippability
      assert(props(TxnCatalog.StatsColumnsProp).split(',').contains("ts"))
      assert(props(TxnCatalog.BloomColumnsProp).split(',').contains("id"))
    }
  }

  test("invalid spec refuses without committing (procedure and ALTER)") {
    withCatalog { (s2, root) =>
      mkMonthTable(s2)
      val txn0 = TxnCatalog.currentTxn(s2, root).get
      intercept[Exception] {
        s2.sql("CALL lake.system.evolve_partitioning(" +
          "table => 'ev', spec => 'days(no_such_col)')")
      }
      intercept[Exception] {
        s2.sql("CALL lake.system.evolve_partitioning(" +
          "table => 'ev', spec => 'spiral(7,ts)')")
      }
      // SQL ALTER routes through the same validation
      intercept[Exception] {
        s2.sql("ALTER TABLE lake.default.ev SET TBLPROPERTIES(" +
          "'graft.partition-spec' = 'days(no_such_col)')")
      }
      assert(TxnCatalog.currentTxn(s2, root).get === txn0,
        "a refused evolution must commit nothing")
      assert(TxnCatalog.tableProperties(s2, root, "ev")(PartitionSpec.Prop)
        === "months(ts)")
    }
  }

  test("ALTER SET TBLPROPERTIES evolves with validation; empty removes") {
    withCatalog { (s2, root) =>
      mkMonthTable(s2)
      s2.sql("ALTER TABLE lake.default.ev SET TBLPROPERTIES(" +
        "'graft.partition-spec' = 'days(ts)')")
      assert(TxnCatalog.tableProperties(s2, root, "ev")(PartitionSpec.Prop)
        === "days(ts)")
      s2.sql("ALTER TABLE lake.default.ev UNSET TBLPROPERTIES(" +
        "'graft.partition-spec')")
      assert(!TxnCatalog.tableProperties(s2, root, "ev")
        .contains(PartitionSpec.Prop))
      // unpartitioned again: inserts land as plain batches, reads exact
      s2.sql("INSERT INTO lake.default.ev SELECT id, " +
        "timestamp'2024-06-01 00:00:00', CAST(id AS DOUBLE) " +
        "FROM range(150, 160)")
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .head.getLong(0) === 110L)
    }
  }
}
