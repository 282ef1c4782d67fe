package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.{PartitionSpec, TxnCatalog}

/** Hidden partitioning ([[PartitionSpec]]): `PARTITIONED BY
  * (days(ts), bucket(n, c), ...)` declared once, every INSERT routed
  * through the transforms, pruning via the auto-configured stats and
  * Bloom machinery — no writer-side knob, no name parsing. */
class HiddenPartitionSpec extends GraftSuite {

  private def withCatalog[A](f: (SparkSession, String) => A): A = {
    val root = Files.createTempDirectory("hidpart").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-hidpart-test")
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

  test("parse/render round-trips every transform") {
    val spec = "days(ts);bucket(8,k);truncate(4,name);identity(seg);" +
      "months(ts);years(ts);hours(ts)"
    assert(PartitionSpec.render(PartitionSpec.parse(spec)) === spec)
  }

  test("days transform routes inserts into per-day partitions that prune") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.ev (
               |  id BIGINT, ts TIMESTAMP, v DOUBLE)
               |PARTITIONED BY (days(ts))""".stripMargin)
      s2.sql("""INSERT INTO lake.default.ev SELECT
               |  id, timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,
               |    CAST(id % 72 AS INT), 0, 0), CAST(id AS DOUBLE)
               |FROM range(0, 600)""".stripMargin)
      // 72 hours of data → 3 day-partitions (+ the init partition)
      val snap = TxnCatalog.snapshot(s2, root).get
      val parts = snap.partitions("ev")
      assert(parts.count(_.contains("ts=")) === 3, parts.toString)
      // every day partition records tight ts stats → a one-day filter
      // prunes to one partition at manifest cost
      val idx = graft.storage.GraftLake.index(s2, root, "ev", snap)
      val day = org.apache.spark.sql.catalyst.expressions.And(
        org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          tsAttr, tsLit("2024-03-02 00:00:00")),
        org.apache.spark.sql.catalyst.expressions.LessThan(
          tsAttr, tsLit("2024-03-03 00:00:00")))
      assert(idx.survivingFileCount(Seq(day)) < idx.totalFileCount,
        "a one-day predicate must prune day partitions")
      // and SQL answers stay exact
      // ids 0..599 over 72 hourly residues: residues 24..47 (day 2)
      // occur 8 times each → 192 rows
      assert(s2.sql("""SELECT count(*) FROM lake.default.ev
                      |WHERE ts >= timestamp'2024-03-02 00:00:00'
                      |  AND ts <  timestamp'2024-03-03 00:00:00'
                      |""".stripMargin).head.getLong(0) === 192L)
      // DESCRIBE-level surface: partitioning() reports the transform
      val cat = s2.sessionState.catalogManager.catalog("lake")
        .asInstanceOf[graft.storage.GraftCatalog]
      val t = cat.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("default"), "ev"))
      assert(t.partitioning().map(_.describe()).toSeq === Seq("days(ts)"))
    }
  }

  private def tsAttr =
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "ts", org.apache.spark.sql.types.TimestampType)()
  private def tsLit(s: String) =
    org.apache.spark.sql.catalyst.expressions.Literal(
      java.sql.Timestamp.valueOf(s))

  test("bucket transform prunes point lookups via per-partition Blooms") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.kv (k BIGINT, v STRING)
               |PARTITIONED BY (bucket(4, k))""".stripMargin)
      s2.sql("""INSERT INTO lake.default.kv
               |SELECT id, concat('v', id) FROM range(0, 400)""".stripMargin)
      val snap = TxnCatalog.snapshot(s2, root).get
      assert(snap.partitions("kv").count(_.contains("k=")) === 4)
      // Blooms were measured at insert (auto bloom-columns): an absent
      // key prunes every BUCKET (the stat-less zero-row init partition
      // is conservatively kept, as always)
      val pruned = snap.partitionsWhereEq("kv", "k", 123456789L)
      assert(pruned.forall(!_.contains("k=")),
        s"absent key must prune all buckets: $pruned")
      assert(s2.sql("SELECT v FROM lake.default.kv WHERE k = 37")
        .head.getString(0) === "v37")
    }
  }

  test("repeated inserts land beside each other; overwrite swaps atomically") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.ev (id BIGINT, ts TIMESTAMP)
               |PARTITIONED BY (days(ts))""".stripMargin)
      s2.sql("""INSERT INTO lake.default.ev
               |VALUES (1, timestamp'2024-03-01 10:00:00')""".stripMargin)
      s2.sql("""INSERT INTO lake.default.ev
               |VALUES (2, timestamp'2024-03-01 11:00:00')""".stripMargin)
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .head.getLong(0) === 2L, "same-day inserts must not replace")
      s2.sql("""INSERT OVERWRITE lake.default.ev
               |VALUES (9, timestamp'2024-04-01 00:00:00')""".stripMargin)
      assert(s2.sql("SELECT id FROM lake.default.ev").collect()
        .map(_.getLong(0)).toSeq === Seq(9L))
    }
  }

  test("the streaming sink routes micro-batches through the declared transforms") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.ev (id BIGINT, ts TIMESTAMP)
               |PARTITIONED BY (days(ts))""".stripMargin)
      import s2.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
      val ckpt = Files.createTempDirectory("hidsink").toString
      val src = MemoryStream[(Long, String)]
      val q = src.toDF().toDF("id", "tss")
        .select($"id", to_timestamp($"tss").as("ts"))
        .writeStream.format("graft-lake")
        .option("root", root).option("table", "ev")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        src.addData((1L, "2024-03-01 10:00:00"), (2L, "2024-03-02 10:00:00"))
        q.processAllAvailable()
        src.addData((3L, "2024-03-01 12:00:00"))
        q.processAllAvailable()
      } finally q.stop()
      val snap = TxnCatalog.snapshot(s2, root).get
      val parts = snap.partitions("ev")
      assert(parts.count(_.contains("ts=2024-03-01")) === 2,
        s"each trigger lands its own day partitions: $parts")
      assert(parts.count(_.contains("ts=2024-03-02")) === 1, parts.toString)
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .head.getLong(0) === 3L)
      // per-day stats recorded from the stream: a one-day probe keeps
      // only that day's partitions
      def utc(iso: String) =
        java.sql.Timestamp.from(java.time.Instant.parse(iso))
      val surv = snap.partitionsWhere("ev", "ts",
        utc("2024-03-02T00:00:00Z"), utc("2024-03-02T23:00:00Z"))
      assert(surv.count(_.contains("ts=")) === 1, surv.toString)
    }
  }

  test("partition EVOLUTION: a new spec governs new writes only") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.ev (id BIGINT, ts TIMESTAMP)
               |PARTITIONED BY (months(ts))""".stripMargin)
      s2.sql("""INSERT INTO lake.default.ev SELECT
               |  id, timestamp'2024-01-15 00:00:00' + make_interval(0,
               |    CAST(id % 2 AS INT), 0, 0, 0, 0, 0)
               |FROM range(0, 100)""".stripMargin)
      val before = TxnCatalog.snapshot(s2, root).get.partitions("ev")
      assert(before.count(_.contains("ts=")) === 2, before.toString)
      // evolve: months(ts) → days(ts). Names are opaque and pruning is
      // stats-based, so old month partitions stay readable and prunable
      // while new writes land at day grain — no rewrite, no migration.
      s2.sql("""ALTER TABLE lake.default.ev
               |SET TBLPROPERTIES('graft.partition-spec' = 'days(ts)')
               |""".stripMargin)
      s2.sql("""INSERT INTO lake.default.ev VALUES
               |(900, timestamp'2024-03-05 08:00:00'),
               |(901, timestamp'2024-03-06 08:00:00')""".stripMargin)
      val after = TxnCatalog.snapshot(s2, root).get.partitions("ev")
      assert((after.toSet -- before.toSet).size === 2,
        "two new DAY partitions under the evolved spec")
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .head.getLong(0) === 102L)
      // stats still prune across BOTH generations of the spec
      val snap = TxnCatalog.snapshot(s2, root).get
      def utc(iso: String) =
        java.sql.Timestamp.from(java.time.Instant.parse(iso))
      val surv = snap.partitionsWhere("ev", "ts",
        utc("2024-03-05T00:00:00Z"), utc("2024-03-05T23:59:59Z"))
      assert(surv.count(_.contains("ts=")) === 1,
        s"a one-day probe must keep exactly the one day partition: $surv")
    }
  }

  test("OPTIMIZE folds per logical group: day stats survive compaction") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.ev (id BIGINT, ts TIMESTAMP)
               |PARTITIONED BY (days(ts))""".stripMargin)
      s2.sql("""INSERT INTO lake.default.ev VALUES
               |(1, timestamp'2024-03-01 10:00:00'),
               |(2, timestamp'2024-03-02 10:00:00')""".stripMargin)
      s2.sql("""INSERT INTO lake.default.ev VALUES
               |(3, timestamp'2024-03-01 12:00:00')""".stripMargin)
      val preFold = TxnCatalog.snapshot(s2, root).get
      assert(preFold.partitions("ev").count(_.contains("ts=")) === 3)
      val t0 = preFold.txn
      s2.sql("CALL lake.system.optimize(table => 'ev', prefix => 'b')")
      val snap = TxnCatalog.snapshot(s2, root).get
      val folded = snap.partitions("ev").filter(_.contains("ts="))
      assert(folded.size === 2 && folded.forall(_.startsWith("c")),
        s"one compacted partition per DAY, not one blob: $folded")
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .head.getLong(0) === 3L)
      // per-day stats survived the fold: a one-day probe keeps one part
      def utc(iso: String) =
        java.sql.Timestamp.from(java.time.Instant.parse(iso))
      val surv = snap.partitionsWhere("ev", "ts",
        utc("2024-03-02T00:00:00Z"), utc("2024-03-02T23:00:00Z"))
      assert(surv.count(_.contains("ts=")) === 1, surv.toString)
      // the fold is a reorganization: incremental consumers skip it
      assert(TxnCatalog.diffData(s2, root, t0, snap.txn).isEmpty,
        "OPTIMIZE must be invisible to diffData consumers")
    }
  }

  test("multi-transform spec groups by the composite and a bulk insert works") {
    withCatalog { (s2, root) =>
      s2.sql("""CREATE TABLE lake.default.m (k BIGINT, ts TIMESTAMP)
               |PARTITIONED BY (days(ts), bucket(2, k))""".stripMargin)
      // 40 days x 2 buckets = 80 groups > 32 → the bulk O(1)-jobs path
      s2.sql("""INSERT INTO lake.default.m SELECT
               |  id, timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,
               |    CAST(id % 40 AS INT), 0, 0, 0)
               |FROM range(0, 800)""".stripMargin)
      assert(s2.sql("SELECT count(*) FROM lake.default.m")
        .head.getLong(0) === 800L)
      val snap = TxnCatalog.snapshot(s2, root).get
      assert(snap.partitions("m").count(_.contains("ts-k=")) === 80)
      // stats recorded per group: one-day filter prunes
      val got = s2.sql("""SELECT count(*) FROM lake.default.m
                         |WHERE ts = timestamp'2024-01-05 00:00:00'
                         |""".stripMargin).head.getLong(0)
      assert(got === 20L)
    }
  }
}
