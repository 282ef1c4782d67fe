package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{GraftLake, TxnCatalog}

/** [[graft.storage.ManifestFileIndex]] under Catalyst: plain `where` /
  * SQL filters over a [[GraftLake.table]] frame must (a) return exactly
  * the filtered row set and (b) prune partitions through the manifest
  * stats and Blooms — with every unprovable shape kept (conservative).
  */
class LakeIndexSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  /** 4 batches range-disjoint on `k` (0-99, 100-199, ...), overlapping
    * on `v`; per-batch-prefixed `name` ("adoc12", "bdoc112", ...). */
  private def rangeLake(root: String): Unit = {
    val df = (0 until 400).map { i =>
      (i.toLong, (i % 40).toLong, s"${('a' + i / 100).toChar}doc$i")
    }.toDF("k", "v", "name")
    TxnCatalog.commitPartitions(spark, root,
      (0 until 4).map(b => ("t", s"batch=$b",
        df.filter($"k" >= b * 100L && $"k" < (b + 1) * 100L))),
      statsColumns = Seq("k", "v", "name"), bloomColumns = Seq("k"))
  }

  private def kAttr = AttributeReference("k", LongType)()
  private def nameAttr = AttributeReference("name", StringType)()

  test("plain where over GraftLake.table prunes via manifest stats") {
    val root = tmp("lakeidx"); rangeLake(root)
    val lake = GraftLake.table(spark, root, "t").get
    val q = lake.where($"k" >= 150L && $"k" <= 180L)
    val got = q.select("k").as[Long].collect().sorted
    assert(got === (150L to 180L).toArray)

    val idx = GraftLake.index(spark, root, "t",
      TxnCatalog.snapshot(spark, root).get)
    val total = idx.totalFileCount
    assert(total >= 4, "expected at least one file per batch")
    val pruned = idx.survivingFileCount(Seq(And(
      GreaterThanOrEqual(kAttr, Literal(150L)),
      LessThanOrEqual(kAttr, Literal(180L)))))
    assert(pruned < total, s"range probe should prune ($pruned/$total)")

    // end-to-end: the EXECUTED scan read fewer files than the table holds
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
    assert(scan.metrics("numFiles").value < total,
      s"executed scan read ${scan.metrics("numFiles").value} of $total files")
  }

  test("equality probe routes through the manifest Bloom") {
    val root = tmp("lakebloom")
    // pmod split: every batch spans the full k range — range stats prune
    // nothing, only the Bloom can
    val df = (0 until 400).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    TxnCatalog.commitPartitions(spark, root,
      (0 until 4).map(b => ("t", s"batch=$b", df.filter(pmod($"k", lit(4)) === b))),
      statsColumns = Seq("k"), bloomColumns = Seq("k"))
    val idx = GraftLake.index(spark, root, "t",
      TxnCatalog.snapshot(spark, root).get)
    val total = idx.totalFileCount
    val hit = idx.survivingFileCount(Seq(EqualTo(kAttr, Literal(42L))))
    assert(hit < total, s"bloom probe should prune ($hit/$total)")
    val lake = GraftLake.table(spark, root, "t").get
    assert(lake.where($"k" === 42L).select("name").as[String].collect()
      === Array("d42"))
    // IN-list: union of owners, still pruned
    val in = idx.survivingFileCount(Seq(In(kAttr, Seq(Literal(42L), Literal(43L)))))
    assert(in < total && in >= hit)
    assert(lake.where($"k".isin(42L, 43L)).count() === 2)
  }

  test("Or keeps the union; unknown shapes and stat-less columns keep all") {
    val root = tmp("lakeor"); rangeLake(root)
    val idx = GraftLake.index(spark, root, "t",
      TxnCatalog.snapshot(spark, root).get)
    val total = idx.totalFileCount
    val lo = Seq(And(GreaterThanOrEqual(kAttr, Literal(0L)),
      LessThanOrEqual(kAttr, Literal(50L))))
    val hi = Seq(And(GreaterThanOrEqual(kAttr, Literal(350L)),
      LessThanOrEqual(kAttr, Literal(399L))))
    val both = Seq(Or(lo.head, hi.head))
    assert(idx.survivingFileCount(both) ===
      idx.survivingFileCount(lo) + idx.survivingFileCount(hi),
      "Or must keep exactly the union of its sides here (disjoint batches)")
    // a column with no recorded stats never prunes
    val vNoStats = AttributeReference("nostats", LongType)()
    assert(idx.survivingFileCount(Seq(EqualTo(vNoStats, Literal(7L)))) === total)
    // an unsupported expression shape never prunes
    assert(idx.survivingFileCount(Seq(IsNotNull(kAttr))) === total)
    // Or with an unprovable side keeps everything
    assert(idx.survivingFileCount(Seq(Or(lo.head, IsNotNull(kAttr)))) === total)
  }

  test("IS NULL prunes partitions whose recorded null count is zero") {
    val root = tmp("lakenull")
    // batch 0: no nulls in v; batch 1: some nulls
    TxnCatalog.commitPartitions(spark, root, Seq(
      ("t", "b=0", (0 until 50).map(i => (i.toLong, Some(i.toLong)))
        .toDF("k", "v")),
      ("t", "b=1", (50 until 100).map(i => (i.toLong,
        if (i % 5 == 0) None else Some(i.toLong))).toDF("k", "v"))),
      statsColumns = Seq("k", "v"))
    val idx = GraftLake.index(spark, root, "t",
      TxnCatalog.snapshot(spark, root).get)
    val total = idx.totalFileCount
    val vAttr = AttributeReference("v", LongType)()
    val isNull = idx.survivingFileCount(Seq(IsNull(vAttr)))
    assert(isNull < total, "all-non-null partition must prune for IS NULL")
    assert(isNull > 0, "the null-carrying partition must survive")
    // null-safe-equals null is IS NULL
    assert(idx.survivingFileCount(
      Seq(EqualNullSafe(vAttr, Literal(null, LongType)))) === isNull)
    // IS NOT NULL never prunes (a recorded stat implies non-null values)
    assert(idx.survivingFileCount(Seq(IsNotNull(vAttr))) === total)
    // end-to-end: the answer is right AND the scan pruned
    val lake = GraftLake.table(spark, root, "t").get
    assert(lake.where($"v".isNull).count() === 10L)
    assert(lake.where($"v".isNotNull).count() === 90L)
  }

  test("StartsWith prunes by UTF-8 prefix bounds") {
    val root = tmp("lakesw"); rangeLake(root)
    val idx = GraftLake.index(spark, root, "t",
      TxnCatalog.snapshot(spark, root).get)
    val total = idx.totalFileCount
    val b = idx.survivingFileCount(Seq(StartsWith(nameAttr, Literal("bdoc"))))
    assert(b < total, s"prefix probe should prune ($b/$total)")
    val lake = GraftLake.table(spark, root, "t").get
    assert(lake.where($"name".startsWith("bdoc")).count() === 100L)
    // absent prefix prunes everywhere
    assert(idx.survivingFileCount(Seq(StartsWith(nameAttr, Literal("zdoc")))) === 0)
    assert(lake.where($"name".startsWith("zdoc")).count() === 0L)
  }

  test("timestamp range filters prune through kind-t stats") {
    val root = tmp("lakets")
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val df = (0 until 240).map { i =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(i * 3600L)))
    }.toDF("id", "ts")
    // 4 batches of 60 hours each — time-disjoint
    TxnCatalog.commitPartitions(spark, root,
      (0 until 4).map(b => ("ev", s"day=$b",
        df.filter($"id" >= b * 60L && $"id" < (b + 1) * 60L))),
      statsColumns = Seq("ts"))
    val lake = GraftLake.table(spark, root, "ev").get
    val lo = java.sql.Timestamp.from(base.plusSeconds(70 * 3600L))
    val hi = java.sql.Timestamp.from(base.plusSeconds(100 * 3600L))
    val got = lake.where($"ts" >= lo && $"ts" <= hi).select("id")
      .as[Long].collect().sorted
    assert(got === (70L to 100L).toArray)
    val idx = GraftLake.index(spark, root, "ev",
      TxnCatalog.snapshot(spark, root).get)
    val tsA = AttributeReference("ts", TimestampType)()
    def us(t: java.sql.Timestamp) = t.toInstant.getEpochSecond * 1000000L
    val pruned = idx.survivingFileCount(Seq(And(
      GreaterThanOrEqual(tsA, Literal(us(lo), TimestampType)),
      LessThanOrEqual(tsA, Literal(us(hi), TimestampType)))))
    assert(pruned < idx.totalFileCount,
      s"ts probe should prune ($pruned/${idx.totalFileCount})")
  }

  test("frame pins its snapshot: later commits don't shift a built frame") {
    val root = tmp("lakepin"); rangeLake(root)
    val lake = GraftLake.table(spark, root, "t").get
    assert(lake.count() === 400L)
    TxnCatalog.commitPartitions(spark, root,
      Seq(("t", "batch=4",
        Seq((1000L, 0L, "edoc1000")).toDF("k", "v", "name"))),
      statsColumns = Seq("k"))
    assert(lake.count() === 400L, "pinned frame must not see the new batch")
    assert(GraftLake.table(spark, root, "t").get.count() === 401L)
  }

  test("tableAsOf time-travels; registerViews pins one txn for plain SQL") {
    val root = tmp("lakeasof"); rangeLake(root)
    val txn1 = TxnCatalog.currentTxn(spark, root).get
    TxnCatalog.commitPartitions(spark, root,
      Seq(("t", "batch=9",
        Seq((900L, 0L, "xdoc900")).toDF("k", "v", "name"))),
      statsColumns = Seq("k"))
    assert(GraftLake.tableAsOf(spark, root, "t", txn1).get.count() === 400L)
    assert(GraftLake.table(spark, root, "t").get.count() === 401L)
    // views: one consistent txn, SQL sees the lake
    val names = GraftLake.registerViews(spark, root, prefix = "lake_")
    assert(names === Seq("lake_t"))
    assert(spark.sql("SELECT count(*) AS n FROM lake_t WHERE k >= 150 AND k <= 180")
      .collect().head.getLong(0) === 31L)
    // a commit after registration must not shift the registered view
    TxnCatalog.commitPartitions(spark, root,
      Seq(("t", "batch=10",
        Seq((901L, 0L, "xdoc901")).toDF("k", "v", "name"))),
      statsColumns = Seq("k"))
    assert(spark.sql("SELECT count(*) FROM lake_t").collect().head.getLong(0)
      === 401L, "registered views are snapshot-pinned")
  }

  test("listing is lazy: a pruned probe lists only the survivors") {
    val root = tmp("lakelazy"); rangeLake(root)
    val snap = TxnCatalog.snapshot(spark, root).get
    val idx = GraftLake.index(spark, root, "t", snap)
    assert(idx.partitionCount === 4)
    assert(idx.listedPartitionCount === 0,
      "construction must touch the manifest only, never the filesystem")
    // a 1-batch range probe lists exactly that batch's dir
    val n = idx.survivingFileCount(Seq(And(
      GreaterThanOrEqual(kAttr, Literal(150L)),
      LessThanOrEqual(kAttr, Literal(180L)))))
    assert(n >= 1)
    assert(idx.listedPartitionCount === 1,
      "only the surviving partition may be listed")
    // sizeInBytes answers from manifest row counts — still no listing
    val withSchema = new graft.storage.ManifestFileIndex(spark, root, "t",
      snap, dataSchema = Some(GraftLake.table(spark, root, "t").get.schema))
    assert(withSchema.sizeInBytes > 0L)
    assert(withSchema.listedPartitionCount === 0,
      "manifest row counts must answer sizeInBytes with zero IO")
  }

  test("evolved schema: added column surfaces as null on old partitions") {
    val root = tmp("lakeevo")
    TxnCatalog.commitPartitions(spark, root,
      Seq(("t", "b0", Seq((1L, "x")).toDF("k", "name"))),
      statsColumns = Seq("k"))
    TxnCatalog.commitPartitions(spark, root,
      Seq(("t", "b1", Seq((2L, "y", 9.5)).toDF("k", "name", "score"))),
      statsColumns = Seq("k"))
    val lake = GraftLake.table(spark, root, "t").get
    assert(lake.columns.sorted === Array("k", "name", "score"))
    val rows = lake.orderBy("k").select("k", "score")
      .as[(Long, Option[Double])].collect()
    assert(rows === Array((1L, None), (2L, Some(9.5))))
  }

  test("SQL over a registered lake view returns the filtered row set") {
    val root = tmp("lakesql"); rangeLake(root)
    GraftLake.table(spark, root, "t").get.createOrReplaceTempView("lake_t")
    val got = spark.sql(
      "SELECT sum(v) AS sv, count(*) AS n FROM lake_t WHERE k BETWEEN 100 AND 199")
      .as[(Long, Long)].head()
    val exp = (0 until 400).filter(i => i >= 100 && i <= 199)
      .map(i => (i % 40).toLong).sum
    assert(got === ((exp, 100L)))
  }
}
