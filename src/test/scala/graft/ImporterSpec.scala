package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.storage.{Importer, TxnCatalog}

/** Zero-copy parquet onboarding ([[Importer.addFiles]]): external data
  * becomes manifest entries in one txn with nothing copied, reads and
  * stats treat it like any entry, vacuum never deletes it, and the
  * un-importable layouts refuse at listing cost. */
class ImporterSpec extends GraftSuite {

  private def writeExt(s: SparkSession, n: Int): String = {
    import s.implicits._
    val dir = Files.createTempDirectory("extsrc").toFile.getAbsolutePath
    (0 until n).foreach { i =>
      (i * 10 until (i + 1) * 10).map(k => (k.toLong, s"v$k"))
        .toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/part$i")
    }
    dir
  }

  test("import creates the table by reference: correct rows, " +
    "no bytes under the root") {
    val root = Files.createTempDirectory("imp").toFile.getAbsolutePath
    val src = writeExt(spark, 3)
    val (txn, n) = Importer.addFiles(spark, root, "ev", src)
    assert(n === 3 && txn >= 1L)
    import spark.implicits._
    val got = TxnCatalog.read(spark, root, "ev").get
      .orderBy("k").as[(Long, String)].collect()
    assert(got === (0 until 30).map(k => (k.toLong, s"v$k")).toArray)
    // zero-copy: the table owns NO data directory under the root
    assert(!new java.io.File(s"$root/ev").exists())
  }

  test("import appends to an existing table; incompatible schema refuses") {
    import spark.implicits._
    val root = Files.createTempDirectory("imp2").toFile.getAbsolutePath
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b=0", Seq((100L, "x")).toDF("k", "v"))),
      statsColumns = Seq("k"))
    val src = writeExt(spark, 2)
    val (_, n) = Importer.addFiles(spark, root, "ev", src)
    assert(n === 2)
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 21L)
    // a conflicting column type cannot be imported
    val bad = Files.createTempDirectory("extbad").toFile.getAbsolutePath
    Seq(("a", "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$bad/part0")
    val e = intercept[IllegalArgumentException] {
      Importer.addFiles(spark, root, "ev", bad)
    }
    assert(e.getMessage.contains("incompatible"))
  }

  test("analyze backfills stats on imported entries; pruning engages") {
    val root = Files.createTempDirectory("imp3").toFile.getAbsolutePath
    val src = writeExt(spark, 4)
    Importer.addFiles(spark, root, "ev", src)
    val before = TxnCatalog.snapshot(spark, root).get
    assert(before.partitions("ev")
      .forall(p => before.stats("ev", p).isEmpty))
    val txn = TxnCatalog.analyzeTable(spark, root, "ev", Seq("k"))
    assert(txn.isDefined)
    val after = TxnCatalog.snapshot(spark, root).get
    assert(after.partitions("ev")
      .forall(p => after.stats("ev", p).contains("k")))
    // equality read now prunes to the single owning child
    val df = after.readWhere("ev", "k", 15L, 15L).get
    assert(df.inputFiles.length === 1)
    assert(df.count() === 1L)
  }

  test("vacuum forgets but never deletes external data") {
    val root = Files.createTempDirectory("imp4").toFile.getAbsolutePath
    val src = writeExt(spark, 2)
    Importer.addFiles(spark, root, "ev", src)
    import spark.implicits._
    // overwrite the table so the import txn becomes droppable history
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b=new", Seq((1L, "a")).toDF("k", "v"))),
      drops = TxnCatalog.snapshot(spark, root).get
        .partitions("ev").map(("ev", _)))
    TxnCatalog.vacuum(spark, root, keep = 1)
    // the external source is untouched even though no manifest
    // references it any more
    assert(spark.read.parquet(s"$src/part0").count() === 10L)
    assert(spark.read.parquet(s"$src/part1").count() === 10L)
  }

  test("hive layouts and nested dirs refuse at listing cost") {
    import spark.implicits._
    val root = Files.createTempDirectory("imp5").toFile.getAbsolutePath
    val hive = Files.createTempDirectory("exthive").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$hive/day=2020-01-01")
    val e1 = intercept[IllegalArgumentException] {
      Importer.addFiles(spark, root, "ev", hive)
    }
    assert(e1.getMessage.contains("hive-partitioned"))
    val nested = Files.createTempDirectory("extnest").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$nested/a/b")
    val e2 = intercept[IllegalArgumentException] {
      Importer.addFiles(spark, root, "ev", nested)
    }
    assert(e2.getMessage.contains("nested"))
  }

  test("clone and rename of an imported table keep external dirs intact") {
    val root = Files.createTempDirectory("imp7").toFile.getAbsolutePath
    val src = writeExt(spark, 2)
    Importer.addFiles(spark, root, "ev", src)
    graft.storage.Branch.cloneTable(spark, root, "ev", "ev2")
    assert(TxnCatalog.read(spark, root, "ev2").get.count() === 20L)
    graft.storage.Branch.renameTable(spark, root, "ev2", "ev3")
    assert(TxnCatalog.read(spark, root, "ev3").get.count() === 20L)
    // DV-backed positional DELETE works over external entries too
    TxnCatalog.deletePositions(spark, root, "ev3",
      org.apache.spark.sql.functions.col("k") < 5L)
    assert(TxnCatalog.read(spark, root, "ev3").get.count() === 15L)
    // and the external source is still byte-identical
    assert(spark.read.parquet(s"$src/part0").count() === 10L)
  }

  test("compaction folds imported entries into owned storage") {
    val root = Files.createTempDirectory("imp8").toFile.getAbsolutePath
    val src = writeExt(spark, 3)
    Importer.addFiles(spark, root, "ev", src)
    val parts = TxnCatalog.snapshot(spark, root).get.partitions("ev")
    TxnCatalog.compactPartitions(spark, root, "ev", parts, "folded",
      statsColumns = Seq("k"))
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.partitions("ev") === Seq("folded"))
    import spark.implicits._
    val got = TxnCatalog.read(spark, root, "ev").get
      .orderBy("k").as[(Long, String)].collect()
    assert(got === (0 until 30).map(k => (k.toLong, s"v$k")).toArray)
    // after a hard vacuum the table is fully owned and the external
    // source remains untouched
    TxnCatalog.vacuum(spark, root, keep = 1)
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 30L)
    assert(spark.read.parquet(s"$src/part0").count() === 10L)
  }

  test("CALL system.add_files imports through plain SQL") {
    val root = Files.createTempDirectory("imp6").toFile.getAbsolutePath
    val src = writeExt(spark, 2)
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-import-sql")
      .config("spark.sql.catalog.lake", "graft.storage.GraftCatalog")
      .config("spark.sql.catalog.lake.root", root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s2.sql("CALL lake.system.add_files(table => 'ev', " +
        s"source_path => '$src')").collect().head
      assert(r.getInt(1) === 2)
      assert(s2.sql("SELECT count(*) FROM lake.default.ev")
        .collect().head.getLong(0) === 20L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
