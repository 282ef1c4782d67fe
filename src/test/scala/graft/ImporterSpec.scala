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

  test("nested non-hive dirs refuse at listing cost") {
    import spark.implicits._
    val root = Files.createTempDirectory("imp5").toFile.getAbsolutePath
    val nested = Files.createTempDirectory("extnest").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$nested/a/b")
    val e2 = intercept[IllegalArgumentException] {
      Importer.addFiles(spark, root, "ev", nested)
    }
    assert(e2.getMessage.contains("nested"))
  }

  /** A hive-laid-out source: Spark's own partitioned writer over
    * (k, v, day[, region]) — files physically lack the partition
    * column(s), exactly the onboarding shape. */
  private def writeHive(s: SparkSession, twoLevel: Boolean = false): String = {
    import s.implicits._
    val dir = Files.createTempDirectory("exthive").toFile.getAbsolutePath
    val df = (0 until 30).map { k =>
      (k.toLong, s"v$k", (k % 3).toLong, if (k % 2 == 0) "east" else "west")
    }.toDF("k", "v", "day", "region")
    if (twoLevel)
      df.write.partitionBy("day", "region").mode("overwrite").parquet(dir)
    else
      df.drop("region").write.partitionBy("day").mode("overwrite").parquet(dir)
    dir
  }

  test("hive import synthesizes typed partition columns on both read stacks") {
    import spark.implicits._
    val root = Files.createTempDirectory("imph1").toFile.getAbsolutePath
    val src = writeHive(spark)
    val (_, n) = Importer.addFiles(spark, root, "ev", src)
    assert(n === 3) // one entry per day= leaf
    val expected = (0 until 30).map(k => (k.toLong, s"v$k", (k % 3).toLong))
    // stack A (direct read): values present, LONG-typed by inference
    val a = TxnCatalog.read(spark, root, "ev").get
    assert(a.schema("day").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(a.select("k", "v", "day").orderBy("k")
      .as[(Long, String, Long)].collect() === expected.toArray)
    // stack B (Catalyst relation): same values, and a partition-filter
    // query PRUNES to the one owning leaf at the manifest index
    val b = graft.storage.GraftLake.table(spark, root, "ev").get
    assert(b.select("k", "v", "day").orderBy("k")
      .as[(Long, String, Long)].collect() === expected.toArray)
    val total = b.inputFiles.length
    val pruned = b.filter($"day" === 1L)
    assert(pruned.collect().length === 10) // executes THIS plan instance
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
    // partition-filter pruning engaged at the manifest index: the scan
    // read only the day=1 leaf's files
    assert(scan.metrics("numFiles").value < total,
      s"scan read ${scan.metrics("numFiles").value} of $total files")
    assert(scan.metrics("numFiles").value ===
      spark.read.parquet(s"$src/day=1").inputFiles.length.toLong)
    // nothing copied: the only thing under the root is the KB-scale
    // properties entry (declared partition columns) — no data dirs
    assert(new java.io.File(s"$root/ev").list().toSeq === Seq("~p"))
  }

  test("two-level hive import: both columns synthesize, string stays string") {
    import spark.implicits._
    val root = Files.createTempDirectory("imph2").toFile.getAbsolutePath
    val src = writeHive(spark, twoLevel = true)
    val (_, n) = Importer.addFiles(spark, root, "ev", src)
    assert(n === 6) // 3 days x 2 regions
    val df = TxnCatalog.read(spark, root, "ev").get
    assert(df.schema("region").dataType ===
      org.apache.spark.sql.types.StringType)
    val got = df.select("k", "day", "region").orderBy("k")
      .as[(Long, Long, String)].collect()
    assert(got === (0 until 30).map(k =>
      (k.toLong, (k % 3).toLong, if (k % 2 == 0) "east" else "west")).toArray)
    // SQL aggregation over the synthesized columns (Catalyst stack)
    val cnt = graft.storage.GraftLake.table(spark, root, "ev").get
      .groupBy("region").count().orderBy("region")
      .as[(String, Long)].collect()
    assert(cnt === Array(("east", 15L), ("west", 15L)))
  }

  test("hive import appends consistently; conflicts refuse") {
    import spark.implicits._
    val root = Files.createTempDirectory("imph3").toFile.getAbsolutePath
    val src = writeHive(spark)
    Importer.addFiles(spark, root, "ev", src)
    // a second import with the same key and long-parsing values lands
    val more = Files.createTempDirectory("exthive2").toFile.getAbsolutePath
    Seq((100L, "x", 7L)).toDF("k", "v", "day")
      .write.partitionBy("day").mode("overwrite").parquet(more)
    Importer.addFiles(spark, root, "ev", more)
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 31L)
    assert(TxnCatalog.read(spark, root, "ev").get
      .filter($"day" === 7L).count() === 1L)
    // same key, now with a NON-long value: declared type never changes
    val bad = Files.createTempDirectory("exthive3").toFile.getAbsolutePath
    Seq((200L, "y", "misc")).toDF("k", "v", "day")
      .write.partitionBy("day").mode("overwrite").parquet(bad)
    val e1 = intercept[IllegalArgumentException] {
      Importer.addFiles(spark, root, "ev", bad)
    }
    assert(e1.getMessage.contains("declared"))
    // a key colliding with an existing DATA column refuses
    val bad2 = Files.createTempDirectory("exthive4").toFile.getAbsolutePath
    Seq((300L, 1L)).toDF("k", "day2")
      .write.partitionBy("k").mode("overwrite").parquet(bad2)
    val e2 = intercept[IllegalArgumentException] {
      Importer.addFiles(spark, root, "ev", bad2)
    }
    assert(e2.getMessage.contains("data column"))
  }

  test("flat rows beside hive imports read NULL partition columns; " +
    "owned compaction materializes them") {
    import spark.implicits._
    val root = Files.createTempDirectory("imph4").toFile.getAbsolutePath
    val src = writeHive(spark)
    Importer.addFiles(spark, root, "ev", src)
    // an OWNED append without the synthesized column: reads NULL
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b=own", Seq((999L, "own")).toDF("k", "v"))),
      statsColumns = Seq("k"))
    val mixed = TxnCatalog.read(spark, root, "ev").get
    assert(mixed.filter($"day".isNull).select("k")
      .as[Long].collect() === Array(999L))
    assert(mixed.count() === 31L)
    // compaction folds everything into owned storage with `day`
    // MATERIALIZED physically — values survive, external dirs survive
    val parts = TxnCatalog.snapshot(spark, root).get.partitions("ev")
    TxnCatalog.compactPartitions(spark, root, "ev", parts, "folded")
    TxnCatalog.vacuum(spark, root, keep = 1)
    val folded = TxnCatalog.read(spark, root, "ev").get
    assert(folded.count() === 31L)
    assert(folded.filter($"day" === 2L).count() === 10L)
    assert(spark.read.parquet(s"$src/day=0").count() === 10L)
  }

  test("hive import refuses a partition key already in the footers " +
    "and ragged layouts") {
    import spark.implicits._
    val root = Files.createTempDirectory("imph5").toFile.getAbsolutePath
    // footer collision: files already CARRY `day`
    val dup = Files.createTempDirectory("exthive5").toFile.getAbsolutePath
    Seq((1L, 5L)).toDF("k", "day").coalesce(1)
      .write.parquet(s"$dup/day=5")
    val e1 = intercept[IllegalArgumentException] {
      Importer.addFiles(spark, root, "ev", dup)
    }
    assert(e1.getMessage.contains("footer column"))
    // ragged: sibling leaves at different depths
    val rag = Files.createTempDirectory("exthive6").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(s"$rag/day=1")
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$rag/day=2/region=east")
    val e2 = intercept[IllegalArgumentException] {
      Importer.addFiles(spark, root, "ev2", rag)
    }
    assert(e2.getMessage.toLowerCase.contains("hive layout") ||
      e2.getMessage.contains("ragged"))
  }

  test("hive values with escaped path characters round-trip exactly") {
    import spark.implicits._
    val root = Files.createTempDirectory("imph7").toFile.getAbsolutePath
    val src = Files.createTempDirectory("exthive7").toFile.getAbsolutePath
    // values Spark's writer must path-escape (space, colon, percent) —
    // the import recovers the ORIGINAL strings, not the dir spellings
    val vals = Seq("new york", "a:b", "50%", "plain")
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("k", "city").write.partitionBy("city")
      .mode("overwrite").parquet(src)
    Importer.addFiles(spark, root, "ev", src)
    val got = TxnCatalog.read(spark, root, "ev").get
      .select("k", "city").orderBy("k").as[(Long, String)].collect()
    assert(got === vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toArray)
    // and the Catalyst stack agrees, including an exact point filter
    val b = graft.storage.GraftLake.table(spark, root, "ev").get
    assert(b.filter($"city" === "new york").select("k")
      .as[Long].collect() === Array(0L))
  }

  test("hive-imported table streams through graft-lake with " +
    "synthesized columns intact") {
    import spark.implicits._
    val root = Files.createTempDirectory("imph6").toFile.getAbsolutePath
    val src = writeHive(spark)
    Importer.addFiles(spark, root, "ev", src)
    val name = "t_hive_stream"
    spark.catalog.dropTempView(name)
    val q = spark.readStream.format("graft-lake")
      .option("root", root).option("table", "ev").load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table(name).select("k", "day").orderBy("k")
        .as[(Long, Long)].collect()
      assert(got === (0 until 30).map(k => (k.toLong, (k % 3).toLong)).toArray)
    } finally q.stop()
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
