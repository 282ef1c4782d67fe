package graft

import java.nio.file.Files

import graft.storage.{Branch, TxnCatalog}

/** Catalog branches ([[Branch.createAll]]/[[Branch.publishAll]]/
  * [[Branch.rebaseAll]]/[[Branch.dropAll]]): one branch name spanning
  * every table, with fork/publish/rebase/drop each a SINGLE manifest
  * commit — cross-table atomicity per-table WAP cannot express. */
class CatalogBranchSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def commitBatch(root: String, table: String, part: String,
      lo: Int, hi: Int): Long =
    TxnCatalog.commitPartitions(spark, root,
      Seq((table, part,
        (lo until hi).map(i => (i.toLong, s"$table$i")).toDF("id", "name"))))

  private def ids(root: String, table: String): Seq[Long] =
    TxnCatalog.read(spark, root, table).get
      .select("id").as[Long].collect().sorted.toSeq

  private def twoTableLake(): String = {
    val root = tmp("cbr")
    commitBatch(root, "docs", "b0", 0, 20)
    commitBatch(root, "embs", "b0", 0, 10)
    root
  }

  test("createAll forks every table in ONE commit, zero-copy") {
    val root = twoTableLake()
    val before = TxnCatalog.currentTxn(spark, root).get
    val txn = Branch.createAll(spark, root, "wap")
    assert(txn === before + 1, "one commit forks the whole catalog")
    assert(Branch.catalogTables(spark, root, "wap") === Seq("docs", "embs"))
    assert(ids(root, Branch.shadowName("docs", "wap")) === (0L until 20L))
    assert(ids(root, Branch.shadowName("embs", "wap")) === (0L until 10L))
  }

  test("publishAll moves every table in ONE atomic commit") {
    val root = twoTableLake()
    Branch.createAll(spark, root, "wap")
    TxnCatalog.appendBatch(spark, root, Branch.shadowName("docs", "wap"),
      "w", Seq((100L, "d100")).toDF("id", "name"))
    TxnCatalog.appendBatch(spark, root, Branch.shadowName("embs", "wap"),
      "w", Seq((200L, "e200")).toDF("id", "name"))
    val before = TxnCatalog.currentTxn(spark, root).get
    val txn = Branch.publishAll(spark, root, "wap")
    assert(txn === before + 1, "one commit publishes every table")
    assert(ids(root, "docs") === ((0L until 20L) :+ 100L))
    assert(ids(root, "embs") === ((0L until 10L) :+ 200L))
    // a reader pinned BEFORE the publish sees NEITHER table's new rows
    // (snapshot consistency across tables — the whole point)
    val pinned = TxnCatalog.snapshotAt(spark, root, before)
    assert(pinned.read("docs").get.count() === 20L)
    assert(pinned.read("embs").get.count() === 10L)
  }

  test("publishAll refreshes MVs over published sources in the SAME commit") {
    val root = twoTableLake()
    // an MV over docs: count + max per constant group
    graft.storage.MaterializedAgg.create(spark, root, "docs_mv", "docs",
      groupCols = Seq("name"), aggs = Seq(
        graft.storage.MaterializedAgg.AggSpec("count"),
        graft.storage.MaterializedAgg.AggSpec("max", "id")))
    def mvTotal(): Long = TxnCatalog.read(spark, root, "docs_mv").get
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect()
      .head.getLong(0)
    assert(mvTotal() === 20L)
    // branch, stage new docs rows, publish — ONE commit
    Branch.createAll(spark, root, "wap")
    TxnCatalog.appendBatch(spark, root, Branch.shadowName("docs", "wap"),
      "w", Seq((100L, "d100"), (101L, "d101")).toDF("id", "name"))
    val before = TxnCatalog.currentTxn(spark, root).get
    val txn = Branch.publishAll(spark, root, "wap")
    assert(txn === before + 1,
      "MV refresh must ride the publish commit, never a second txn")
    // the MV reflects the published data immediately — a dashboard
    // read straight after cutover never serves pre-publish aggregates
    assert(mvTotal() === 22L, "post-publish MV read must be current")
    assert(TxnCatalog.read(spark, root, "docs_mv").get
      .filter($"name" === "d101").select("max_id").as[Long]
      .collect().toSeq === Seq(101L))
    // the watermark covers the publish txn: the next refresh is a noop
    val r = graft.storage.MaterializedAgg.refresh(spark, root, "docs_mv")
    assert(r.mode === "noop", s"watermark must cover the publish: $r")
    // a reader pinned BEFORE the publish still sees the old MV rows
    assert(TxnCatalog.snapshotAt(spark, root, before).read("docs_mv").get
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect()
      .head.getLong(0) === 20L)
  }

  test("one advanced table refuses the WHOLE publish; rebaseAll heals") {
    val root = twoTableLake()
    Branch.createAll(spark, root, "wap")
    TxnCatalog.appendBatch(spark, root, Branch.shadowName("docs", "wap"),
      "w", Seq((100L, "d100")).toDF("id", "name"))
    // main advances on embs only
    commitBatch(root, "embs", "m1", 50, 55)
    val e = intercept[IllegalStateException] {
      Branch.publishAll(spark, root, "wap")
    }
    assert(e.getMessage.contains("embs"))
    assert(ids(root, "docs") === (0L until 20L),
      "docs untouched — nothing half-published")
    // rebaseAll is ONE commit and heals only the advanced member
    val before = TxnCatalog.currentTxn(spark, root).get
    assert(Branch.rebaseAll(spark, root, "wap") === before + 1)
    assert(ids(root, Branch.shadowName("embs", "wap")) ===
      ((0L until 10L) ++ (50L until 55L)))
    Branch.publishAll(spark, root, "wap")
    assert(ids(root, "docs") === ((0L until 20L) :+ 100L))
    assert(ids(root, "embs") === ((0L until 10L) ++ (50L until 55L)))
  }

  test("one table's rebase conflict refuses the whole rebaseAll") {
    val root = twoTableLake()
    Branch.createAll(spark, root, "wap")
    // docs: disjoint changes (fine); embs: SAME partition on both sides
    TxnCatalog.appendBatch(spark, root, Branch.shadowName("docs", "wap"),
      "w", Seq((100L, "d100")).toDF("id", "name"))
    commitBatch(root, "embs", "b0", 30, 35)
    TxnCatalog.commitPartitions(spark, root,
      Seq((Branch.shadowName("embs", "wap"), "b0",
        Seq((60L, "e60")).toDF("id", "name"))))
    val snap = TxnCatalog.currentTxn(spark, root).get
    val e = intercept[IllegalStateException] {
      Branch.rebaseAll(spark, root, "wap")
    }
    assert(e.getMessage.contains("partition 'b0'"))
    assert(TxnCatalog.currentTxn(spark, root).get === snap,
      "nothing committed — docs' clean rebase did not land alone")
  }

  test("explicit table list; dropAll removes everything in one commit") {
    val root = twoTableLake()
    Branch.createAll(spark, root, "wap", tables = Seq("docs"))
    assert(Branch.catalogTables(spark, root, "wap") === Seq("docs"))
    val before = TxnCatalog.currentTxn(spark, root).get
    assert(Branch.dropAll(spark, root, "wap") === before + 1)
    assert(Branch.catalogTables(spark, root, "wap").isEmpty)
    assert(ids(root, "docs") === (0L until 20L), "main untouched")
  }

  test("SQL: CALL catalog-branch procedures round trip") {
    val root = twoTableLake()
    val cat = s"cbr${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val forked = spark.sql(
      s"CALL $cat.system.branch_catalog(name => 'wap')")
      .collect().head.getString(0)
    assert(forked === "docs,embs")
    TxnCatalog.appendBatch(spark, root, Branch.shadowName("docs", "wap"),
      "w", Seq((100L, "d100")).toDF("id", "name"))
    commitBatch(root, "embs", "m1", 50, 52)
    spark.sql(s"CALL $cat.system.rebase_catalog(name => 'wap')")
    spark.sql(s"CALL $cat.system.publish_catalog(name => 'wap')")
    assert(ids(root, "docs") === ((0L until 20L) :+ 100L))
    assert(ids(root, "embs") === ((0L until 10L) ++ (50L until 52L)))
    spark.sql(s"CALL $cat.system.drop_catalog_branch(name => 'wap')")
    assert(Branch.catalogTables(spark, root, "wap").isEmpty)
  }
}
