package graft

import java.nio.file.Files

import graft.storage.{Branch, TxnCatalog}

/** [[Branch.rebase]]: three-way merge of a branch onto an advanced
  * main — disjoint partition/property changes merge zero-copy on the
  * shared txn axis; same-partition rivals, same-property rivals, and
  * delete-vs-rewrite hazards refuse with nothing committed. */
class BranchRebaseSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def commitBatch(root: String, table: String, part: String,
      lo: Int, hi: Int): Long =
    TxnCatalog.commitPartitions(spark, root,
      Seq((table, part,
        (lo until hi).map(i => (i.toLong, s"e$i")).toDF("id", "name"))),
      statsColumns = Seq("id"))

  private def ids(root: String, table: String): Seq[Long] =
    TxnCatalog.read(spark, root, table).get
      .select("id").as[Long].collect().sorted.toSeq

  test("disjoint appends rebase; publish then fast-forwards") {
    val root = tmp("rb")
    commitBatch(root, "ev", "b0", 0, 50)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    // main and branch advance with DISJOINT partitions
    commitBatch(root, "ev", "m1", 100, 120)
    TxnCatalog.appendBatch(spark, root, shadow, "w1",
      (200 until 230).map(i => (i.toLong, s"e$i")).toDF("id", "name"))
    // publish refuses (main advanced), rebase merges, publish succeeds
    intercept[IllegalStateException] {
      Branch.publish(spark, root, "ev", "wap")
    }
    Branch.rebase(spark, root, "ev", "wap")
    assert(ids(root, shadow) ===
      ((0L until 50L) ++ (100L until 120L) ++ (200L until 230L)),
      "rebased branch holds both sides' rows")
    assert(ids(root, "ev") === ((0L until 50L) ++ (100L until 120L)),
      "main untouched by the rebase")
    Branch.publish(spark, root, "ev", "wap")
    assert(ids(root, "ev") ===
      ((0L until 50L) ++ (100L until 120L) ++ (200L until 230L)))
    // zero-copy: main's m1 bytes were never duplicated for the branch
    TxnCatalog.vacuum(spark, root, keep = 1)
    assert(ids(root, "ev") ===
      ((0L until 50L) ++ (100L until 120L) ++ (200L until 230L)))
  }

  test("same-partition rival changes refuse, naming the partition") {
    val root = tmp("rbconf")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    commitBatch(root, "ev", "b0", 10, 20) // main rewrites b0
    TxnCatalog.commitPartitions(spark, root, Seq((shadow, "b0",
      (30 until 40).map(i => (i.toLong, s"e$i")).toDF("id", "name"))))
    val e = intercept[IllegalStateException] {
      Branch.rebase(spark, root, "ev", "wap")
    }
    assert(e.getMessage.contains("partition 'b0'"))
    // nothing committed: both sides still read their own states
    assert(ids(root, "ev") === (10L until 20L))
    assert(ids(root, shadow) === (30L until 40L))
  }

  test("identical changes on both sides are not conflicts") {
    val root = tmp("rbsame")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    // main advances; the branch state is IDENTICAL to base for b0 and
    // main's m1 enters cleanly
    commitBatch(root, "ev", "m1", 10, 15)
    Branch.rebase(spark, root, "ev", "wap")
    assert(ids(root, Branch.shadowName("ev", "wap")) === (0L until 15L))
  }

  test("property deltas merge key-wise; same-key rivals refuse") {
    val root = tmp("rbprop")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.setTableProperties(spark, root, "ev", Map("owner" -> "a"))
    TxnCatalog.setTableProperties(spark, root, shadow, Map("note" -> "b"))
    Branch.rebase(spark, root, "ev", "wap")
    val props = TxnCatalog.tableProperties(spark, root, shadow)
    assert(props.get("owner").contains("a") && props.get("note").contains("b"),
      "both sides' property changes survive the merge")
    // rival values for ONE key refuse
    TxnCatalog.setTableProperties(spark, root, "ev", Map("tier" -> "gold"))
    TxnCatalog.setTableProperties(spark, root, shadow, Map("tier" -> "raw"))
    val e = intercept[IllegalStateException] {
      Branch.rebase(spark, root, "ev", "wap")
    }
    assert(e.getMessage.contains("property 'tier'"))
  }

  test("branch delete + main rewrite of pre-fork data refuses") {
    val root = tmp("rbdel1")
    commitBatch(root, "ev", "b0", 0, 10)
    commitBatch(root, "ev", "b1", 10, 20)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.deleteKeys(spark, root, shadow, "id", Seq(3L).toDF("id"))
    commitBatch(root, "ev", "b1", 50, 60) // main rewrites pre-fork b1
    val e = intercept[IllegalStateException] {
      Branch.rebase(spark, root, "ev", "wap")
    }
    assert(e.getMessage.contains("merge-on-read deletes"))
  }

  test("main DV delete + branch rewrite of pre-fork data refuses") {
    val root = tmp("rbdel2")
    commitBatch(root, "ev", "b0", 0, 10)
    commitBatch(root, "ev", "b1", 10, 20)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.deletePositions(spark, root, "ev",
      org.apache.spark.sql.functions.col("id") === 12L)
    TxnCatalog.commitPartitions(spark, root, Seq((shadow, "b0",
      (30 until 35).map(i => (i.toLong, s"e$i")).toDF("id", "name"))))
    val e = intercept[IllegalStateException] {
      Branch.rebase(spark, root, "ev", "wap")
    }
    assert(e.getMessage.contains("merge-on-read deletes"))
  }

  test("branch delete + main pure append: txn-ordered replay semantics") {
    val root = tmp("rbdel3")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    // main appends FIRST (earlier txn), then the branch deletes a key
    // present in BOTH the base and main's append
    commitBatch(root, "ev", "m1", 5, 15) // ids 5..14, overlaps base 5..9
    TxnCatalog.deleteKeys(spark, root, shadow, "id", Seq(7L).toDF("id"))
    Branch.rebase(spark, root, "ev", "wap")
    // the delete (later txn) masks BOTH instances of id=7 — base's and
    // main's appended one — the same answer replaying the DELETE on the
    // merged state would give
    assert(ids(root, shadow) ===
      ((0L until 10L) ++ (5L until 15L)).filterNot(_ == 7L).sorted)
    // main is untouched until publish
    assert(ids(root, "ev") === ((0L until 10L) ++ (5L until 15L)).sorted)
  }

  test("main delete + branch pure append: branch rows stay unmasked") {
    val root = tmp("rbdel4")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.deleteKeys(spark, root, "ev", "id", Seq(4L).toDF("id"))
    // branch appends AFTER main's delete committed — including a new
    // row with the deleted key (re-insert after delete)
    TxnCatalog.appendBatch(spark, root, shadow, "w1",
      Seq((4L, "again"), (20L, "e20")).toDF("id", "name"))
    Branch.rebase(spark, root, "ev", "wap")
    // base's id=4 is masked (delete txn > its dataTxn); the branch's
    // re-insert survives (committed after the delete)
    assert(ids(root, shadow) ===
      ((0L until 10L).filterNot(_ == 4L) ++ Seq(4L, 20L)).sorted)
  }

  test("no-op when main has not advanced; cumulative second rebase") {
    val root = tmp("rbnoop")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    val before = TxnCatalog.currentTxn(spark, root).get
    assert(Branch.rebase(spark, root, "ev", "wap") === before)
    assert(TxnCatalog.currentTxn(spark, root).get === before, "no commit")
    // first divergence + rebase
    commitBatch(root, "ev", "m1", 10, 15)
    TxnCatalog.appendBatch(spark, root, shadow, "w1",
      Seq((20L, "e20")).toDF("id", "name"))
    Branch.rebase(spark, root, "ev", "wap")
    // main advances AGAIN; a second rebase must keep the branch's
    // cumulative changes (w1) while taking m2
    commitBatch(root, "ev", "m2", 30, 35)
    Branch.rebase(spark, root, "ev", "wap")
    assert(ids(root, shadow) ===
      ((0L until 15L) ++ Seq(20L) ++ (30L until 35L)).sorted)
    Branch.publish(spark, root, "ev", "wap")
    assert(ids(root, "ev") ===
      ((0L until 15L) ++ Seq(20L) ++ (30L until 35L)).sorted)
  }

  test("main drop of a non-branch-touched partition carries into rebase") {
    val root = tmp("rbdrop")
    commitBatch(root, "ev", "b0", 0, 10)
    commitBatch(root, "ev", "b1", 10, 20)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.commitPartitions(spark, root, Nil, drops = Seq(("ev", "b1")))
    TxnCatalog.appendBatch(spark, root, shadow, "w1",
      Seq((50L, "e50")).toDF("id", "name"))
    Branch.rebase(spark, root, "ev", "wap")
    assert(ids(root, shadow) === ((0L until 10L) ++ Seq(50L)).sorted,
      "main's drop applies; branch append survives")
  }

  test("absorbing a main RESTORE stamps a restore marker on the branch") {
    val root = tmp("rbrestore")
    commitBatch(root, "ev", "b0", 0, 50)          // txn 1: b0 @ dataTxn 1
    commitBatch(root, "ev", "b0", 0, 30)          // txn 2: b0 REWRITTEN
    Branch.create(spark, root, "ev", "wap")        // fork base = 2
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.appendBatch(spark, root, shadow, "w1",
      Seq((200L, "e200")).toDF("id", "name"))
    // main reverts b0 to the PRE-FORK layout: original dataTxn 1 ≤ base
    // — invisible to the incremental rules, exactly what the marker
    // exists to fail-fast on
    TxnCatalog.restoreTable(spark, root, "ev", 1L)
    val rebasedAt = Branch.rebase(spark, root, "ev", "wap")
    assert(ids(root, shadow) === ((0L until 50L) ++ Seq(200L)).sorted,
      "the reverted pre-fork content is absorbed; branch append survives")
    val marker = TxnCatalog.tableProperties(spark, root, shadow)
      .get(TxnCatalog.RestoreTxnProp)
    assert(marker.exists(_.split(':').head.toLong == rebasedAt),
      s"branch marker stamped AT the rebase txn (got $marker), so a " +
        "lagging branch stream fails fast instead of silently missing " +
        "the reversion")
  }

  test("the branch's own restore marker survives a plain rebase") {
    val root = tmp("rbownmarker")
    commitBatch(root, "ev", "b0", 0, 10)
    val forkTxn = Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.appendBatch(spark, root, shadow, "w1",
      Seq((50L, "e50")).toDF("id", "name"))
    TxnCatalog.restoreTable(spark, root, shadow, forkTxn)
    val own = TxnCatalog.tableProperties(spark, root, shadow)
      .get(TxnCatalog.RestoreTxnProp)
    assert(own.nonEmpty, "branch-side restore stamped its marker")
    commitBatch(root, "ev", "m1", 100, 110)       // main pure append
    Branch.rebase(spark, root, "ev", "wap")
    assert(TxnCatalog.tableProperties(spark, root, shadow)
      .get(TxnCatalog.RestoreTxnProp) === own,
      "a pure-append rebase keeps the shadow's own marker verbatim")
  }

  test("absorbing a main compaction does NOT stamp a marker") {
    val root = tmp("rbcompact")
    commitBatch(root, "ev", "b0", 0, 10)
    commitBatch(root, "ev", "b1", 10, 20)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.appendBatch(spark, root, shadow, "w1",
      Seq((50L, "e50")).toDF("id", "name"))
    // a main compaction also replaces pre-fork entries with carried
    // (pre-fork) dataTxns — but it is content-identical and main
    // carries no restore marker, so the branch must not fail streams
    TxnCatalog.compactPartitions(spark, root, "ev", Seq("b0", "b1"), "c")
    Branch.rebase(spark, root, "ev", "wap")
    assert(ids(root, shadow) === ((0L until 20L) ++ Seq(50L)).sorted)
    assert(!TxnCatalog.tableProperties(spark, root, shadow)
      .contains(TxnCatalog.RestoreTxnProp),
      "no marker for a content-identical reorganization")
  }

  test("SQL: CALL rebase_branch merges, then publish fast-forwards") {
    val root = tmp("rbsql")
    commitBatch(root, "ev", "b0", 0, 10)
    val cat = s"rbc${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CALL $cat.system.branch(table => 'ev', name => 'wap')")
    val shadow = Branch.shadowName("ev", "wap")
    commitBatch(root, "ev", "m1", 10, 15)
    TxnCatalog.appendBatch(spark, root, shadow, "w1",
      Seq((20L, "e20")).toDF("id", "name"))
    val txn = spark.sql(
      s"CALL $cat.system.rebase_branch(table => 'ev', name => 'wap')")
      .collect().head.getLong(0)
    assert(txn === TxnCatalog.currentTxn(spark, root).get)
    spark.sql(
      s"CALL $cat.system.publish_branch(table => 'ev', name => 'wap')")
    assert(ids(root, "ev") === ((0L until 15L) ++ Seq(20L)).sorted)
  }
}
