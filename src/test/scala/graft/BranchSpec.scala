package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.storage.{Branch, TxnCatalog}

/** [[Branch]]: zero-copy table branches and the write-audit-publish
  * workflow — fork is one manifest commit, the branch is a full table
  * (writes, deletes, constraints, OPTIMIZE all work), publish
  * fast-forwards main zero-copy with append-shaped stream semantics,
  * and vacuum's path-based liveness keeps shared bytes alive. */
class BranchSpec extends GraftSuite {
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

  test("create forks zero-copy; branch reads equal main; main isolated") {
    val root = tmp("br")
    commitBatch(root, "ev", "b0", 0, 50)
    commitBatch(root, "ev", "b1", 50, 100)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    assert(ids(root, shadow) === (0L until 100L), "fork replicates content")
    assert(Branch.branches(spark, root, "ev") === Seq("wap"))
    // no DATA directory was created for the fork (zero-copy refs; the
    // only staged bytes are the KB-scale `~p` properties entry)
    val shadowDir = new java.io.File(root, shadow)
    def dataDirs(f: java.io.File): Seq[String] =
      Option(f.listFiles()).toSeq.flatten.filter(_.isDirectory)
        .filterNot(_.getName.startsWith("~"))
        .flatMap(d => Option(d.listFiles()).toSeq.flatten)
        .map(_.getName).filter(_.startsWith("v="))
    assert(!shadowDir.exists() || dataDirs(shadowDir).isEmpty,
      "fork stages no data files")
    // branch writes are invisible to main until publish
    TxnCatalog.appendBatch(spark, root, shadow, "b2",
      (100 until 120).map(i => (i.toLong, s"e$i")).toDF("id", "name"))
    assert(ids(root, shadow) === (0L until 120L))
    assert(ids(root, "ev") === (0L until 100L), "main unchanged pre-publish")
  }

  test("append-shaped publish fast-forwards main; diff churn is zero") {
    val root = tmp("brpub")
    commitBatch(root, "ev", "b0", 0, 50)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.appendBatch(spark, root, shadow, "b1",
      (50 until 80).map(i => (i.toLong, s"e$i")).toDF("id", "name"))
    val before = TxnCatalog.currentTxn(spark, root).get
    val pt = Branch.publish(spark, root, "ev", "wap")
    assert(ids(root, "ev") === (0L until 80L), "main sees branch data")
    // append-shaped: the untouched partition's entry is VERBATIM main's
    // (no "updated" churn), only the new partition is "added"
    val changes = TxnCatalog.diff(spark, root, before, pt)
      .filter(_.table == "ev")
    assert(changes.map(c => (c.partition, c.change)).toSet ===
      Set(("batch=b1", "added")))
    // and incremental consumers see exactly the appended rows at the
    // PUBLISH txn (not the branch-side write txn)
    val delta = TxnCatalog.diffData(spark, root, before, pt)
      .filter(_.table == "ev")
    assert(delta.map(_.partition) === Seq("batch=b1"))
    // no restore marker: this publish is append-shaped
    assert(!TxnCatalog.tableProperties(spark, root, "ev")
      .contains(TxnCatalog.RestoreTxnProp))
    assert(TxnCatalog.tableProperties(spark, root, "ev")
      .get(Branch.BranchPublishedProp).contains(s"$pt:wap"))
  }

  test("rewrite-shaped publish stamps the restore marker; MoR order holds") {
    val root = tmp("brmor")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.deleteKeys(spark, root, shadow, "id", Seq(3L, 7L).toDF("id"))
    TxnCatalog.appendBatch(spark, root, shadow, "b1",
      Seq((7L, "e7")).toDF("id", "name")) // re-insert AFTER the delete
    assert(ids(root, shadow) === Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L, 8L, 9L))
    val pt = Branch.publish(spark, root, "ev", "wap")
    assert(ids(root, "ev") === Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L, 8L, 9L),
      "published delete masks only data that predates it")
    assert(TxnCatalog.tableProperties(spark, root, "ev")
      .get(TxnCatalog.RestoreTxnProp).contains(s"$pt:wap"),
      "a delete-carrying publish is not an append: streams must restart")
  }

  test("per-table publish refreshes dependent MVs in the same commit") {
    val root = tmp("brmv")
    commitBatch(root, "ev", "b0", 0, 30)
    graft.storage.MaterializedAgg.create(spark, root, "ev_mv", "ev",
      groupCols = Seq("name"), aggs = Seq(
        graft.storage.MaterializedAgg.AggSpec("count")))
    def mvTotal(): Long = TxnCatalog.read(spark, root, "ev_mv").get
      .agg(sum("cnt")).collect().head.getLong(0)
    assert(mvTotal() === 30L)
    Branch.create(spark, root, "ev", "wap")
    TxnCatalog.appendBatch(spark, root, Branch.shadowName("ev", "wap"),
      "b1", Seq((100L, "x")).toDF("id", "name"))
    val before = TxnCatalog.currentTxn(spark, root).get
    assert(Branch.publish(spark, root, "ev", "wap") === before + 1,
      "MV refresh rides the publish commit")
    assert(mvTotal() === 31L, "post-publish MV read must be current")
    assert(graft.storage.MaterializedAgg
      .refresh(spark, root, "ev_mv").mode === "noop")
  }

  test("publish refuses when main advanced since the fork; force wins") {
    val root = tmp("brff")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.appendBatch(spark, root, shadow, "b1",
      Seq((10L, "e10")).toDF("id", "name"))
    // rival commit straight to main after the fork
    commitBatch(root, "ev", "bx", 90, 95)
    val ex = intercept[IllegalStateException] {
      Branch.publish(spark, root, "ev", "wap")
    }
    assert(ex.getMessage.contains("advanced since branch"))
    assert(ids(root, "ev") === ((0L until 10L) ++ (90L until 95L)),
      "refused publish commits nothing")
    Branch.publish(spark, root, "ev", "wap", force = true)
    assert(ids(root, "ev") === (0L until 11L),
      "forced publish overwrites main with the branch state")
  }

  test("audit→publish cycles repeat: base rebases to the publish txn") {
    val root = tmp("brcyc")
    commitBatch(root, "ev", "b0", 0, 10)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.appendBatch(spark, root, shadow, "b1",
      Seq((10L, "e10")).toDF("id", "name"))
    Branch.publish(spark, root, "ev", "wap")
    TxnCatalog.appendBatch(spark, root, shadow, "b2",
      Seq((11L, "e11")).toDF("id", "name"))
    val pt2 = Branch.publish(spark, root, "ev", "wap")
    assert(ids(root, "ev") === (0L until 12L))
    assert(!TxnCatalog.tableProperties(spark, root, "ev")
      .contains(TxnCatalog.RestoreTxnProp),
      "second append-shaped publish is still append-shaped")
    assert(TxnCatalog.tableProperties(spark, root, shadow)
      .get(Branch.BranchBaseProp).contains(pt2.toString))
  }

  test("CHECK constraints copy at fork: branch writes validate from birth") {
    val root = tmp("brcon")
    commitBatch(root, "ev", "b0", 0, 10)
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.ConstraintPrefix + "pos" -> "id >= 0"))
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    val ex = intercept[IllegalArgumentException] {
      TxnCatalog.appendBatch(spark, root, shadow, "bad",
        Seq((-1L, "boom")).toDF("id", "name"))
    }
    assert(ex.getMessage.contains("violates"))
    assert(ids(root, shadow) === (0L until 10L), "nothing landed")
  }

  test("vacuum keeps shared bytes alive across fork, publish, and drop") {
    val root = tmp("brvac")
    commitBatch(root, "ev", "b0", 0, 50)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.appendBatch(spark, root, shadow, "b1",
      (50 until 60).map(i => (i.toLong, s"e$i")).toDF("id", "name"))
    Branch.publish(spark, root, "ev", "wap")
    // hard vacuum: only the current txn's manifest survives — main's
    // entries now REFERENCE b0 (its own) and the branch's staged b1
    TxnCatalog.vacuum(spark, root, keep = 1)
    assert(ids(root, "ev") === (0L until 60L),
      "published refs survive a hard vacuum (path-based liveness)")
    assert(ids(root, shadow) === (0L until 60L))
    // dropping the branch must NOT reclaim bytes main still references
    Branch.drop(spark, root, "ev", "wap")
    TxnCatalog.vacuum(spark, root, keep = 1)
    assert(ids(root, "ev") === (0L until 60L),
      "main keeps reading data staged on the dropped branch")
    assert(Branch.branches(spark, root, "ev").isEmpty)
  }

  test("SQL: CALL branch procedures; VERSION AS OF resolves branch names") {
    val root = tmp("brsql")
    commitBatch(root, "ev", "b0", 0, 10)
    val cat = s"brc${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val forked = spark.sql(
      s"CALL $cat.system.branch(table => 'ev', name => 'wap')")
      .collect().head.getString(0)
    assert(forked === Branch.shadowName("ev", "wap"))
    TxnCatalog.appendBatch(spark, root, forked, "b1",
      Seq((10L, "e10")).toDF("id", "name"))
    // VERSION AS OF 'wap' reads the branch; the plain read stays main
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.ev " +
      "VERSION AS OF 'wap'").collect().head.getLong(0) === 11L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.ev")
      .collect().head.getLong(0) === 10L)
    val pub = spark.sql(
      s"CALL $cat.system.publish_branch(table => 'ev', name => 'wap')")
      .collect().head
    assert(pub.getBoolean(1), "append-shaped publish")
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.ev")
      .collect().head.getLong(0) === 11L)
    // the refs metadata table lists tags and branches with their base
    spark.sql(s"CALL $cat.system.tag(name => 'stable')")
    val refs = spark.sql(s"SELECT name, type, txn FROM $cat.default.ev.refs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs === Set(("stable", "tag"), ("wap", "branch")))
    spark.sql(s"CALL $cat.system.drop_branch(table => 'ev', name => 'wap')")
    assert(Branch.branches(spark, root, "ev").isEmpty)
  }

  test("shallow clone replicates zero-copy and diverges independently") {
    val root = tmp("brclone")
    commitBatch(root, "ev", "b0", 0, 50)
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.ConstraintPrefix + "pos" -> "id >= 0"))
    Branch.cloneTable(spark, root, "ev", "ev2")
    assert(ids(root, "ev2") === (0L until 50L), "clone replicates content")
    // constraints copied: the clone validates from birth
    intercept[IllegalArgumentException] {
      TxnCatalog.appendBatch(spark, root, "ev2", "bad",
        Seq((-1L, "boom")).toDF("id", "name"))
    }
    // divergence: writes to either side never affect the other
    TxnCatalog.appendBatch(spark, root, "ev2", "b1",
      Seq((50L, "e50")).toDF("id", "name"))
    commitBatch(root, "ev", "bx", 100, 105)
    assert(ids(root, "ev2") === (0L until 51L))
    assert(ids(root, "ev") === ((0L until 50L) ++ (100L until 105L)))
    // hard vacuum: the shared b0 bytes survive via path-based liveness
    TxnCatalog.vacuum(spark, root, keep = 1)
    assert(ids(root, "ev2") === (0L until 51L))
    // dropping the source keeps the clone readable
    TxnCatalog.dropTable(spark, root, "ev")
    TxnCatalog.vacuum(spark, root, keep = 1)
    assert(ids(root, "ev2") === (0L until 51L),
      "clone survives source drop + vacuum")
    assert(TxnCatalog.tableProperties(spark, root, "ev2")
      .get(Branch.CloneOfProp).contains("ev"))
  }

  test("branch OPTIMIZE localizes refs; publish of the fold is a rewrite") {
    val root = tmp("bropt")
    commitBatch(root, "ev", "b0", 0, 20)
    commitBatch(root, "ev", "b1", 20, 40)
    Branch.create(spark, root, "ev", "wap")
    val shadow = Branch.shadowName("ev", "wap")
    TxnCatalog.compactPartitions(spark, root, shadow,
      Seq("b0", "b1"), "c0")
    assert(ids(root, shadow) === (0L until 40L))
    assert(ids(root, "ev") === (0L until 40L), "main untouched by branch fold")
    val pt = Branch.publish(spark, root, "ev", "wap")
    assert(ids(root, "ev") === (0L until 40L))
    // the fold dropped main's pre-fork partitions from the branch, so
    // the publish is rewrite-shaped and says so
    assert(TxnCatalog.tableProperties(spark, root, "ev")
      .get(TxnCatalog.RestoreTxnProp).contains(s"$pt:wap"))
  }
}
