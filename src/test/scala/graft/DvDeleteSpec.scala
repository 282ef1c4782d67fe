package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.TxnCatalog

/** [[TxnCatalog.deletePositions]]: positional merge-on-read deletes
  * (deletion vectors) — arbitrary-predicate DELETE with no data rewrite,
  * stale-vector no-op after reorganizations, full-payload CDC events,
  * and the SQL `DELETE FROM` fallback for non-key shapes. */
class DvDeleteSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  /** 3 batches of (k, grp, name); k 0..299, grp = k % 3. */
  private def lake(root: String): Unit =
    TxnCatalog.commitPartitions(spark, root,
      (0 until 3).map(b => ("t", s"batch=$b",
        (b * 100 until (b + 1) * 100)
          .map(i => (i.toLong, s"g${i % 3}", s"r$i")).toDF("k", "grp", "name"))),
      statsColumns = Seq("k"))

  private def dirOf(root: String, part: String): String =
    new java.io.File(s"$root/t/$part").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.mkString(",")

  test("arbitrary multi-column OR predicate deletes merge-on-read") {
    val root = tmp("dv"); lake(root)
    val before = (0 until 3).map(b => dirOf(root, s"batch=$b"))
    val cond = ($"k" > 250L && $"grp" === "g0") || $"name" === "r7"
    TxnCatalog.deletePositions(spark, root, "t", cond)
    val got = TxnCatalog.read(spark, root, "t").get
      .select("k").as[Long].collect().sorted
    val want = (0L until 300L)
      .filterNot(k => (k > 250 && k % 3 == 0) || k == 7L).toArray
    assert(got === want)
    // merge-on-read: no data partition was rewritten
    assert((0 until 3).map(b => dirOf(root, s"batch=$b")) === before)
    // the vector rides a `~v-*` delete entry with the positional marker
    val dels = TxnCatalog.snapshot(spark, root).get.deleteEntries("t")
    assert(dels.map(_._3) === Seq(TxnCatalog.DeletePosMarker))
    assert(dels.head._1.startsWith("~v-"))
    // a row the predicate nulls out of survives (SQL DELETE semantics):
    // nothing matched NULL grp, nothing deleted twice on a re-run
    val again = TxnCatalog.deletePositions(spark, root, "t", cond)
    assert(TxnCatalog.snapshot(spark, root).get.txn === again,
      "re-running the same predicate marks nothing (already masked)")
    assert(TxnCatalog.snapshot(spark, root).get.deleteEntries("t").size === 1)
  }

  test("a DV applies only to data that predates it") {
    val root = tmp("dvage"); lake(root)
    TxnCatalog.deletePositions(spark, root, "t", $"k" === 42L)
    // re-insert k=42 AFTER the delete: the new row must survive
    TxnCatalog.commitPartitions(spark, root, Seq(("t", "batch=re",
      Seq((42L, "g0", "fresh")).toDF("k", "grp", "name"))))
    val got = TxnCatalog.read(spark, root, "t").get
      .filter($"k" === 42L).select("name").as[String].collect()
    assert(got === Array("fresh"))
  }

  test("compaction physically applies the DV; the stale vector no-ops") {
    val root = tmp("dvcomp"); lake(root)
    TxnCatalog.deletePositions(spark, root, "t", $"grp" === "g1")
    TxnCatalog.compactPartitions(spark, root, "t",
      (0 until 3).map(b => s"batch=$b"), into = "c")
    // the vector still exists but its (file, pos) refer to dead files
    assert(TxnCatalog.snapshot(spark, root).get.deleteEntries("t").size === 1)
    val got = TxnCatalog.read(spark, root, "t").get
      .select("k").as[Long].collect().sorted
    assert(got === (0L until 300L).filterNot(_ % 3 == 1).toArray)
    // applyDeletes purges the vector; nothing changes for readers
    TxnCatalog.applyDeletes(spark, root, "t")
    assert(TxnCatalog.snapshot(spark, root).get.deleteEntries("t").isEmpty)
    assert(TxnCatalog.read(spark, root, "t").get.count() === 200L)
  }

  test("metadata answers go dark while a DV is pending, return after applyDeletes") {
    val root = tmp("dvmeta"); lake(root)
    assert(TxnCatalog.snapshot(spark, root).get.rowCount("t") === Some(300L))
    TxnCatalog.deletePositions(spark, root, "t", $"k" >= 100L && $"grp" === "g2")
    assert(TxnCatalog.snapshot(spark, root).get.rowCount("t") === None,
      "a pending DV makes metadata-only counts unknowable")
    TxnCatalog.applyDeletes(spark, root, "t")
    val snap = TxnCatalog.snapshot(spark, root).get
    assert(snap.rowCount("t") ===
      Some(TxnCatalog.read(spark, root, "t").get.count()))
  }

  test("changeFeed emits FULL-payload delete events for DV deletes") {
    val root = tmp("dvcdc"); lake(root)
    TxnCatalog.deletePositions(spark, root, "t", $"k".isin(5L, 105L))
    val feed = TxnCatalog.changeFeed(spark, root, "t", 1, 2).get
    val dels = feed.filter($"_change_type" === "delete")
      .select("k", "grp", "name").collect()
    assert(dels.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet === Set((5L, "g2", "r5"), (105L, "g0", "r105")),
      "DV delete events carry the deleted rows' full payload")
  }

  test("updatePositions swaps matched rows atomically, no partition rewrite") {
    val root = tmp("dvup"); lake(root)
    val before = (0 until 3).map(b => dirOf(root, s"batch=$b"))
    val t0 = TxnCatalog.currentTxn(spark, root).get
    TxnCatalog.updatePositions(spark, root, "t",
      ($"grp" === "g1" && $"k" < 150L) || $"k" === 299L,
      Seq("name" -> "concat(name, '!')", "grp" -> "'gx'"))
    // ONE txn for the vector + the appended batch
    assert(TxnCatalog.currentTxn(spark, root).get === t0 + 1)
    // merge-on-read: original data partitions untouched
    assert((0 until 3).map(b => dirOf(root, s"batch=$b")) === before)
    val got = TxnCatalog.read(spark, root, "t").get
    assert(got.count() === 300L, "UPDATE must not change cardinality")
    val changed = got.filter($"grp" === "gx")
      .select("k", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val wantKeys = (0L until 150L).filter(_ % 3 == 1).toSet + 299L
    assert(changed.map(_._1) === wantKeys)
    assert(changed.forall { case (k, n) => n == s"r$k!" },
      "assignment expressions evaluate over the matched rows' columns")
    // untouched rows keep their values
    assert(got.filter($"k" === 0L).select("name").as[String].head() === "r0")
  }

  test("changeFeed sees a positional update as delete+insert pairs") {
    val root = tmp("dvupcdc"); lake(root)
    TxnCatalog.updatePositions(spark, root, "t", $"k" === 7L,
      Seq("name" -> "'fixed'"))
    val feed = TxnCatalog.changeFeed(spark, root, "t", 1, 2).get
    val events = feed.select("k", "name", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(events === Set((7L, "r7", "delete"), (7L, "fixed", "insert")))
  }

  test("updatePositions enforces CHECK constraints on the appended rows") {
    val root = tmp("dvupcon"); lake(root)
    TxnCatalog.setTableProperties(spark, root, "t",
      Map("constraint.k_pos" -> "k >= 0"))
    val t0 = TxnCatalog.currentTxn(spark, root).get
    intercept[IllegalArgumentException] {
      TxnCatalog.updatePositions(spark, root, "t", $"k" === 5L,
        Seq("k" -> "-1"))
    }
    assert(TxnCatalog.currentTxn(spark, root).get === t0,
      "a violating UPDATE publishes nothing")
    assert(TxnCatalog.read(spark, root, "t").get.count() === 300L)
  }

  test("SQL UPDATE with an unprunable WHERE routes to the DV path") {
    val root = Files.createTempDirectory("dvupsql").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dvup-sql-test")
      .config("spark.sql.catalog.lake", "graft.storage.GraftCatalog")
      .config("spark.sql.catalog.lake.root", root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.storage.GraftMerge.install(s2)
    try {
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        (0 until 3).map(b => ("t", s"batch=$b",
          (b * 100 until (b + 1) * 100)
            .map(i => (i.toLong, s"g${i % 3}", s"r$i"))
            .toDF("k", "grp", "name"))))
      val before = (0 until 3).map(b => dirOf(root, s"batch=$b"))
      s2.sql("""UPDATE lake.default.t SET name = concat(name, '+')
               |WHERE grp = 'g2' OR k = 0""".stripMargin)
      assert((0 until 3).map(b => dirOf(root, s"batch=$b")) === before,
        "an OR condition has no pruning bounds — must land as DV+append")
      assert(TxnCatalog.snapshot(s2, root).get.deleteEntries("t")
        .map(_._3) === Seq(TxnCatalog.DeletePosMarker))
      val got = s2.sql("SELECT k, name FROM lake.default.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.length === 300)
      assert(got.forall { case (k, n) =>
        if (k % 3 == 2 || k == 0L) n == s"r$k+" else n == s"r$k" })
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("two racing positional deletes both land (recompute-retry)") {
    val root = tmp("dvrace"); lake(root)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val a = Future {
        TxnCatalog.deletePositions(spark, root, "t", $"k" === 10L) }
      val b = Future {
        TxnCatalog.deletePositions(spark, root, "t", $"k" === 222L) }
      Await.result(Future.sequence(Seq(a, b)), 120.seconds)
    } finally pool.shutdown()
    val got = TxnCatalog.read(spark, root, "t").get
      .filter($"k".isin(10L, 222L)).count()
    assert(got === 0L, "both racing deletes must take effect")
    assert(TxnCatalog.read(spark, root, "t").get.count() === 298L)
    assert(TxnCatalog.snapshot(spark, root).get.deleteEntries("t")
      .size === 2, "each delete lands its own vector")
  }

  test("100TB posture: the DV anti-join broadcasts; filters stay pushed") {
    val root = tmp("dvplan"); lake(root)
    TxnCatalog.deletePositions(spark, root, "t", $"grp" === "g1" && $"k" < 50L)
    val df = TxnCatalog.read(spark, root, "t").get.filter($"k" >= 200L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"a KB-scale deletion vector must broadcast under the anti-join:\n$plan")
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(k,200)"),
      s"the caller's filter must still reach the parquet scan:\n$plan")
    assert(df.count() === 100L)
  }

  test("SQL DELETE FROM with a non-key shape routes to a DV, no rewrite") {
    val root = Files.createTempDirectory("dvsql").toFile.getAbsolutePath
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dv-sql-test")
      .config("spark.sql.catalog.lake", "graft.storage.GraftCatalog")
      .config("spark.sql.catalog.lake.root", root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        (0 until 3).map(b => ("t", s"batch=$b",
          (b * 100 until (b + 1) * 100)
            .map(i => (i.toLong, s"g${i % 3}", s"r$i"))
            .toDF("k", "grp", "name"))),
        statsColumns = Seq("k"))
      val before = (0 until 3).map(b => dirOf(root, s"batch=$b"))
      // OR across two columns: neither the equality, IN, nor closed-range
      // shape — refused before DVs existed
      s2.sql("DELETE FROM lake.default.t WHERE k > 250 OR grp = 'g1'")
      val got = s2.sql("SELECT k FROM lake.default.t ORDER BY k")
        .as[Long].collect()
      assert(got === (0L until 300L)
        .filterNot(k => k > 250 || k % 3 == 1).toArray)
      assert((0 until 3).map(b => dirOf(root, s"batch=$b")) === before,
        "SQL DELETE landed as a deletion vector — no data rewrite")
      assert(TxnCatalog.snapshot(s2, root).get.deleteEntries("t")
        .map(_._3) === Seq(TxnCatalog.DeletePosMarker))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
