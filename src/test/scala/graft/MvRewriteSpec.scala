package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.{GraftLake, MaterializedAgg, TxnCatalog}
import graft.storage.MaterializedAgg.AggSpec

/** [[graft.plans.MvRewrite]]: a GROUP BY over a lake table silently
  * answers from a CURRENT materialized view of it — and never from a
  * stale, mismatched, or filtered one. */
class MvRewriteSpec extends GraftSuite {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def withExtSession[A](f: SparkSession => A): A = {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-mvrewrite-test")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  private def build(s2: SparkSession, root: String): Unit = {
    import s2.implicits._
    (0 until 2).foreach { b =>
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", s"b=$b",
          (b * 100 until (b + 1) * 100)
            .map(i => (i.toLong, s"g${i % 3}", i * 10L))
            .toDF("k", "grp", "v"))),
        statsColumns = Seq("k"))
    }
    MaterializedAgg.create(s2, root, "ev_agg", "ev", Seq("grp"),
      Seq(AggSpec("count"), AggSpec("sum", "v"), AggSpec("min", "v"),
        AggSpec("max", "v")))
  }

  /** Which lake TABLE does the optimized plan scan? (empty = no scan) */
  private def scannedTables(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location match {
              case m: graft.storage.ManifestFileIndex => m.lakeTable
              case _ => "?"
            }
          case _ => "?"
        }
    }.toSet

  test("a matching GROUP BY answers from the view, not the source scan") {
    val root = tmp("mvrw")
    withExtSession { s2 =>
      build(s2, root)
      val q = GraftLake.table(s2, root, "ev").get
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
      assert(scannedTables(q) === Set("ev_agg"),
        s"must scan the view only:\n${q.queryExecution.optimizedPlan}")
      // and the values are exactly the direct aggregation's
      val direct = TxnCatalog.read(s2, root, "ev").get
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
        .orderBy("grp").collect()
      assert(q.orderBy("grp").collect() === direct)
    }
  }

  test("SQL over a registered view rewrites the same way") {
    val root = tmp("mvrwsql")
    withExtSession { s2 =>
      build(s2, root)
      GraftLake.table(s2, root, "ev").get.createOrReplaceTempView("ev_v")
      val q = s2.sql(
        "SELECT grp, count(*) AS n, sum(v) AS s FROM ev_v GROUP BY grp")
      assert(scannedTables(q) === Set("ev_agg"))
      assert(q.orderBy("grp").collect().map(_.getLong(1)).sum === 200L)
    }
  }

  test("a STALE view (source appended since) never answers") {
    val root = tmp("mvrwstale")
    withExtSession { s2 =>
      import s2.implicits._
      build(s2, root)
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=9", Seq((900L, "g0", 1L)).toDF("k", "grp", "v"))),
        statsColumns = Seq("k"))
      val q = GraftLake.table(s2, root, "ev").get
        .groupBy("grp").agg(count(lit(1)).as("n"))
      assert(scannedTables(q) === Set("ev"),
        "the stale view must not answer")
      assert(q.agg(sum("n")).collect().head.getLong(0) === 201L)
      // refresh makes it current again — the rewrite comes back
      MaterializedAgg.refresh(s2, root, "ev_agg")
      val q2 = GraftLake.table(s2, root, "ev").get
        .groupBy("grp").agg(count(lit(1)).as("n"))
      assert(scannedTables(q2) === Set("ev_agg"))
    }
  }

  test("a filter, extra column, or mismatched grouping keeps the scan") {
    val root = tmp("mvrwno")
    withExtSession { s2 =>
      build(s2, root)
      val ev = GraftLake.table(s2, root, "ev").get
      // filtered: rewrite would lose the predicate
      assert(scannedTables(ev.where(col("v") > 100)
        .groupBy("grp").agg(count(lit(1)))) === Set("ev"))
      // aggregate the view doesn't store
      assert(scannedTables(ev.groupBy("grp")
        .agg(avg(col("v")))) === Set("ev"))
      // different grouping
      assert(scannedTables(ev.groupBy("k")
        .agg(count(lit(1)))) === Set("ev"))
      // count(DISTINCT) is not additive
      assert(scannedTables(ev.groupBy("grp")
        .agg(countDistinct(col("v")))) === Set("ev"))
    }
  }

  test("a SUBSET grouping re-aggregates the view (rollup rewrite)") {
    val root = tmp("mvrwroll")
    withExtSession { s2 =>
      import s2.implicits._
      (0 until 2).foreach { b =>
        TxnCatalog.commitPartitions(s2, root,
          Seq(("ev", s"b=$b",
            (b * 100 until (b + 1) * 100)
              .map(i => (i.toLong, s"g${i % 3}", s"n${i % 2}", i * 10L))
              .toDF("k", "grp", "nat", "v"))),
          statsColumns = Seq("k"))
      }
      MaterializedAgg.create(s2, root, "ev_agg", "ev", Seq("grp", "nat"),
        Seq(AggSpec("count"), AggSpec("sum", "v"), AggSpec("min", "v"),
          AggSpec("max", "v")))
      // group by ONE of the view's two dimensions: the rollup path
      val q = GraftLake.table(s2, root, "ev").get
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
      assert(scannedTables(q) === Set("ev_agg"),
        s"rollup must re-aggregate the view:\n${q.queryExecution.optimizedPlan}")
      val direct = TxnCatalog.read(s2, root, "ev").get
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
        .orderBy("grp").collect()
      assert(q.orderBy("grp").collect() === direct)
      // a grouping NOT covered by the view keeps the source scan
      assert(scannedTables(GraftLake.table(s2, root, "ev").get
        .groupBy("k").agg(count(lit(1)))) === Set("ev"))
    }
  }

  test("deletes newer than the watermark disable the rewrite") {
    val root = tmp("mvrwdel")
    withExtSession { s2 =>
      import s2.implicits._
      build(s2, root)
      TxnCatalog.deleteKeys(s2, root, "ev", "k", Seq(5L).toDF("k"))
      val q = GraftLake.table(s2, root, "ev").get
        .groupBy("grp").agg(count(lit(1)).as("n"))
      // "?" is the delete-key parquet of the anti-join — the masked
      // read never presents the bare relation, so no rewrite
      assert(scannedTables(q) === Set("ev", "?"))
      assert(q.agg(sum("n")).collect().head.getLong(0) === 199L)
    }
  }

  /** A null-bearing double measure with (sum, non-null count) stored. */
  private def buildAvg(s2: SparkSession, root: String): Unit = {
    import s2.implicits._
    TxnCatalog.commitPartitions(s2, root,
      Seq(("ev", "b=0",
        (0 until 200).map(i => (i.toLong, s"g${i % 3}",
          if (i % 5 == 0) None else Some(i * 1.5)))
          .toDF("k", "grp", "v"))),
      statsColumns = Seq("k"))
    MaterializedAgg.create(s2, root, "ev_avg", "ev", Seq("grp"),
      Seq(AggSpec("count"), AggSpec("sum", "v"), AggSpec("count", "v")))
  }

  test("avg and count(col) answer from (sum, cnt_col) — NULL-exact") {
    val root = tmp("mvrwavg")
    withExtSession { s2 =>
      buildAvg(s2, root)
      val q = GraftLake.table(s2, root, "ev").get
        .groupBy("grp")
        .agg(avg(col("v")).as("a"), count(col("v")).as("nv"),
          count(lit(1)).as("n"))
      assert(scannedTables(q) === Set("ev_avg"),
        s"avg must answer from the view:\n${q.queryExecution.optimizedPlan}")
      val direct = TxnCatalog.read(s2, root, "ev").get
        .groupBy("grp")
        .agg(avg(col("v")).as("a"), count(col("v")).as("nv"),
          count(lit(1)).as("n"))
        .orderBy("grp").collect()
      assert(q.orderBy("grp").collect() === direct)
    }
  }

  test("avg without a stored non-null count keeps the scan (nullable col)") {
    val root = tmp("mvrwavg2")
    withExtSession { s2 =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=0",
          (0 until 60).map(i => (i.toLong, s"g${i % 2}", Some(i * 2.0)))
            .toDF("k", "grp", "v"))),
        statsColumns = Seq("k"))
      // the view stores cnt + sum_v but NOT cnt_v; v is nullable by
      // schema, so count(*) is not a safe stand-in for count(v)
      MaterializedAgg.create(s2, root, "ev_agg", "ev", Seq("grp"),
        Seq(AggSpec("count"), AggSpec("sum", "v")))
      val q = GraftLake.table(s2, root, "ev").get
        .groupBy("grp").agg(avg(col("v")).as("a"))
      assert(scannedTables(q) === Set("ev"),
        "avg over a nullable column must keep the scan without cnt_v")
    }
  }

  test("decimal avg conservatively keeps the scan") {
    val root = tmp("mvrwavg3")
    withExtSession { s2 =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=0",
          (0 until 60).map(i => (i.toLong, s"g${i % 2}", i * 3L))
            .toDF("k", "grp", "v0")
            .select(col("k"), col("grp"),
              col("v0").cast("decimal(18,2)").as("v")))),
        statsColumns = Seq("k"))
      MaterializedAgg.create(s2, root, "ev_agg", "ev", Seq("grp"),
        Seq(AggSpec("count"), AggSpec("sum", "v"), AggSpec("count", "v")))
      val q = GraftLake.table(s2, root, "ev").get
        .groupBy("grp").agg(avg(col("v")).as("a"))
      assert(scannedTables(q) === Set("ev"),
        "decimal avg does not rewrite (Average's decimal rounding " +
          "rules are not replicated)")
      // but count(v) still answers from the view
      val q2 = GraftLake.table(s2, root, "ev").get
        .groupBy("grp").agg(count(col("v")).as("nv"))
      assert(scannedTables(q2) === Set("ev_agg"))
    }
  }

  test("avg rolls up: coarser grouping re-sums both pieces") {
    val root = tmp("mvrwavg4")
    withExtSession { s2 =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("ev", "b=0",
          (0 until 120).map(i => (i.toLong, s"g${i % 3}", s"h${i % 2}",
            if (i % 7 == 0) None else Some(i * 0.5)))
            .toDF("k", "grp", "sub", "v"))),
        statsColumns = Seq("k"))
      MaterializedAgg.create(s2, root, "ev_agg", "ev", Seq("grp", "sub"),
        Seq(AggSpec("count"), AggSpec("sum", "v"), AggSpec("count", "v")))
      val q = GraftLake.table(s2, root, "ev").get
        .groupBy("grp").agg(avg(col("v")).as("a"))
      assert(scannedTables(q) === Set("ev_agg"),
        s"rollup avg must use the view:\n${q.queryExecution.optimizedPlan}")
      val direct = TxnCatalog.read(s2, root, "ev").get
        .groupBy("grp").agg(avg(col("v")).as("a"))
        .orderBy("grp").collect()
      assert(q.orderBy("grp").collect() === direct)
    }
  }
}
