package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.storage.{GraftLake, TxnCatalog}

/** [[graft.plans.MetadataOnlyCount]]: unfiltered count(*) over a lake
  * frame collapses to the manifest's recorded row counts — and never
  * fires where a scan could answer differently. */
class MetadataCountSpec extends GraftSuite {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  /** A fresh session with GraftExtensions on the shared context (the
    * conf-string path needs spark-submit; withExtensions runs the same
    * injection). Restores the shared session afterwards. */
  private def withExtSession[A](f: SparkSession => A): A = {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-metacount-test")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  /** Does the OPTIMIZED plan still hold the file relation? (The rewrite
    * is logical: a metadata-folded count holds only a LocalRelation. The
    * physical plan hides behind AQE's adaptive root, so the logical
    * level is the reliable observation point.) */
  private def hasScan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves()
      .exists(_.isInstanceOf[LogicalRelation])

  test("count(*) over a counted lake folds to metadata — no scan in the plan") {
    val root = tmp("metacnt")
    withExtSession { s2 =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        (0 until 3).map(b => ("t", s"b=$b",
          (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"r$i"))
            .toDF("k", "name"))),
        statsColumns = Seq("k"))
      val lake = GraftLake.table(s2, root, "t").get
      val cnt = lake.groupBy().count()
      assert(cnt.collect().head.getLong(0) === 300L)
      assert(!hasScan(cnt), "metadata count must not plan a file scan:\n" +
        cnt.queryExecution.executedPlan)
      // SQL over a registered view folds the same way
      lake.createOrReplaceTempView("lake_t")
      val sqlCnt = s2.sql("SELECT count(*) AS n, count(1) AS m FROM lake_t")
      assert(sqlCnt.collect().head.toSeq === Seq(300L, 300L))
      assert(!hasScan(sqlCnt))
    }
  }

  test("a filter, grouping, or other aggregate keeps the real scan") {
    val root = tmp("metacntneg")
    withExtSession { s2 =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0",
          (0 until 50).map(i => (i.toLong, i % 5)).toDF("k", "g"))),
        statsColumns = Seq("k"))
      val lake = GraftLake.table(s2, root, "t").get
      val filtered = lake.where($"k" < 10L).groupBy().count()
      assert(filtered.collect().head.getLong(0) === 10L)
      assert(hasScan(filtered), "a filtered count must scan")
      val grouped = lake.groupBy("g").count()
      assert(grouped.count() === 5L)
      assert(hasScan(grouped), "a grouped count must scan")
      val nonNull = lake.selectExpr("count(k)")
      assert(nonNull.collect().head.getLong(0) === 50L)
      assert(hasScan(nonNull), "count(col) must scan (null semantics)")
    }
  }

  test("uncounted entries and applicable deletes disable the rewrite") {
    val root = tmp("metacntdel")
    withExtSession { s2 =>
      import s2.implicits._
      // no statsColumns -> no recorded row count -> no metadata answer
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0", (0 until 20).map(i => (i.toLong, s"r$i"))
          .toDF("k", "name"))))
      val lake0 = GraftLake.table(s2, root, "t").get
      val c0 = lake0.groupBy().count()
      assert(c0.collect().head.getLong(0) === 20L)
      assert(hasScan(c0), "an uncounted entry must force the scan")

      // counted batch + applicable delete: the anti-join breaks the
      // match, the count reflects the masked rows
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=1", (20 until 40).map(i => (i.toLong, s"r$i"))
          .toDF("k", "name"))),
        statsColumns = Seq("k"))
      TxnCatalog.deleteKeys(s2, root, "t", "k", Seq(0L, 25L).toDF("k"))
      val lake1 = GraftLake.table(s2, root, "t").get
      val c1 = lake1.groupBy().count()
      assert(c1.collect().head.getLong(0) === 38L)
      assert(hasScan(c1), "masked rows must never be counted from metadata")
    }
  }
}
