package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.storage.{GraftLake, TxnCatalog}

/** [[graft.plans.MetadataOnlyAgg]]: unfiltered count(*)/min/max over a lake
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

  test("SQL-catalog path folds count/min/max; every unsound shape keeps the scan") {
    val root = tmp("metasqlcat")
    withExtSession { s2 =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b0", (0 until 500).map(i => (i.toLong, s"r$i"))
          .toDF("k", "name"))),
        statsColumns = Seq("k"))
      val cat = s"ms${java.util.UUID.randomUUID().toString.take(8)}"
      s2.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
      s2.conf.set(s"spark.sql.catalog.$cat.root", root)
      def v2Scan(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => true
          case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => true
          case _ => false
        }
      // the 100 TB sanity query: zero-scan over the SQL identifier
      val q = s2.sql(
        s"SELECT count(*) AS n, min(k) AS lo, max(k) AS hi FROM $cat.t")
      assert(q.collect().head.toSeq === Seq(500L, 0L, 499L))
      assert(!v2Scan(q), "SQL count/min/max must fold to metadata:\n" +
        q.queryExecution.optimizedPlan)
      // a WHERE keeps the real scan
      val f = s2.sql(s"SELECT max(k) AS hi FROM $cat.t WHERE k > 5")
      assert(f.collect().head.getLong(0) === 499L)
      assert(v2Scan(f), "a filtered aggregate must scan")
      // ADD COLUMN DEFAULT: the filled column has no pre-alter stats —
      // min must come from the SCAN (which reads the exists-default),
      // never from metadata that predates the column
      s2.sql(s"ALTER TABLE $cat.t ADD COLUMN tier STRING DEFAULT 'bronze'")
      val d = s2.sql(s"SELECT min(tier) AS lo FROM $cat.t")
      assert(d.collect().head.getString(0) === "bronze")
      assert(v2Scan(d), "an exists-default column must scan")
      // a pending deletion vector sends metadata answers dark
      TxnCatalog.deletePositions(s2, root, "t",
        org.apache.spark.sql.functions.col("k") === 10L)
      val q2 = s2.sql(s"SELECT count(*) AS n FROM $cat.t")
      assert(q2.collect().head.getLong(0) === 499L)
      assert(v2Scan(q2), "metadata answers go dark while a DV pends")
      // time travel folds at the pinned txn, before the delete
      val q3 = s2.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 1")
      assert(q3.collect().head.getLong(0) === 500L)
      assert(!v2Scan(q3), "time-travel fold at the pinned snapshot")
    }
  }

  test("min/max over stat columns fold to metadata, exactly, per type") {
    val root = tmp("metamm")
    withExtSession { s2 =>
      import s2.implicits._
      val base = java.time.Instant.parse("2024-05-01T00:00:00Z")
      val df = (0 until 300).map { i =>
        (i.toLong, i * 0.25 - 7.5, s"doc${"%03d".format(i)}",
          java.sql.Timestamp.from(base.plusSeconds(i * 60L)), i % 7)
      }.toDF("k", "x", "nm", "ts", "w")
      TxnCatalog.commitPartitions(s2, root,
        (0 until 3).map(b => ("t", s"b=$b",
          df.filter($"k" % 3 === b))),
        statsColumns = Seq("k", "x", "nm", "ts"))
      val lake = GraftLake.table(s2, root, "t").get
      lake.createOrReplaceTempView("mm_t")
      val q = s2.sql(
        """SELECT min(k) AS k0, max(k) AS k1, min(x) AS x0, max(x) AS x1,
          |       min(nm) AS n0, max(nm) AS n1, min(ts) AS t0, max(ts) AS t1,
          |       count(*) AS n
          |FROM mm_t""".stripMargin)
      val row = q.collect().head
      assert(!hasScan(q), "stat-backed min/max must fold:\n" +
        q.queryExecution.optimizedPlan)
      assert(row.getLong(0) === 0L && row.getLong(1) === 299L)
      assert(row.getDouble(2) === -7.5 && row.getDouble(3) === 299 * 0.25 - 7.5)
      assert(row.getString(4) === "doc000" && row.getString(5) === "doc299")
      assert(row.getTimestamp(6) === java.sql.Timestamp.from(base))
      assert(row.getTimestamp(7)
        === java.sql.Timestamp.from(base.plusSeconds(299 * 60L)))
      assert(row.getLong(8) === 300L)
      // the folded values equal the real scan's, bit for bit
      val scan = lake.groupBy().agg(
        org.apache.spark.sql.functions.min("x"),
        org.apache.spark.sql.functions.max("x")).collect().head
      assert(scan.getDouble(0) === row.getDouble(2))
      assert(scan.getDouble(1) === row.getDouble(3))
      // a column WITHOUT recorded stats keeps the scan (and the answer)
      val noStat = lake.selectExpr("min(w)", "max(w)")
      assert(hasScan(noStat), "stat-less column must keep the scan")
      assert(noStat.collect().head.toSeq === Seq(0, 6))
      val mixed = lake.selectExpr("min(k)", "avg(x)")
      assert(hasScan(mixed), "avg cannot fold — whole rewrite must refuse")
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
      // count(col) now folds when every entry records rows AND the
      // column's null count (both ride the stats pass)
      val nonNull = lake.selectExpr("count(k)")
      assert(nonNull.collect().head.getLong(0) === 50L)
      assert(!hasScan(nonNull), "count(stat column) folds to metadata")
      // a stat-less column's null count is unknown: keep the scan
      val statless = lake.selectExpr("count(g)")
      assert(statless.collect().head.getLong(0) === 50L)
      assert(hasScan(statless), "count of a stat-less column must scan")
      // distinct counts never fold
      val dist = lake.selectExpr("count(DISTINCT k)")
      assert(dist.collect().head.getLong(0) === 50L)
      assert(hasScan(dist), "count(DISTINCT) must scan")
    }
  }

  test("count(col) folds to the NON-NULL count when nulls are present") {
    val root = tmp("metacntnull")
    withExtSession { s2 =>
      import s2.implicits._
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0",
          (0 until 30).map(i => (i.toLong,
            if (i % 3 == 0) None else Some(i.toLong))).toDF("k", "v"))),
        statsColumns = Seq("k", "v"))
      val lake = GraftLake.table(s2, root, "t").get
      val c = lake.selectExpr("count(v)")
      assert(c.collect().head.getLong(0) === 20L,
        "folded answer must match SQL null-skipping semantics")
      assert(!hasScan(c), "count(col) with recorded null counts folds")
    }
  }

  test("GROUP BY a constant-per-entry column folds to the manifest") {
    val root = tmp("metagrp")
    withExtSession { s2 =>
      import s2.implicits._
      // identity-partitioned layout: each entry holds ONE segment value
      val df = (0 until 300).map { i =>
        (i.toLong, Seq("A", "B", "C")(i % 3), i * 0.5)
      }.toDF("k", "seg", "x")
      TxnCatalog.commitPartitions(s2, root,
        Seq("A", "B", "C").map(g =>
          ("t", s"seg=$g", df.filter($"seg" === g))),
        statsColumns = Seq("k", "seg", "x"))
      val lake = GraftLake.table(s2, root, "t").get
      lake.createOrReplaceTempView("grp_t")
      val q = s2.sql(
        """SELECT seg, count(*) AS n, count(x) AS nx,
          |       min(k) AS lo, max(k) AS hi
          |FROM grp_t GROUP BY seg ORDER BY seg""".stripMargin)
      val rows = q.collect()
      assert(!hasScan(q), "grouped metadata fold must not plan a scan:\n" +
        q.queryExecution.optimizedPlan)
      // the folded groups equal a real scan's, bit for bit
      val scan = lake.groupBy("seg").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.count($"x").as("nx"),
        org.apache.spark.sql.functions.min("k").as("lo"),
        org.apache.spark.sql.functions.max("k").as("hi"))
        .orderBy("seg").collect()
      assert(rows.map(_.toSeq).toSeq === scan.map(_.toSeq).toSeq)
      assert(rows.map(_.getString(0)).toSeq === Seq("A", "B", "C"))
      assert(rows.map(_.getLong(1)).sum === 300L)
      // grouping on a NON-constant column keeps the scan (k spans the
      // entry; min != max refuses the fold)
      val bad = lake.groupBy("k").count()
      assert(hasScan(bad), "a non-constant group column must scan")
      // an aggregate outside the folded set refuses the whole rewrite
      val avg = s2.sql("SELECT seg, avg(x) AS m FROM grp_t GROUP BY seg")
      assert(hasScan(avg), "avg cannot fold — grouped rewrite must refuse")
      // a filter under the grouping keeps the scan
      val filt = s2.sql(
        "SELECT seg, count(*) AS n FROM grp_t WHERE k > 5 GROUP BY seg")
      assert(hasScan(filt), "a filtered grouped count must scan")
    }
  }

  test("a WHERE over constant-per-entry columns prunes entries, then folds") {
    val root = tmp("metafilt")
    withExtSession { s2 =>
      import s2.implicits._
      val df = (0 until 300).map { i =>
        (i.toLong, Seq("A", "B", "C")(i % 3), Seq("x", "y")(i % 2))
      }.toDF("k", "seg", "tier")
      TxnCatalog.commitPartitions(s2, root,
        (for { g <- Seq("A", "B", "C"); t <- Seq("x", "y") } yield
          ("t", s"seg=$g.tier=$t",
            df.filter($"seg" === g && $"tier" === t))),
        statsColumns = Seq("k", "seg", "tier"))
      val lake = GraftLake.table(s2, root, "t").get
      lake.createOrReplaceTempView("filt_t")
      // ungrouped under IN + equality: folds, exact vs the scan
      val q = s2.sql(
        """SELECT count(*) AS n, min(k) AS lo, max(k) AS hi
          |FROM filt_t WHERE seg IN ('A', 'C') AND tier = 'x'""".stripMargin)
      assert(!hasScan(q), "constant-column WHERE must fold:\n" +
        q.queryExecution.optimizedPlan)
      val scan = lake.filter($"seg".isin("A", "C") && $"tier" === "x")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.min("k"),
          org.apache.spark.sql.functions.max("k")).collect().head
      assert(q.collect().head.toSeq === scan.toSeq)
      // grouped + filtered folds too
      val g = s2.sql(
        """SELECT seg, count(*) AS n FROM filt_t
          |WHERE tier = 'y' GROUP BY seg ORDER BY seg""".stripMargin)
      assert(!hasScan(g), "grouped+filtered fold:\n" +
        g.queryExecution.optimizedPlan)
      assert(g.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        === Seq(("A", 50L), ("B", 50L), ("C", 50L)))
      // a predicate no entry satisfies still returns SQL's one row
      val none = s2.sql(
        """SELECT count(*) AS n, max(k) AS hi FROM filt_t
          |WHERE seg = 'ZZZ'""".stripMargin)
      assert(!hasScan(none))
      assert(none.collect().head.toSeq === Seq(0L, null))
      // a predicate over a NON-constant column keeps the scan
      val non = s2.sql("SELECT count(*) AS n FROM filt_t WHERE k < 10")
      assert(non.collect().head.getLong(0) === 10L)
      assert(hasScan(non), "a row-grain predicate must scan")
      // a non-deterministic predicate keeps the scan (OR-joined so the
      // optimizer can't simplify the rand conjunct away first)
      val rnd = s2.sql(
        "SELECT count(*) AS n FROM filt_t WHERE rand() >= 0.5 OR seg = 'A'")
      assert(hasScan(rnd), "non-deterministic predicates must scan")
    }
  }

  test("grouped fold on the SQL-catalog path; nulls in the group column refuse") {
    val root = tmp("metagrpsql")
    withExtSession { s2 =>
      import s2.implicits._
      val df = (0 until 200).map { i =>
        (i.toLong, if (i % 2 == 0) "even" else "odd")
      }.toDF("k", "par")
      TxnCatalog.commitPartitions(s2, root,
        Seq("even", "odd").map(g => ("t", s"p=$g", df.filter($"par" === g))),
        statsColumns = Seq("k", "par"))
      val cat = s"mg${java.util.UUID.randomUUID().toString.take(8)}"
      s2.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
      s2.conf.set(s"spark.sql.catalog.$cat.root", root)
      def v2Scan(dfq: org.apache.spark.sql.DataFrame): Boolean =
        dfq.queryExecution.optimizedPlan.collectLeaves().exists {
          case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => true
          case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => true
          case _ => false
        }
      val q = s2.sql(s"""SELECT par, count(*) AS n, min(k) AS lo
                        |FROM $cat.t GROUP BY par ORDER BY par""".stripMargin)
      assert(q.collect().map(_.toSeq).toSeq ===
        Seq(Seq("even", 100L, 0L), Seq("odd", 100L, 1L)))
      assert(!v2Scan(q), "SQL grouped fold must answer from the manifest:\n" +
        q.queryExecution.optimizedPlan)
      // an applicable equality delete sends the grouped answer dark
      TxnCatalog.deleteKeys(s2, root, "t", "k", Seq(0L).toDF("k"))
      val q2 = s2.sql(s"SELECT par, count(*) AS n FROM $cat.t GROUP BY par")
      assert(q2.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        === Map("even" -> 99L, "odd" -> 100L))
      assert(v2Scan(q2), "masked rows must never fold from metadata")
    }
    // a group column with NULLs in some entry refuses (the NULL group's
    // membership is invisible to min/max stats)
    val root2 = tmp("metagrpnull")
    withExtSession { s2 =>
      import s2.implicits._
      val df = (0 until 40).map(i =>
        (i.toLong, if (i < 20) Some("g0") else None)).toDF("k", "par")
      TxnCatalog.commitPartitions(s2, root2,
        Seq(("t", "p=g0", df.filter($"par".isNotNull)),
          ("t", "p=null", df.filter($"par".isNull))),
        statsColumns = Seq("k", "par"))
      val lake = GraftLake.table(s2, root2, "t").get
      val g = lake.groupBy("par").count()
      assert(g.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        === Map("g0" -> 20L, null.asInstanceOf[String] -> 20L))
      assert(hasScan(g), "a NULL-holding group column must keep the scan")
    }
  }

  test("install()-only session folds a filtered agg from pushed predicates") {
    // runtime injection (extraOptimizations) runs AFTER pushdown has
    // consumed the WHERE into the DSv2 scan: the fold must re-derive
    // the surviving entries from the scan's PUSHED filters
    val root = tmp("metainstflt")
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-metainstall-test")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      graft.plans.MetadataOnlyAgg.install(s2)
      val df = (0 until 200).map { i =>
        (i.toLong, if (i % 2 == 0) "even" else "odd")
      }.toDF("k", "par")
      TxnCatalog.commitPartitions(s2, root,
        Seq("even", "odd").map(g => ("t", s"p=$g", df.filter($"par" === g))),
        statsColumns = Seq("k", "par"))
      val cat = s"mi${java.util.UUID.randomUUID().toString.take(8)}"
      s2.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
      s2.conf.set(s"spark.sql.catalog.$cat.root", root)
      def folded(dfq: org.apache.spark.sql.DataFrame): Boolean =
        dfq.queryExecution.optimizedPlan.collectLeaves().forall(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
      // constant-column WHERE: count folds to the pruned entry set
      val q = s2.sql(s"SELECT count(*) AS n FROM $cat.t WHERE par = 'even'")
      assert(q.collect().head.getLong(0) === 100L)
      assert(folded(q), "install()-only filtered count must fold from " +
        "pushed predicates:\n" + q.queryExecution.optimizedPlan)
      // ... including under grouping and min/max over the survivors
      val q2 = s2.sql(s"""SELECT par, count(*) AS n, min(k) AS lo
                         |FROM $cat.t WHERE par <> 'even'
                         |GROUP BY par""".stripMargin)
      assert(q2.collect().map(_.toSeq).toSeq === Seq(Seq("odd", 100L, 1L)))
      assert(folded(q2), q2.queryExecution.optimizedPlan.toString)
      // a predicate over a NON-constant column refuses: the pushed
      // filter can prune rows inside entries, so the fold keeps the scan
      val q3 = s2.sql(s"SELECT count(*) AS n FROM $cat.t WHERE k < 10")
      assert(q3.collect().head.getLong(0) === 10L)
      assert(!folded(q3), "row-grain predicates must keep the scan")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("uncounted entries and applicable deletes disable the rewrite") {
    val root = tmp("metacntdel")
    withExtSession { s2 =>
      import s2.implicits._
      // no statsColumns: the row count is still recorded — driver-
      // direct from the staged parquet footers — so count(*) folds
      // even on tables with no declared stats columns
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=0", (0 until 20).map(i => (i.toLong, s"r$i"))
          .toDF("k", "name"))))
      val lake0 = GraftLake.table(s2, root, "t").get
      val c0 = lake0.groupBy().count()
      assert(c0.collect().head.getLong(0) === 20L)
      assert(!hasScan(c0),
        "a stats-less commit records footer row counts — count(*) folds")
      // a genuinely uncounted entry (un-analyzed add_files import:
      // external files the engine never scanned) keeps the scan
      val ext = tmp("metacntext")
      (100 until 110).map(i => (i.toLong, s"x$i")).toDF("k", "name")
        .coalesce(1).write.mode("overwrite").parquet(ext)
      graft.storage.Importer.addFiles(s2, root, "t", ext)
      val lakeI = GraftLake.table(s2, root, "t").get
      val cI = lakeI.groupBy().count()
      assert(cI.collect().head.getLong(0) === 30L)
      assert(hasScan(cI), "an uncounted import must force the scan")

      // counted batch + applicable delete: the anti-join breaks the
      // match, the count reflects the masked rows
      TxnCatalog.commitPartitions(s2, root,
        Seq(("t", "b=1", (20 until 40).map(i => (i.toLong, s"r$i"))
          .toDF("k", "name"))),
        statsColumns = Seq("k"))
      TxnCatalog.deleteKeys(s2, root, "t", "k", Seq(0L, 25L).toDF("k"))
      val lake1 = GraftLake.table(s2, root, "t").get
      val c1 = lake1.groupBy().count()
      assert(c1.collect().head.getLong(0) === 48L)
      assert(hasScan(c1), "masked rows must never be counted from metadata")
    }
  }

  test("sum folds to the manifest — exact, typed, refused when unsound") {
    val root = tmp("metasum")
    withExtSession { s2 =>
      import s2.implicits._
      val df = (1 to 300).map { i =>
        (i.toLong, i, BigDecimal(i) / 4, i * 0.5,
          Seq("A", "B", "C")(i % 3))
      }.toDF("k", "i", "dec", "x", "seg")
        .withColumn("dec", $"dec".cast("decimal(10,2)"))
      TxnCatalog.commitPartitions(s2, root,
        Seq("A", "B", "C").map(g =>
          ("t", s"seg=$g", df.filter($"seg" === g))),
        statsColumns = Seq("k", "i", "dec", "x", "seg"))
      val lake = GraftLake.table(s2, root, "t").get
      lake.createOrReplaceTempView("sum_t")

      // long + decimal sums fold, bit-exact vs a real scan
      val q = s2.sql(
        "SELECT sum(k) AS sk, sum(dec) AS sd FROM sum_t")
      val scan = lake.selectExpr("sum(k) AS sk", "sum(dec) AS sd")
        .collect().head
      assert(q.collect().head.toSeq === scan.toSeq)
      assert(!hasScan(q), "sum(long)/sum(decimal) must fold:\n" +
        q.queryExecution.optimizedPlan)
      assert(q.schema("sd").dataType ===
        org.apache.spark.sql.types.DecimalType(20, 2))

      // int sums fold too (Sum's result is LongType)
      val qi = s2.sql("SELECT sum(i) AS si FROM sum_t")
      assert(qi.collect().head.getLong(0) === 300L * 301 / 2)
      assert(!hasScan(qi), "sum(int) must fold:\n" +
        qi.queryExecution.optimizedPlan)

      // double sums never fold (order-dependent rounding)
      val qx = s2.sql("SELECT sum(x) AS sx FROM sum_t")
      assert(hasScan(qx), "sum(double) must keep the scan")
      // ANSI (the Spark 4 default) integral sums fold ONLY when no
      // evaluation order can overflow an intermediate partial sum
      // (bound: Σ rows·max(|lo|,|hi|) ≤ Long.MaxValue) — an ANSI scan
      // raises on the first overflowing PARTIAL even when the total
      // fits, an error a fold must never suppress. sum_t's bound is
      // tiny, so it folds (assertions above, ANSI-default session);
      // a near-Long.MaxValue fixture must refuse despite its total
      // fitting Long.
      val rootAnsi = tmp("metasumansi")
      val dfAnsi = Seq((1L, Long.MaxValue - 5L), (2L, -100L), (3L, 50L))
        .toDF("k", "v")
      TxnCatalog.commitPartitions(s2, rootAnsi, Seq(("t", "b=0", dfAnsi)),
        statsColumns = Seq("k", "v"))
      val lakeAnsi = GraftLake.table(s2, rootAnsi, "t").get
      val qAnsi = lakeAnsi.selectExpr("sum(v) AS sv")
      assert(hasScan(qAnsi), "an ANSI Long sum whose partials could " +
        "overflow must keep the scan")
      // the scan's own outcome is ORDER-DEPENDENT: a partial may pair
      // (MaxValue-5) with (+50) and raise, or accumulate safely to the
      // fitting total — both are legitimate ANSI scan behaviors, and a
      // fold would have silently pinned one of them
      scala.util.Try(qAnsi.collect().head.getLong(0)) match {
        case scala.util.Success(v) => assert(v === Long.MaxValue - 55L)
        case scala.util.Failure(e) =>
          assert(e.getMessage.contains("ARITHMETIC_OVERFLOW") ||
            Option(e.getCause).exists(
              _.getMessage.contains("ARITHMETIC_OVERFLOW")), e.toString)
      }
      // try_sum (TRY eval mode) is overflow-sensitive the same way —
      // a partial overflow makes the scan return NULL, an outcome the
      // fold must not preempt: unsafe bound keeps the scan...
      val qTry = lakeAnsi.selectExpr("try_sum(v) AS sv")
      assert(hasScan(qTry), "try_sum over overflow-capable partials " +
        "must keep the scan")
      // ...while a provably-safe bound folds try_sum like plain sum
      val qTrySafe = s2.sql("SELECT try_sum(k) AS sk FROM sum_t")
      assert(qTrySafe.collect().head.getLong(0) === 300L * 301 / 2)
      assert(!hasScan(qTrySafe), "safe-bound try_sum folds:\n" +
        qTrySafe.queryExecution.optimizedPlan)
      // with ANSI off, the same total folds (scan would wrap, never
      // raise — and the recorded total fits, matching the scan result)
      s2.conf.set("spark.sql.ansi.enabled", "false")
      try {
        val qn2 = lakeAnsi.selectExpr("sum(v) AS sv")
        assert(qn2.collect().head.getLong(0) === Long.MaxValue - 55L)
        assert(!hasScan(qn2), "non-ANSI Long sum folds on the total:\n" +
          qn2.queryExecution.optimizedPlan)
      } finally s2.conf.set("spark.sql.ansi.enabled", "true")
      // DISTINCT refuses
      assert(hasScan(s2.sql("SELECT sum(DISTINCT k) AS s FROM sum_t")),
        "sum(DISTINCT) must keep the scan")

      // grouped + filtered sums fold and match the scan exactly
      val g = s2.sql(
        """SELECT seg, sum(k) AS sk, sum(dec) AS sd, count(*) AS n
          |FROM sum_t WHERE seg IN ('A', 'C')
          |GROUP BY seg ORDER BY seg""".stripMargin)
      val gs = lake.filter($"seg".isin("A", "C")).groupBy("seg")
        .agg(org.apache.spark.sql.functions.sum("k").as("sk"),
          org.apache.spark.sql.functions.sum("dec").as("sd"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy("seg").collect()
      assert(g.collect().map(_.toSeq).toSeq === gs.map(_.toSeq).toSeq)
      assert(!hasScan(g), "grouped+filtered sum must fold:\n" +
        g.queryExecution.optimizedPlan)

      // nulls are skipped exactly like the scan's sum
      val root2 = tmp("metasumnull")
      val dfn = (1 to 50).map(i =>
        (i.toLong, if (i % 5 == 0) None else Some(i.toLong)))
        .toDF("k", "v")
      TxnCatalog.commitPartitions(s2, root2, Seq(("t", "b=0", dfn)),
        statsColumns = Seq("k", "v"))
      val lake2 = GraftLake.table(s2, root2, "t").get
      val qn = lake2.selectExpr("sum(v) AS sv")
      assert(qn.collect().head.getLong(0) ===
        (1 to 50).filter(_ % 5 != 0).map(_.toLong).sum)
      assert(!hasScan(qn), "null-skipping sum must fold")

      // an entry without the sum stat (stats-less commit) refuses
      TxnCatalog.commitPartitions(s2, root2,
        Seq(("t", "b=1", Seq((51L, Some(51L))).toDF("k", "v"))))
      val lake3 = GraftLake.table(s2, root2, "t").get
      val qr = lake3.selectExpr("sum(v) AS sv")
      assert(hasScan(qr), "an entry missing the sum stat must scan")

      // count(DISTINCT c) over a constant-per-entry column folds: the
      // distinct set is exactly the distinct canonical renderings —
      // ungrouped (the entry-grain fallback), filtered, and the
      // non-constant refusal
      val qd = s2.sql("SELECT count(DISTINCT seg) AS n FROM sum_t")
      assert(qd.collect().head.getLong(0) === 3L)
      assert(!hasScan(qd), "count(DISTINCT constant-col) must fold:\n" +
        qd.queryExecution.optimizedPlan)
      val qdf = s2.sql(
        "SELECT count(DISTINCT seg) AS n FROM sum_t WHERE seg <> 'B'")
      assert(qdf.collect().head.getLong(0) === 2L)
      assert(!hasScan(qdf), "filtered count(DISTINCT) must fold")
      assert(hasScan(
        s2.sql("SELECT count(DISTINCT k) AS n FROM sum_t")),
        "count(DISTINCT) over a non-constant column must scan")

      // avg(decimal) folds by evaluating Spark's OWN average tree with
      // the manifest totals substituted — bit-exact on rounding-
      // sensitive values (1/3, 1/7 at scale s+4); avg over double or
      // integral children refuses (double sum buffer, order-dependent)
      val rootA = tmp("metaavg")
      val dfa = (1 to 100).map { i =>
        (i.toLong, BigDecimal(i) / 7, i * 0.5,
          Seq("A", "B")(i % 2))
      }.toDF("k", "dec", "x", "seg")
        .withColumn("dec", $"dec".cast("decimal(12,3)"))
      TxnCatalog.commitPartitions(s2, rootA,
        Seq("A", "B").map(g =>
          ("t", s"seg=$g", dfa.filter($"seg" === g))),
        statsColumns = Seq("k", "dec", "x", "seg"))
      val lakeA = GraftLake.table(s2, rootA, "t").get
      lakeA.createOrReplaceTempView("avg_t")
      val qa = s2.sql("SELECT avg(dec) AS ad FROM avg_t")
      val scanA = lakeA.selectExpr("avg(dec) AS ad").collect().head
      assert(qa.collect().head.toSeq === scanA.toSeq)
      assert(!hasScan(qa), "avg(decimal) must fold:\n" +
        qa.queryExecution.optimizedPlan)
      val qg = s2.sql(
        """SELECT seg, avg(dec) AS ad, sum(dec) AS sd FROM avg_t
          |GROUP BY seg ORDER BY seg""".stripMargin)
      val scanG = lakeA.groupBy("seg")
        .agg(org.apache.spark.sql.functions.avg("dec").as("ad"),
          org.apache.spark.sql.functions.sum("dec").as("sd"))
        .orderBy("seg").collect()
      assert(qg.collect().map(_.toSeq).toSeq === scanG.map(_.toSeq).toSeq)
      assert(!hasScan(qg), "grouped avg(decimal) must fold:\n" +
        qg.queryExecution.optimizedPlan)
      assert(hasScan(s2.sql("SELECT avg(x) AS a FROM avg_t")),
        "avg(double) must keep the scan")
      assert(hasScan(s2.sql("SELECT avg(k) AS a FROM avg_t")),
        "avg(bigint) sums in a double buffer — must keep the scan")

      // a total OUTSIDE the result type keeps the scan (the fold must
      // never paper over the scan's own overflow behavior)
      val root3 = tmp("metasumovf")
      val big = Seq(Long.MaxValue / 2 + 1L, Long.MaxValue / 2 + 1L)
        .toDF("k")
      TxnCatalog.commitPartitions(s2, root3, Seq(("t", "b=0", big)),
        statsColumns = Seq("k"))
      val lakeO = GraftLake.table(s2, root3, "t").get
      val qo = lakeO.selectExpr("sum(k) AS sk")
      assert(hasScan(qo), "an over-Long total must keep the scan")
    }
  }

  test("grouped fold survives decimal scale widening (rendered-key seam)") {
    val root = tmp("metawiden")
    withExtSession { s2 =>
      val cat = s"mw${java.util.UUID.randomUUID().toString.take(8)}"
      s2.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
      s2.conf.set(s"spark.sql.catalog.$cat.root", root)
      s2.sql(s"""CREATE TABLE $cat.wt (k BIGINT, seg DECIMAL(10,0))
                |TBLPROPERTIES ('graft.stats-columns' = 'k,seg')""".stripMargin)
      // pre-widening entry: seg constant 5, stat rendered "5"
      s2.sql(s"INSERT INTO $cat.wt VALUES (1, 5), (2, 5)")
      s2.sql(s"ALTER TABLE $cat.wt ALTER COLUMN seg TYPE DECIMAL(12,2)")
      // post-widening entry: the SAME value now renders "5.00"
      s2.sql(s"INSERT INTO $cat.wt VALUES (3, 5.00), (4, 5.00)")
      val q = s2.sql(
        s"SELECT seg, count(*) AS n, min(k) AS lo FROM $cat.wt GROUP BY seg")
      val rows = q.collect()
      // the scan's answer: ONE group — a fold must agree or refuse
      assert(rows.length === 1,
        s"one logical group must yield one row, got ${rows.toSeq}")
      assert(rows.head.getDecimal(0) ===
        new java.math.BigDecimal("5.00"))
      assert(rows.head.getLong(1) === 4L)
      assert(rows.head.getLong(2) === 1L)
      // and it must be a FOLD: the "5"-era and "5.00"-era stat
      // renderings key one canonical group; the CREATE shell and the
      // ALTER schema batch (recorded zero rows) don't refuse it
      def v2Scan(dfq: org.apache.spark.sql.DataFrame): Boolean =
        dfq.queryExecution.optimizedPlan.collectLeaves().exists {
          case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => true
          case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => true
          case _ => false
        }
      assert(!v2Scan(q),
        "grouped fold must survive a decimal widening:\n" +
          q.queryExecution.optimizedPlan)
      // ungrouped count(*) folds across the shell + schema batches too
      val c = s2.sql(s"SELECT count(*) AS n FROM $cat.wt")
      assert(c.collect().head.getLong(0) === 4L)
      assert(!v2Scan(c),
        "count(*) must fold past zero-row schema entries:\n" +
          c.queryExecution.optimizedPlan)
    }
  }
}
