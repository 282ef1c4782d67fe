package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.QueryFixtures

/** Dev-only stage profiler for the SQL DML round-trip queries: times
  * clone / statement / read separately (second iteration, so fixture
  * construction is excluded) and counts Spark JOBS per phase — a ~2 s
  * DML statement over 15k rows is fixed per-job overhead, and this
  * says how many jobs each phase launches. Run:
  * tools/run.sh graft.tools.ProfileDml /root/testdata/sf0.1
  */
object ProfileDml {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").count()

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val verbose = sys.env.contains("SPARK_GRAFT_PROFILE_JOBS")
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val stages = j.stageInfos.map(_.name).mkString(" | ")
          println(s"[job] $stages")
        }
      }
    })

    def time[T](name: String)(f: => T): T = {
      // listener events are async; a short settle keeps counts honest
      Thread.sleep(120)
      val j0 = jobs.get(); val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120)
      println(f"[dml] $name%-34s $dt%6.2fs  jobs=${jobs.get() - j0}")
      r
    }

    (1 to 2).foreach { it =>
      println(s"--- iteration $it ---")
      // s_sql_merge phases
      val root = QueryFixtures.mergeBase(s, d)
      val cust = graft.Tables.customer(s, d).select("c_custkey", "c_acctbal")
      val cat = QueryFixtures.sqlCatalog(s, root)
      graft.storage.GraftMerge.install(s)
      val t = time("merge: clone")(QueryFixtures.cloneOf(s, root, "cust"))
      cust.filter(col("c_custkey") < 50)
        .select(col("c_custkey"), (col("c_acctbal") + 1000.0).as("c_acctbal"))
        .union(s.sql("SELECT CAST(90000001 AS BIGINT), CAST(111.25 AS DOUBLE)"))
        .createOrReplaceTempView(s"${cat}_src")
      time("merge: MERGE INTO")(
        s.sql(s"""MERGE INTO $cat.default.$t t USING ${cat}_src src
                 |ON t.c_custkey = src.c_custkey
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
      time("merge: read back")(
        s.sql(s"SELECT c_custkey, c_acctbal FROM $cat.default.$t")
          .write.format("noop").mode("overwrite").save())

      // s_sql_update phases
      val uroot = QueryFixtures.update4Base(s, d)
      val ucat = QueryFixtures.sqlCatalog(s, uroot)
      val ut = time("update: clone")(QueryFixtures.cloneOf(s, uroot, "cust"))
      time("update: UPDATE")(
        s.sql(s"""UPDATE $ucat.default.$ut
                 |SET c_acctbal = c_acctbal + 10000.0
                 |WHERE c_acctbal >= 1000.0 AND c_acctbal <= 3000.0""".stripMargin))
      time("update: read back")(
        s.sql(s"SELECT c_custkey, c_acctbal FROM $ucat.default.$ut")
          .write.format("noop").mode("overwrite").save())

      // s_sql_alter_col phases
      val aroot = QueryFixtures.alterBase(s, d)
      val acat = QueryFixtures.sqlCatalog(s, aroot)
      val at = time("alter: clone")(QueryFixtures.cloneOf(s, aroot, "cust"))
      time("alter: RENAME COLUMN")(
        s.sql(s"ALTER TABLE $acat.default.$at RENAME COLUMN c_acctbal TO balance"))
      time("alter: DROP COLUMN")(
        s.sql(s"ALTER TABLE $acat.default.$at DROP COLUMN c_mktsegment"))
      time("alter: read back")(
        s.sql(s"SELECT c_custkey, balance FROM $acat.default.$at")
          .write.format("noop").mode("overwrite").save())

      // s_bucket_join phases
      val broot = QueryFixtures.bucketBase(s, d)
      val tc = time("bucket: clone cust")(QueryFixtures.cloneOf(s, broot, "cust"))
      val to = time("bucket: clone ord")(QueryFixtures.cloneOf(s, broot, "ord"))
      time("bucket: bucketTable cust")(
        graft.storage.TxnCatalog.bucketTable(s, broot, tc, "c_custkey", 16))
      time("bucket: bucketTable ord")(
        graft.storage.TxnCatalog.bucketTable(s, broot, to, "o_custkey", 16))
      time("bucket: join read")(
        graft.storage.GraftLake.table(s, broot, tc).get
          .join(graft.storage.GraftLake.table(s, broot, to).get,
            col("c_custkey") === col("o_custkey"))
          .groupBy("c_custkey").count()
          .write.format("noop").mode("overwrite").save())
    }
    s.stop()
  }
}
