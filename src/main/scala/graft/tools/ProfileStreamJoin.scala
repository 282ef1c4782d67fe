package graft.tools

import graft.{Bench, Tables}
import graft.queries.QueryFixtures
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-loop profiler for the streaming bench block (`st_stream_join` et
  * al.): wall-clocks each phase of the query (fixture copy, stream
  * start, per-processAllAvailable round, mid-stream commits, final
  * sort) and dumps Spark's own per-trigger durationMs breakdown
  * (addBatch / getBatch / walCommit / stateStore commit) via a
  * StreamingQueryListener. Not part of the bench protocol — run with
  * `sbt "runMain graft.tools.ProfileStreamJoin"`. */
object ProfileStreamJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Bench.DefaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").count()

    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        progress.add(s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
            s"rows=${s.numRowsTotal} commitMs=${s.commitTimeMs} memUsed=${s.memoryUsedBytes}").mkString("|")}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"  [phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    (1 to iters).foreach { it =>
      System.err.println(s"=== iteration $it ===")
      progress.clear()
      val total0 = System.nanoTime()
      val bronze = t("linkCopy fixture") {
        QueryFixtures.linkCopy(QueryFixtures.bronzeEventsTemplate(spark, sfDir))
      }
      val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
      def commit(k: Int): Unit =
        graft.storage.TxnCatalog.commitPartitions(spark, bronze,
          Seq(("ev", s"b$k", ev.filter(pmod(col("event_id"), lit(3)) === k))),
          statsColumns = Seq("event_id"))
      def src() = spark.readStream.format("graft-lake")
        .option("root", bronze).option("table", "ev").load()
      val left = src().filter(pmod(col("event_id"), lit(100)) === 0)
        .select(col("event_id").as("l_id"), col("user_id"))
      val right = src()
        .select(col("event_id").as("r_id"), col("user_id"), col("value"))
      val name = "q_profile_stream_join_sink"
      spark.catalog.dropTempView(name)
      val shufOverride = sys.env.get("PROFILE_STREAM_SHUFFLE")
      val ckptShm = sys.env.get("PROFILE_CKPT_SHM").exists(_.toBoolean)
      val q = t("start stream") {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        shufOverride.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
        try {
          var w = left.join(right, "user_id")
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
          if (ckptShm) w = w.option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(
              java.nio.file.Paths.get("/dev/shm"), "q_ckpt").toString)
          w.start()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
      try {
        t("processAllAvailable #1")(q.processAllAvailable())
        t("commit(1)")(commit(1))
        t("processAllAvailable #2")(q.processAllAvailable())
        t("commit(2)")(commit(2))
        t("processAllAvailable #3")(q.processAllAvailable())
      } finally t("stop")(q.stop())
      t("final sort + noop write") {
        spark.table(name).select("l_id", "user_id", "r_id", "value")
          .orderBy("l_id", "user_id", "r_id", "value")
          .write.format("noop").mode("overwrite").save()
      }
      System.err.println(f"  [total] ${(System.nanoTime() - total0) / 1e9}%8.3f s")
      Thread.sleep(200) // let listener events drain
      progress.forEach(p => System.err.println(s"  [trigger] $p"))
    }
    spark.stop()
  }
}
