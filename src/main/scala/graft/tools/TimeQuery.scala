package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries under the exact Bench protocol (noop-write
  * materialization, checkpoint unpersist, median of `iters`) without running
  * the other ~110 queries — the single-query perf loop.
  * Run: tools/run.sh graft.tools.TimeQuery <sfDir> <query> [query ...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.Bench.DefaultCpus)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").count() // same warm-up as Bench
    // SPARK_GRAFT_BENCH_WARMUP=N — discarded pre-iterations per query
    // (pinned-JIT protocol, same knob as Bench)
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "0").toInt
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def sample(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }
      (1 to warmup).foreach(_ => sample())
      val ts = Seq.fill(iters)(sample())
      println(f"$name%-28s median=${ts.sorted.apply(ts.length / 2)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
