package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints exactly ONE JSON line on stdout (everything else goes to stderr).
  *
  * Protocol (per round-1 verdict):
  *  - full materialization via a `noop`-format write — `.count()` lets
  *    Catalyst prune every computed column no filter consumes, so function
  *    batteries would measure scan+count, not expression evaluation;
  *  - `localCheckpoint` blocks (Dedup/Similarity subtree reuse) are
  *    unpersisted after every query, so earlier queries' blocks can't build
  *    memory pressure that skews later measurements;
  *  - SPARK_GRAFT_BENCH_ITERS iterations (default 3), per-query median
  *    reported — single cold runs conflate page-cache state with plan cost;
  *  - queries whose 3-iter median exceeds SLOW_THRESHOLD get 2 extra
  *    iterations (median of 5): the slow tail is exactly where run-to-run
  *    noise is largest relative to the round-over-round deltas being judged;
  *  - the JSON line carries the host's 1-min load average sampled before
  *    and after the run — numbers taken on a busy box are visibly suspect
  *    instead of silently wrong (round-2 verdict: a 2× driver-vs-builder
  *    gap traced to shared-box contention).
  */
object Bench {
  private val SlowThreshold = 2.0 // sec; above this, median of 5 not 3

  /** Default parallelism when SPARK_GRAFT_CPUS is unset — 32, matching the
    * driver's setting (BENCH_r02.json records cpus:32), so TimeQuery and an
    * env-less Bench run measure the same configuration the recorded numbers
    * were taken at. */
  val DefaultCpus = "32"

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", DefaultCpus)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val loadStart = loadAvg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM / whole-stage-codegen / shuffle warm-up on synthetic data (touches
    // no test tables) so the first timed query measures the engine, not
    // first-use infrastructure initialization.
    spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").count()

    def dropCheckpointBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    // SPARK_GRAFT_BENCH_WARMUP=N (default 0 — the driver protocol): N
    // per-query iterations run and DISCARDED before the measured ones, so
    // a pinned-JIT run can exclude first-compilation noise entirely. The
    // round-4/5 noise adjudications (x_connected_components, x_pagerank —
    // >25% driver deltas on untouched code, both traced to environment/JIT
    // variance) are the reason this knob exists: warm-up 2 makes the
    // per-query numbers plan-cost, not compile-state.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "0").toInt

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 (dev loop): time only these queries.
    // The driver never sets it, so recorded rounds are unaffected.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val times = names.map { name =>
      val fn = SparkEntry.queries(name)
      def sample(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        finally dropCheckpointBlocks()
        (System.nanoTime() - t0) / 1e9
      }
      def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
      (1 to warmup).foreach(_ => sample()) // discarded
      val base = Seq.fill(iters)(sample())
      val all =
        if (median(base) > SlowThreshold && iters < 5)
          base ++ Seq.fill(5 - iters)(sample())
        else base
      name -> median(all)
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = times.map(_._2).sum
    val loadEnd = loadAvg()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters,"warmup":$warmup,"load_avg_start":$loadStart,"load_avg_end":$loadEnd}""")
    spark.stop()
  }
}
