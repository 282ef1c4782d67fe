package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times the pieces of the near-dup pipelines so
  * regressions point at a stage, not a query. Run:
  * tools/run.sh graft.tools.Profile /root/testdata/sf0.1
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = Tables.documents(spark, d)
    val corpus = docs.select(col("doc_id"), lower(col("text")).as("text"))
      .union(docs.select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(lower(col("text")), "^[^ ]+ ", "").as("text")))

    time("corpus.count")(corpus.count())
    val sh = corpus.select(col("doc_id").as("__id"),
      Dedup.shingles(col("text"), 3).as("__sh")).filter(size(col("__sh")) > 0)
    time("shingles.count")(sh.count())
    val ex = sh.select(col("__id"), size(col("__sh")).as("__sz"),
      explode(col("__sh")).as("__s"))
    time("explode.count")(ex.count())
    val joined = ex.select(col("__s"), col("__id").as("ida"), col("__sz").as("__sza"))
      .join(ex.select(col("__s"), col("__id").as("idb"), col("__sz").as("__szb")), Seq("__s"))
      .filter(col("ida") < col("idb"))
    time("blockjoin.count")(joined.count())
    val grouped = joined.groupBy("ida", "idb")
      .agg(count(lit(1)).as("__cnt"), max("__sza").as("a"), max("__szb").as("b"))
    time("groupby.count")(grouped.count())
    time("full ngramJaccardPairs")(
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5).count())
    time("full minHashLshPairs")(
      Dedup.minHashLshPairs(corpus, "doc_id", "text", 3, 32, 16, 0.5).count())
    val sig = sh.withColumn("__sig", Dedup.minHashSignature(col("__sh"), 32))
    time("minhash signatures only")(sig.count())
    spark.stop()
  }
}
