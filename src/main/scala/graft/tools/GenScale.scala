package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: deterministically scale a TESTDATA sf directory by an integer
  * factor for out-of-band validation sweeps (the /root/testdata tree is
  * read-only and tops out at sf0.1). Run:
  * `tools/run.sh graft.tools.GenScale <inDir> <outDir> <replicas>`
  *
  * Each replica r ∈ [0, K) is an isomorphic copy of the source with every
  * key shifted by r·(maxKey+1) — foreign keys shift in lockstep, so join
  * cardinalities scale exactly linearly. Two content rules keep the
  * near-duplicate workloads honest at scale (a naive copy would make every
  * doc a 10-way cross-replica near-dup and blow pair outputs up
  * quadratically):
  *  - documents: replicas r > 0 PREFIX every word with `q<r>` — a
  *    bijection on the vocabulary, so each replica's internal
  *    shingle/minhash/edit structure is EXACTLY the source's, while
  *    cross-replica similarity drops to zero. The marker is alphanumeric
  *    and leading so BOTH tokenizers (space-split and the
  *    `[^a-z0-9']+` regex) keep one token per word — a non-alphanumeric
  *    suffix would split every word in the regex path, double the token
  *    stream, and silently halve the effective n of span-level operators
  *    (measured: 95% of shingles misclassified as cross-doc boilerplate);
  *  - embeddings: replicas r > 0 circularly permute the components by 7r —
  *    a rotation, so within-replica cosine geometry (clusters, near-dup
  *    pairs) is EXACTLY preserved and cross-replica similarity decorrelates.
  * Dimension tables (region, nation) keep their fixed cardinality.
  * Everything is a pure column transform of the source — same seed in,
  * same bytes out.
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GenScale <inDir> <outDir> <replicas>")
    val (in, out, k) = (args(0), args(1), args(2).toInt)
    require(k >= 1, "replicas must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Tables.events' NTZ→TIMESTAMP normalization is session-zone
      // dependent: pin UTC (as Verify/tests do) so the scaled corpus
      // embeds the same instants on any machine
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def src(t: String): DataFrame = spark.read.parquet(s"$in/$t.parquet")
    // TESTDATA layout is one parquet FILE per table (the DuckDB oracle
    // reads them as file paths): write a single part and rename it into
    // place
    def write(t: String, df: DataFrame): Unit = {
      val tmp = s"$out/.$t.tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val hp = new org.apache.hadoop.fs.Path(tmp)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(hp).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $t"))
      val dest = new org.apache.hadoop.fs.Path(s"$out/$t.parquet")
      if (fs.exists(dest)) fs.delete(dest, true)
      fs.rename(part, dest)
      fs.delete(hp, true)
      println(s"[genscale] $t: ${spark.read.parquet(dest.toString).count()} rows")
    }

    /** Union of K replicas of `df`, with `shift(r)` applied per replica. */
    def tiled(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(r => shift(df, r)).reduce(_ unionByName _)

    // fixed-cardinality dimensions: copy through
    write("region", src("region"))
    write("nation", src("nation"))

    val nCust = src("customer").agg(max("c_custkey")).head().getLong(0) + 1
    val nSupp = src("supplier").agg(max("s_suppkey")).head().getLong(0) + 1
    val nPart = src("part").agg(max("p_partkey")).head().getLong(0) + 1
    val nOrd = src("orders").agg(max("o_orderkey")).head().getLong(0) + 1
    val nEvent = src("events").agg(max("event_id")).head().getLong(0) + 1
    val nUser = src("events").agg(max("user_id")).head().getLong(0) + 1
    val nDoc = src("documents").agg(max("doc_id")).head().getLong(0) + 1
    val nVec = src("embeddings").agg(max("vec_id")).head().getLong(0) + 1
    // the near-dup query corpora place synthetic twins at doc_id+100000;
    // scaled ids must stay below that band to keep them disjoint
    require(nDoc * k <= 100000L,
      s"documents would overflow the +100000 twin band: ${nDoc * k}")

    write("customer", tiled(src("customer")) { (df, r) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(r * nCust))
    })
    write("supplier", tiled(src("supplier")) { (df, r) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(r * nSupp))
    })
    write("part", tiled(src("part")) { (df, r) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(r * nPart))
    })
    write("orders", tiled(src("orders")) { (df, r) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(r * nOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(r * nCust))
    })
    write("lineitem", tiled(src("lineitem")) { (df, r) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * nOrd))
        .withColumn("l_partkey", col("l_partkey") + lit(r * nPart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * nSupp))
    })
    // emit ts as session-zoned micros whatever the source layout (nanos,
    // NTZ micros, or micros) — Tables.events does exactly that
    // normalization, so reuse it rather than duplicating the type dispatch
    write("events", tiled(graft.Tables.events(spark, in)) { (df, r) =>
      df.withColumn("event_id", col("event_id") + lit(r * nEvent))
        .withColumn("user_id", col("user_id") + lit(r * nUser))
    })
    write("documents", tiled(src("documents")) { (df, r) =>
      val text =
        if (r == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), w => concat(lit(s"q$r"), w)),
          " ")
      df.withColumn("doc_id", col("doc_id") + lit(r * nDoc))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    write("embeddings", tiled(src("embeddings")) { (df, r) =>
      val emb =
        if (r == 0) col("embedding")
        else transform(
          sequence(lit(0), size(col("embedding")) - 1),
          i => element_at(col("embedding"),
            pmod(i + lit(7 * r), size(col("embedding"))) + 1))
      df.withColumn("vec_id", col("vec_id") + lit(r * nVec))
        .withColumn("embedding", emb)
    })

    spark.stop()
  }
}
