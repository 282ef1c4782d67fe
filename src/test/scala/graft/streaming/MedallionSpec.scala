package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.storage.TxnCatalog

/** Lake→lake incremental pipelines (medallion): graft-lake source →
  * transform → [[Streams.lakeSink]] — exactly-once per hop, parity with
  * the batch transform, OPTIMIZE-tolerance on the bronze side, and
  * inline maintenance on the silver side. */
class MedallionSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def commitBronze(root: String, part: String, lo: Int, hi: Int): Unit =
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", part, (lo until hi)
        .map(i => (i.toLong, i % 7, i * 1.5)).toDF("id", "grp", "v"))),
      statsColumns = Seq("id"))

  /** The silver transform, one shape for batch and streaming. */
  private def refine(df: DataFrame): DataFrame =
    df.filter($"grp" =!= 3).withColumn("v2", $"v" * 2.0)

  private def silverStream(bronze: String, silver: String, ckpt: String,
      compactEvery: Int = 0) = {
    val in = spark.readStream.format("graft-lake")
      .option("root", bronze).option("table", "ev").load()
    Streams.lakeSink(refine(in), silver, "ev2", ckpt,
      compactEvery = compactEvery, statsColumns = Seq("id"))
  }

  test("writeStream.format(graft-lake): declarative medallion hop, exactly-once across restart") {
    val bronze = tmp("fmtb")
    val silver = tmp("fmts")
    val ckpt = tmp("fmtc")
    commitBronze(bronze, "b0", 0, 100)
    def run(): Unit = {
      val q = refine(spark.readStream.format("graft-lake")
          .option("root", bronze).option("table", "ev").load())
        .writeStream.format("graft-lake")
        .option("root", silver).option("table", "ev2")
        .option("statsColumns", "id")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(TxnCatalog.read(spark, silver, "ev2").get.count() ===
      refine(TxnCatalog.read(spark, bronze, "ev").get).count())
    // commits while the stream is down; restart resumes with no replay
    commitBronze(bronze, "b1", 100, 160)
    run()
    val got = TxnCatalog.read(spark, silver, "ev2").get
    val want = refine(TxnCatalog.read(spark, bronze, "ev").get)
    assert(got.collect().toSet === want.collect().toSet,
      "format-sink restart must be exactly-once (ledgered batch ids)")
    // stats threaded: the silver batches carry id stats for pruning
    val snap = TxnCatalog.snapshot(spark, silver).get
    assert(snap.partitions("ev2").exists(p =>
      snap.stats("ev2", p).contains("id")))
  }

  test("format sink inline compaction bounds batches; ledger keeps restart exactly-once") {
    val bronze = tmp("fmtcb")
    val silver = tmp("fmtcs")
    val ckpt = tmp("fmtcc")
    (0 until 5).foreach(i => commitBronze(bronze, s"b$i", i * 20, (i + 1) * 20))
    def run(): Unit = {
      val q = refine(spark.readStream.format("graft-lake")
          .option("root", bronze).option("table", "ev")
          .option("maxTxnsPerBatch", "1").load())
        .writeStream.format("graft-lake")
        .option("root", silver).option("table", "ev2")
        .option("statsColumns", "id")
        .option("compactEvery", "3")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val parts = TxnCatalog.partitions(spark, silver, "ev2")
    assert(parts.count(_.startsWith("batch=")) < 5,
      s"inline compaction must fold batches, got $parts")
    // restart after compaction folded the batch partitions: the LEDGER
    // is the replay evidence now — no duplicate silver rows
    commitBronze(bronze, "b5", 100, 120)
    run()
    val got = TxnCatalog.read(spark, silver, "ev2").get
    val want = refine(TxnCatalog.read(spark, bronze, "ev").get)
    assert(got.count() === want.count(),
      "exactly-once across restart + compaction (ledgered batch ids)")
    assert(got.collect().toSet === want.collect().toSet)
  }

  test("writeStream.format(graft-lake) Complete mode publishes whole-table aggregates") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lake = tmp("fmtagg")
    val ckpt = tmp("fmtaggc")
    val src = MemoryStream[(Long, Double)]
    val q = src.toDF().toDF("k", "v")
      .groupBy($"k").agg(sum($"v").as("total"))
      .writeStream.format("graft-lake")
      .option("root", lake).option("table", "agg")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      src.addData((1L, 1.0), (2L, 2.0)); q.processAllAvailable()
      src.addData((1L, 10.0)); q.processAllAvailable()
    } finally q.stop()
    val got = TxnCatalog.read(spark, lake, "agg").get.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 11.0), (2L, 2.0)),
      "Complete mode must hold exactly the latest aggregate snapshot")
  }

  test("bronze commits flow to silver exactly once, equal to the batch transform") {
    val bronze = tmp("medb")
    val silver = tmp("meds")
    val ckpt = tmp("medc")
    commitBronze(bronze, "b0", 0, 100)
    val q = silverStream(bronze, silver, ckpt)
    try {
      q.processAllAvailable()
      commitBronze(bronze, "b1", 100, 180)
      q.processAllAvailable()
      commitBronze(bronze, "b2", 180, 200)
      q.processAllAvailable()
    } finally q.stop()
    val got = TxnCatalog.read(spark, silver, "ev2").get
    val want = refine(TxnCatalog.read(spark, bronze, "ev").get)
    assert(got.count() === want.count())
    assert(got.collect().toSet === want.collect().toSet,
      "streamed silver must equal the batch transform of bronze")
  }

  test("refreshViews keeps a silver materialized view current per trigger") {
    val bronze = tmp("mvb")
    val silver = tmp("mvs")
    val ckpt = tmp("mvc")
    commitBronze(bronze, "b0", 0, 100)
    // bootstrap the silver table + its view before the stream starts
    TxnCatalog.commitPartitions(spark, silver,
      Seq(("ev2", "batch=boot",
        refine(TxnCatalog.read(spark, bronze, "ev").get).limit(0))),
      statsColumns = Seq("id"))
    graft.storage.MaterializedAgg.create(spark, silver, "grp_agg", "ev2",
      Seq("grp"), Seq(graft.storage.MaterializedAgg.AggSpec("count"),
        graft.storage.MaterializedAgg.AggSpec("sum", "v2")))
    val in = spark.readStream.format("graft-lake")
      .option("root", bronze).option("table", "ev").load()
    val q = Streams.lakeSink(refine(in), silver, "ev2", ckpt,
      statsColumns = Seq("id"), refreshViews = true)
    def viewMatches(): Unit = {
      val got = TxnCatalog.read(spark, silver, "grp_agg").get
        .orderBy("grp").collect()
      val want = TxnCatalog.read(spark, silver, "ev2").get
        .groupBy("grp").agg(count(lit(1)).as("cnt"),
          sum($"v2").as("sum_v2"))
        .orderBy("grp").collect()
      assert(got === want, "the view must track the silver table")
    }
    try {
      q.processAllAvailable()
      viewMatches()
      commitBronze(bronze, "b1", 100, 150)
      q.processAllAvailable()
      viewMatches()
      // the per-trigger refresh is the delta fold, not a recompute
      assert(graft.storage.MaterializedAgg
        .refresh(spark, silver, "grp_agg").mode === "noop",
        "the sink already refreshed — nothing left to fold")
    } finally q.stop()
  }

  test("an OPTIMIZE on bronze mid-stream adds zero duplicate silver rows") {
    val bronze = tmp("medob")
    val silver = tmp("medos")
    val ckpt = tmp("medoc")
    commitBronze(bronze, "b0", 0, 50)
    commitBronze(bronze, "b1", 50, 100)
    val q = silverStream(bronze, silver, ckpt)
    try {
      q.processAllAvailable()
      TxnCatalog.compactPartitions(spark, bronze, "ev", Seq("b0", "b1"),
        "fold0", statsColumns = Seq("id"))
      q.processAllAvailable()
      commitBronze(bronze, "b2", 100, 120)
      q.processAllAvailable()
    } finally q.stop()
    val got = TxnCatalog.read(spark, silver, "ev2").get
      .select("id").as[Long].collect().sorted
    assert(got === (0L until 120L).filterNot(_ % 7 == 3).toArray,
      "bronze reorganization must be invisible downstream")
  }

  test("checkpoint restart resumes the pipeline with no replay and no loss") {
    val bronze = tmp("medrb")
    val silver = tmp("medrs")
    val ckpt = tmp("medrc")
    commitBronze(bronze, "b0", 0, 60)
    def run(): Unit = {
      val q = silverStream(bronze, silver, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // bronze moves while the pipeline is down
    commitBronze(bronze, "b1", 60, 90)
    commitBronze(bronze, "b2", 90, 100)
    run()
    val got = TxnCatalog.read(spark, silver, "ev2").get
      .select("id").as[Long].collect().sorted
    assert(got === (0L until 100L).filterNot(_ % 7 == 3).toArray)
  }

  test("silver-side inline compaction keeps the batch count bounded") {
    val bronze = tmp("medfb")
    val silver = tmp("medfs")
    val ckpt = tmp("medfc")
    commitBronze(bronze, "b0", 0, 10)
    val q = silverStream(bronze, silver, ckpt, compactEvery = 3)
    try {
      q.processAllAvailable()
      for (k <- 1 to 5) {
        commitBronze(bronze, s"b$k", k * 10, k * 10 + 10)
        q.processAllAvailable()
      }
    } finally q.stop()
    val parts = TxnCatalog.partitions(spark, silver, "ev2")
    assert(parts.count(_.startsWith("batch=")) < 3,
      s"compaction must keep pending batches under the threshold: $parts")
    val got = TxnCatalog.read(spark, silver, "ev2").get
      .select("id").as[Long].collect().sorted
    assert(got === (0L until 60L).filterNot(_ % 7 == 3).toArray,
      "maintenance must never change the data")
  }
}
