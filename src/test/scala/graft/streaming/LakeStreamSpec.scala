package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.storage.TxnCatalog

/** [[graft.storage.LakeSourceProvider]]: the TxnCatalog lake as a
  * Structured Streaming source — txn offsets, exactly-once delivery,
  * OPTIMIZE invisibility, merge-on-read deletes, checkpoint restart.
  */
class LakeStreamSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def commitBatch(root: String, part: String, lo: Int, hi: Int): Unit =
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", part, (lo until hi).map(i => (i.toLong, s"e$i")).toDF("id", "name"))),
      statsColumns = Seq("id"))

  private def lakeStream(root: String, extra: (String, String)*): DataFrame = {
    val r = spark.readStream.format("graft-lake")
      .option("root", root).option("table", "ev")
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("initial load + per-commit micro-batches deliver each row exactly once") {
    val root = tmp("lssrc")
    commitBatch(root, "b0", 0, 100) // pre-existing data: the initial load
    val q = lakeStream(root).writeStream.format("memory")
      .queryName("ls_basic").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ls_basic").count() === 100L)
      commitBatch(root, "b1", 100, 150)
      q.processAllAvailable()
      commitBatch(root, "b2", 150, 200)
      q.processAllAvailable()
      val got = spark.table("ls_basic").select("id").as[Long].collect().sorted
      assert(got === (0L until 200L).toArray,
        "every committed row exactly once, no duplicates across batches")
    } finally q.stop()
  }

  test("OPTIMIZE between micro-batches delivers zero duplicate rows") {
    val root = tmp("lsopt")
    commitBatch(root, "b0", 0, 50)
    commitBatch(root, "b1", 50, 100)
    val q = lakeStream(root).writeStream.format("memory")
      .queryName("ls_opt").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ls_opt").count() === 100L)
      // reorganize: fold both batches into one partition (a new entry,
      // but dataTxn carries the max source txn — nothing new to deliver)
      TxnCatalog.compactPartitions(spark, root, "ev", Seq("b0", "b1"),
        "fold0", statsColumns = Seq("id"))
      q.processAllAvailable()
      assert(spark.table("ls_opt").count() === 100L,
        "compaction must be invisible to the stream")
      commitBatch(root, "b2", 100, 120)
      q.processAllAvailable()
      assert(spark.table("ls_opt").count() === 120L)
    } finally q.stop()
  }

  test("startingTxn skips the initial load (Delta's startingVersion)") {
    val root = tmp("lsstart")
    commitBatch(root, "b0", 0, 100)
    val startAt = TxnCatalog.currentTxn(spark, root).get
    val q = lakeStream(root, "startingTxn" -> startAt.toString)
      .writeStream.format("memory")
      .queryName("ls_start").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ls_start").count() === 0L)
      commitBatch(root, "b1", 100, 130)
      q.processAllAvailable()
      assert(spark.table("ls_start").select("id").as[Long].collect().sorted
        === (100L until 130L).toArray)
    } finally q.stop()
  }

  test("startingTimestamp starts at the first txn committed at/after it") {
    val root = tmp("lststamp")
    commitBatch(root, "b0", 0, 100)
    // a cutoff strictly between txn 1's commit and txn 2's: everything
    // from txn 2 on delivers, the initial load does not
    Thread.sleep(1100)
    val cutoff = java.time.Instant.now()
    Thread.sleep(1100)
    commitBatch(root, "b1", 100, 130)
    val q = lakeStream(root, "startingTimestamp" -> cutoff.toString)
      .writeStream.format("memory")
      .queryName("ls_stamp").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ls_stamp").select("id").as[Long].collect().sorted
        === (100L until 130L).toArray,
        "only txns committed after the cutoff deliver")
    } finally q.stop()
    // both start options together refuse
    val err = intercept[Exception] {
      lakeStream(root, "startingTimestamp" -> cutoff.toString,
        "startingTxn" -> "1")
        .writeStream.format("memory").queryName("ls_stamp2")
        .outputMode("append").start().processAllAvailable()
    }
    assert(err.getMessage != null)
  }

  test("maxTxnsPerBatch paces a backlog into bounded micro-batches") {
    val root = tmp("lspace")
    commitBatch(root, "b0", 0, 30)
    commitBatch(root, "b1", 30, 60)
    commitBatch(root, "b2", 60, 90) // 3-txn backlog before the stream starts
    val q = lakeStream(root, "maxTxnsPerBatch" -> "1")
      .writeStream.format("memory")
      .queryName("ls_pace").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ls_pace").select("id").as[Long].collect().sorted
        === (0L until 90L).toArray, "the full backlog must drain")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3,
        s"a 3-txn backlog under cap 1 must take >= 3 data batches, " +
          s"took $dataBatches")
      assert(q.recentProgress.filter(_.numInputRows > 0)
        .forall(_.numInputRows <= 30L),
        "no micro-batch may exceed one txn's rows")
    } finally q.stop()
  }

  test("merge-on-read delete masks undelivered rows in the same window") {
    val root = tmp("lsdel")
    commitBatch(root, "b0", 0, 100)
    TxnCatalog.deleteKeys(spark, root, "ev", "id", Seq(7L, 42L).toDF("id"))
    val q = lakeStream(root).writeStream.format("memory")
      .queryName("ls_del").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ls_del").select("id").as[Long].collect().sorted
      assert(got === (0L until 100L).filterNot(Set(7L, 42L)).toArray,
        "rows deleted before delivery must never appear")
    } finally q.stop()
  }

  test("maxRowsPerBatch budgets micro-batches by rows; an oversized txn still lands") {
    val root = tmp("lsrows")
    commitBatch(root, "b0", 0, 30)
    commitBatch(root, "b1", 30, 60)
    commitBatch(root, "b2", 60, 90)
    commitBatch(root, "b3", 90, 120)
    commitBatch(root, "big", 200, 400) // 200 rows — alone over any 60-budget
    val q = lakeStream(root, "maxRowsPerBatch" -> "60")
      .writeStream.format("memory")
      .queryName("ls_rows").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ls_rows").select("id").as[Long].collect().sorted
        === ((0L until 120L) ++ (200L until 400L)).toArray,
        "every committed row exactly once under the row budget")
      val data = q.recentProgress.filter(_.numInputRows > 0)
      assert(data.length >= 3, s"the backlog must split, got ${data.length}")
      assert(data.forall(p => p.numInputRows <= 60L || p.numInputRows == 200L),
        "every batch within budget except the single oversized txn " +
          s"(at-least-one-txn progress): ${data.map(_.numInputRows).toSeq}")
      assert(data.exists(_.numInputRows == 200L),
        "the oversized txn must deliver alone, not wedge the stream")
    } finally q.stop()
  }

  test("maxBytesPerBatch budgets micro-batches by recorded entry bytes") {
    val root = tmp("lsbytes")
    (0 until 4).foreach(b => commitBatch(root, s"b$b", b * 30, (b + 1) * 30))
    // every entry's physical size was recorded at commit
    val snap = TxnCatalog.snapshot(spark, root).get
    val sizes = snap.entrySizes("ev").map(_._3)
    assert(sizes.forall(_.isDefined),
      "commitPartitions must record entry bytes")
    val one = sizes.head.get
    // budget fits TWO same-sized txns per batch → the 4-txn backlog
    // drains in 2 batches, every row exactly once
    val q = lakeStream(root, "maxBytesPerBatch" -> (one * 2).toString)
      .writeStream.format("memory")
      .queryName("ls_bytes").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ls_bytes").select("id").as[Long].collect().sorted
        === (0L until 120L).toArray)
      val data = q.recentProgress.filter(_.numInputRows > 0)
      assert(data.length >= 2, s"the backlog must split: ${data.length}")
      assert(data.forall(_.numInputRows <= 60L),
        s"two 30-row txns per byte budget: ${data.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the whole backlog in capped batches, then stops") {
    val root = tmp("lsavnow")
    commitBatch(root, "b0", 0, 30)
    commitBatch(root, "b1", 30, 60)
    commitBatch(root, "b2", 60, 90)
    commitBatch(root, "b3", 90, 120) // 4-txn backlog before the stream starts
    val q = lakeStream(root, "maxTxnsPerBatch" -> "1")
      .writeStream.format("memory").queryName("ls_avnow")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000L),
        "AvailableNow must stop by itself once the backlog is drained")
      assert(spark.table("ls_avnow").select("id").as[Long].collect().sorted
        === (0L until 120L).toArray,
        "the WHOLE backlog drains — not one rate-limited increment " +
          "(the v1-wrapper behavior this source's admission control " +
          "exists to avoid)")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 4,
        s"a 4-txn backlog under cap 1 must take >= 4 bounded " +
          s"micro-batches, took $dataBatches")
      assert(q.recentProgress.filter(_.numInputRows > 0)
        .forall(_.numInputRows <= 30L),
        "no micro-batch may exceed one txn's rows")
    } finally q.stop()
  }

  test("AvailableNow restart picks up only what landed since — the nightly hop") {
    val root = tmp("lsavrestart")
    val ckpt = tmp("lsavckpt")
    val out = tmp("lsavout")
    commitBatch(root, "b0", 0, 40)
    commitBatch(root, "b1", 40, 60)
    def runOnce(): Unit = {
      val q = lakeStream(root, "maxTxnsPerBatch" -> "1")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(120000L)) finally q.stop()
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 60L)
    commitBatch(root, "b2", 60, 90) // lands while the job is DOWN
    runOnce()
    val got = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(got === (0L until 90L).toArray,
      "the second run delivers exactly the new txns — no replay, no loss")
  }

  test("checkpoint restart resumes from the committed txn offset") {
    val root = tmp("lsckpt")
    val ckpt = tmp("lsckptdir")
    val out = tmp("lsckptout")
    commitBatch(root, "b0", 0, 60)
    def run(): Unit = {
      val q = lakeStream(root).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() === 60L)
    // commits while the stream is DOWN
    commitBatch(root, "b1", 60, 90)
    commitBatch(root, "b2", 90, 100)
    run()
    // the recovered query resumes at the checkpointed txn: the sink ends
    // with every committed row exactly once — no replay, no loss
    val got = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(got === (0L until 100L).toArray,
      "restart must resume at the checkpointed txn — no replay, no loss")
  }

  test("pushed filters reach the per-batch relation: micro-batch scans prune at the manifest") {
    val root = tmp("lsplan")
    // ten disjoint-keyed partitions in ONE commit — a single micro-batch
    // delivers all ten entries, and a filter touching one key range must
    // list only the overlapping partitions, not all ten
    TxnCatalog.commitPartitions(spark, root,
      (0 until 10).map(k => ("ev", s"b=$k",
        (k * 10 until (k + 1) * 10).map(i => (i.toLong, s"e$i")).toDF("id", "name"))),
      statsColumns = Seq("id"))
    val q = lakeStream(root)
      .filter($"id" >= 95L) // overlaps only b=9
      .writeStream.format("memory").queryName("planq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("planq").count() === 5L)
      val scans = org.apache.spark.sql.GraftSqlBridge.lastExecutedPlan(q)
        .collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location
        }
        .collect { case idx: graft.storage.ManifestFileIndex => idx }
      assert(scans.nonEmpty, "micro-batch scan must plan through the manifest index")
      val idx = scans.head
      assert(idx.partitionCount === 10)
      assert(idx.listedPartitionCount === 1,
        s"filter should prune to 1 of 10 partitions at the manifest, " +
          s"listed ${idx.listedPartitionCount}")
    } finally q.stop()
  }

  test("readChangeFeed streams CDC equal to the batch change feed, incrementally") {
    val root = tmp("lscdc")
    import org.apache.spark.sql.Row
    // a history with all three event kinds: inserts, equality deletes,
    // a re-insert — then an OPTIMIZE that must stay silent
    commitBatch(root, "b0", 0, 40)                                  // txn 1
    commitBatch(root, "b1", 40, 60)                                 // txn 2
    TxnCatalog.deleteKeys(spark, root, "ev", "id",
      (0 until 5).map(i => Tuple1(i.toLong)).toDF("id"))            // txn 3
    commitBatch(root, "re", 0, 2)                                   // txn 4
    TxnCatalog.compactPartitions(spark, root, "ev",
      TxnCatalog.partitions(spark, root, "ev"), "cX")               // txn 5
    def batchFeed(): Set[Row] =
      TxnCatalog.changeFeed(spark, root, "ev", 0,
        TxnCatalog.currentTxn(spark, root).get).get.collect().toSet
    val q = lakeStream(root, "readChangeFeed" -> "true")
      .writeStream.format("memory").queryName("cdcq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdcq").collect().toSet === batchFeed(),
        "streamed CDC must equal the batch change feed over the same range")
      // stream stays incremental: a new delete + insert arrive as events
      TxnCatalog.deleteKeys(spark, root, "ev", "id",
        Seq(Tuple1(50L)).toDF("id"))                                // txn 6
      commitBatch(root, "b2", 60, 70)                               // txn 7
      q.processAllAvailable()
      assert(spark.table("cdcq").collect().toSet === batchFeed(),
        "incremental CDC micro-batches must extend to the same feed")
      val types = spark.table("cdcq").select("_change_type")
        .distinct().as[String].collect().toSet
      assert(types === Set("insert", "delete"))
    } finally q.stop()
  }

  test("capped source resumes the admission cap from the recovery replay, not startingTxn") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = tmp("lsfloor")
    (0 until 10).foreach(k => commitBatch(root, s"b$k", k * 10, k * 10 + 10))
    val schema = TxnCatalog.read(spark, root, "ev").get.schema
    val src = new graft.storage.LakeStreamSource(spark, root, "ev",
      schema, startingTxn = 0L, maxTxnsPerBatch = 1L)
    // checkpoint restart: the engine replays the committed range first —
    // here (8, 9]. getOffset must then propose (9+1]=10, NOT 0+1=1:
    // proposing pre-checkpoint txns re-reads snapshots that vacuum may
    // have trimmed, failing the stream permanently instead of catching up
    src.getBatch(Some(LongOffset(8L)), LongOffset(9L)) // recovery replay
    assert(src.getOffset === Some(LongOffset(10L)),
      "the cap must resume from the committed offset after restart")
  }

  test("streaming aggregation over the lake source stays correct across commits") {
    val root = tmp("lsagg")
    commitBatch(root, "b0", 0, 100)
    val counts = lakeStream(root)
      .withColumn("bucket", pmod($"id", lit(3)))
      .groupBy("bucket").count()
    val q = counts.writeStream.format("memory")
      .queryName("ls_agg").outputMode("complete").start()
    try {
      q.processAllAvailable()
      commitBatch(root, "b1", 100, 200)
      q.processAllAvailable()
      val got = spark.table("ls_agg").as[(Long, Long)].collect().toMap
      assert(got === Map(0L -> 67L, 1L -> 67L, 2L -> 66L),
        "stateful aggregation must fold both micro-batches")
    } finally q.stop()
  }
}
