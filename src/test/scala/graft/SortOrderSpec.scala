package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.storage.TxnCatalog

/** Declared write sort order ([[TxnCatalog.SortColumnsProp]] /
  * [[TxnCatalog.SortModeProp]]): every new data commit sorts staged
  * rows at the publish chokepoint — local mode sorts within each file,
  * global mode range-partitions first so file ranges are disjoint;
  * reorganizations and internal entries pass through verbatim. */
class SortOrderSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  /** Shuffled (id, payload) frame over [lo, hi) in `slices` input
    * partitions — deterministic scramble, nothing pre-sorted. */
  private def scrambled(lo: Int, hi: Int, slices: Int = 4) =
    (lo until hi).map(i => ((i * 2654435761L) % 1000003, i.toLong))
      .toDF("scr", "id").repartition(slices, col("scr"))
      .select(col("id"), concat(lit("p"), col("id")).as("payload"))

  /** Per-file (min, max, sorted-within-file) over the table's rows. */
  private def fileFacts(root: String, table: String)
      : Seq[(String, Long, Long, Boolean)] = {
    val df = TxnCatalog.read(spark, root, table).get
      .select(col("id"),
        col("_metadata.file_path").as("f"),
        col("_metadata.row_index").as("pos"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("f").orderBy("pos")
    df.withColumn("prev", lag("id", 1).over(w))
      .groupBy("f")
      .agg(min("id").as("lo"), max("id").as("hi"),
        min(when(col("prev").isNull || col("prev") <= col("id"), 1L)
          .otherwise(0L)).as("sorted"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3) == 1L))
      .toSeq
  }

  test("local mode: every staged file is internally sorted") {
    val root = tmp("sortloc")
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "seed", Seq((0L, "p0")).toDF("id", "payload"))))
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.SortColumnsProp -> "id"))
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b1", scrambled(1, 4001))))
    val facts = fileFacts(root, "ev")
    assert(facts.forall(_._4), s"every file sorted by id: $facts")
    // content lossless
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 4001L)
  }

  test("global mode: file ranges are DISJOINT (footer-skipping shape)") {
    val root = tmp("sortglb")
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "seed", Seq((-1L, "p")).toDF("id", "payload"))))
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.SortColumnsProp -> "id",
        TxnCatalog.SortModeProp -> "global"))
    // AQE rightly folds a KB-scale range shuffle into one partition;
    // shrink its advisory size so this small fixture exhibits the
    // multi-file shape a real commit has
    val keys = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1k")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b1", scrambled(0, 8000, slices = 8))))
    finally saved.foreach { case (k, ov) =>
      ov.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    val b1 = fileFacts(root, "ev").filter(_._1.contains("/b1/"))
    assert(b1.forall(_._4), "each file sorted")
    assert(b1.size > 1, s"global sort split ${b1.size} file(s)")
    val ranges = b1.map(f => (f._2, f._3)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("reorganizations keep their own order; missing column skipped") {
    val root = tmp("sortreorg")
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b0", scrambled(0, 500, 2)),
        ("ev", "b1", scrambled(500, 1000, 2))))
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.SortColumnsProp -> "payload")) // sorts by payload
    // compaction (a reorg) must not crash and stays value-lossless
    TxnCatalog.compactPartitions(spark, root, "ev", Seq("b0", "b1"), "c")
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 1000L)
    // a frame MISSING the sort column commits unsorted, no error
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "extra", Seq(5000L, 4000L).toDF("id"))))
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 1002L)
  }

  test("bulk path (commitPartitioned) honors the declared sort order") {
    val root = tmp("sortbulk")
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "seed", Seq((0L, "p0", 0L)).toDF("id", "payload", "g"))))
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.SortColumnsProp -> "id"))
    // the O(1)-jobs bulk path writes the same kind of data files as
    // the publish loop — a backfill must not lose the sorted layout
    val rows = scrambled(1, 3001).withColumn("g", pmod(col("id"), lit(3)))
    TxnCatalog.commitPartitioned(spark, root, "ev", rows, "g",
      partPrefix = "bk.")
    val bulk = fileFacts(root, "ev").filter(!_._1.contains("/seed/"))
    assert(bulk.nonEmpty && bulk.forall(_._4),
      s"every bulk-staged file sorted by id: $bulk")
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 3001L)
  }

  test("bulk reorganizations (explicit dataTxn) stay exempt") {
    val root = tmp("sortbulkreorg")
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b0", scrambled(0, 400, 2).withColumn("g", lit(0L))),
        ("ev", "b1", scrambled(400, 800, 2).withColumn("g", lit(1L)))))
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.SortColumnsProp -> "payload"))
    // spec-aware compaction routes through the bulk path with a carried
    // dataTxn — it chose its own order, the declared sort must not
    // destroy it; value-lossless is the contract under test
    TxnCatalog.compactPartitionsBy(spark, root, "ev",
      Seq("b0", "b1"), col("g"), "g")
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 800L)
  }

  test("delete entries never sort (key lists, DVs pass verbatim)") {
    val root = tmp("sortdel")
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b0", scrambled(0, 100, 2))))
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.SortColumnsProp -> "id"))
    TxnCatalog.deleteKeys(spark, root, "ev", "id",
      Seq(7L, 3L, 11L).toDF("id"))
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 97L)
    TxnCatalog.deletePositions(spark, root, "ev", col("id") === 50L)
    assert(TxnCatalog.read(spark, root, "ev").get.count() === 96L)
  }
}
