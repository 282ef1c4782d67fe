package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.storage.TxnCatalog

/** [[TxnCatalog.ParquetBloomColumnsProp]]: declared columns get parquet
  * row-group bloom filters in every new data file — the file-grain
  * complement to manifest Blooms; delete entries stay bloom-free. */
class ParquetBloomSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  /** Whether the first row group of `file` carries a bloom filter for
    * `column` (parquet footer metadata, no data read). */
  private def hasBloom(file: String, column: String): Boolean = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new Path(file), new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getBlocks.asScala.headOption.exists(
      _.getColumns.asScala.exists(c => c.getPath.toDotString == column &&
        c.getBloomFilterOffset >= 0))
    finally r.close()
  }

  private def dataFiles(root: String, table: String): Seq[String] =
    TxnCatalog.read(spark, root, table).get
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0).stripPrefix("file:")).toSeq

  test("declared column blooms every data file; lookups stay exact") {
    val root = tmp("pqbloom")
    TxnCatalog.createTableWithProperties(spark, root, "ev", "b0",
      (0 until 2000).map(i => (i.toLong, s"h$i")).toDF("id", "h"),
      Map(TxnCatalog.ParquetBloomColumnsProp -> "h"))
    TxnCatalog.commitPartitions(spark, root, Seq(("ev", "b1",
      (2000 until 4000).map(i => (i.toLong, s"h$i")).toDF("id", "h"))))
    val files = dataFiles(root, "ev")
    // the birth batch predates the property txn's visibility to the
    // SAME publish only for prevManifest-read props — create commits
    // props and data in one txn, so check post-create files
    val b1 = files.filter(_.contains("/b1/"))
    assert(b1.nonEmpty && b1.forall(hasBloom(_, "h")),
      s"b1 files bloom 'h': $b1")
    assert(b1.forall(!hasBloom(_, "id")), "undeclared column: no bloom")
    assert(TxnCatalog.read(spark, root, "ev").get
      .filter(col("h") === "h3123").count() === 1L)
  }

  test("no property, no bloom; DV payloads never bloom") {
    val root = tmp("pqbloomneg")
    TxnCatalog.commitPartitions(spark, root, Seq(("ev", "b0",
      (0 until 100).map(i => (i.toLong, s"h$i")).toDF("id", "h"))))
    assert(dataFiles(root, "ev").forall(!hasBloom(_, "h")))
    // now declare the column and delete positionally: the DV entry
    // carries full payload rows but must NOT get file blooms
    TxnCatalog.setTableProperties(spark, root, "ev",
      Map(TxnCatalog.ParquetBloomColumnsProp -> "h"))
    TxnCatalog.deletePositions(spark, root, "ev", col("id") === 7L)
    val snap = TxnCatalog.snapshot(spark, root).get
    val dvPaths = snap.deleteEntries("ev").map(_._4)
    assert(dvPaths.nonEmpty)
    val dvFiles = dvPaths.flatMap { dir =>
      new java.io.File(dir).listFiles().toSeq
        .map(_.getAbsolutePath).filter(_.endsWith(".parquet"))
    }
    assert(dvFiles.nonEmpty && dvFiles.forall(!hasBloom(_, "h")),
      "DV payload files carry no bloom (deleted values must not leak)")
  }

  test("bulk path (commitPartitioned) writes declared blooms") {
    val root = tmp("pqbloomblk")
    TxnCatalog.createTableWithProperties(spark, root, "ev", "b0",
      (0 until 100).map(i => (i.toLong, s"h$i", i % 3L))
        .toDF("id", "h", "g"),
      Map(TxnCatalog.ParquetBloomColumnsProp -> "h"))
    TxnCatalog.commitPartitioned(spark, root, "ev",
      (100 until 1100).map(i => (i.toLong, s"h$i", i % 3L))
        .toDF("id", "h", "g"),
      "g", partPrefix = "bk.")
    val bulk = dataFiles(root, "ev").filter(!_.contains("/b0/"))
    assert(bulk.nonEmpty && bulk.forall(hasBloom(_, "h")),
      s"bulk-staged files bloom 'h': $bulk")
    assert(bulk.forall(!hasBloom(_, "id")), "undeclared column: no bloom")
  }

  test("compaction keeps blooming (reorgs write blooms too)") {
    val root = tmp("pqbloomc")
    TxnCatalog.createTableWithProperties(spark, root, "ev", "b0",
      (0 until 500).map(i => (i.toLong, s"h$i")).toDF("id", "h"),
      Map(TxnCatalog.ParquetBloomColumnsProp -> "h"))
    TxnCatalog.commitPartitions(spark, root, Seq(("ev", "b1",
      (500 until 1000).map(i => (i.toLong, s"h$i")).toDF("id", "h"))))
    TxnCatalog.compactPartitions(spark, root, "ev", Seq("b0", "b1"), "c")
    val files = dataFiles(root, "ev")
    assert(files.nonEmpty && files.forall(hasBloom(_, "h")),
      s"compacted files keep blooms: $files")
  }
}
