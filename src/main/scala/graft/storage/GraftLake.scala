package graft.storage

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Catalyst-native reads over a [[TxnCatalog]] lake: `table` returns an
  * ORDINARY DataFrame whose scan is planned through the stock
  * `FileSourceScanExec` + vectorized parquet stack, with
  * [[ManifestFileIndex]] supplying the file listing — so every filter a
  * query pushes (`where`, SQL over a temp view, join pushdowns,
  * dynamic filters Catalyst derives) prunes partitions via the manifest
  * stats and Blooms automatically. `Snapshot.readWhere*` remain the
  * explicit-probe API; this is the same skipping with zero API
  * footprint: register the frame as a view and plain SQL gets
  * manifest pruning, exactly how Delta wires TahoeFileIndex under its
  * DataFrame reads.
  *
  * The frame pins the snapshot it was built from (listing and manifest
  * alike): concurrent commits never shift a running query, and reads
  * stay consistent across multiple actions on the same frame.
  */
object GraftLake {

  /** `table` at the CURRENT txn as a Catalyst-planned DataFrame; None
    * for an empty catalog or absent table. */
  def table(spark: SparkSession, root: String,
      table: String): Option[DataFrame] =
    TxnCatalog.snapshot(spark, root).flatMap(tableAt(spark, root, table, _))

  /** `table` at a PINNED snapshot (time travel composes: pass a
    * [[TxnCatalog.snapshotAt]] snapshot). */
  def tableAt(spark: SparkSession, root: String, table: String,
      snap: TxnCatalog.Snapshot): Option[DataFrame] = {
    val index = new ManifestFileIndex(spark, root, table, snap)
    if (index.totalFileCount == 0) None
    else {
      // merged footer schema — identical to Snapshot.read's view of the
      // table, so evolved partitions surface added columns as nulls
      val schema = snap.read(table).get.schema
      val relation = HadoopFsRelation(
        location = index,
        partitionSchema = StructType(Nil),
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat(),
        options = Map.empty)(spark)
      Some(GraftSqlBridge.ofRelation(spark, relation))
    }
  }

  /** The [[ManifestFileIndex]] behind a `table` read — the pruning
    * probe surface for tests and tooling (file counts under a filter). */
  def index(spark: SparkSession, root: String, table: String,
      snap: TxnCatalog.Snapshot): ManifestFileIndex =
    new ManifestFileIndex(spark, root, table, snap)
}
