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
    * [[TxnCatalog.snapshotAt]] snapshot). Pending equality deletes
    * ([[TxnCatalog.deleteKeys]]) apply here too: data entries group by
    * their applicable-delete set, each group plans through its own
    * manifest-pruned relation and anti-joins only the key lists that
    * apply to it, and the groups union by name — filters over the
    * result still reach each group's FileSourceScanExec (Catalyst
    * pushes through union and anti-join), so skipping survives
    * merge-on-read. */
  /** Merged footer schema of `table` at `snap`, CACHED per
    * (root, table, txn): a committed txn's schema is immutable, and the
    * merge otherwise opens every partition's footers — paying that once
    * per txn instead of twice per SQL statement (analysis + scan) is
    * the difference at 10k partitions. None if the table is absent. */
  def schemaOf(spark: SparkSession, root: String, table: String,
      snap: TxnCatalog.Snapshot): Option[StructType] = {
    val key = (root, table, snap.txn)
    Option(schemaCache.get(key)).orElse {
      val s = snap.read(table).map(_.schema)
      s.foreach { st =>
        if (schemaCache.size > 4096) schemaCache.clear() // bounded
        schemaCache.put(key, st)
      }
      s
    }
  }

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long), StructType]()

  /** The `BucketSpec` `table`'s CURRENT layout supports, or None. A
    * bucketed layout ([[TxnCatalog.bucketTable]]) is claimed only while
    * EVERY live data entry still comes from the bucketing rewrite's own
    * txn — one later append or partition rewrite and the claim is
    * dropped (plans regain their shuffle, stay correct) until the next
    * rewrite. Cached per (root, table, txn): a committed txn's layout
    * is immutable. */
  private[storage] def bucketSpecOf(spark: SparkSession, root: String,
      table: String, snap: TxnCatalog.Snapshot, schema: StructType)
      : Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] = {
    val key = (root, table, snap.txn)
    Option(bucketCache.get(key)).getOrElse {
      val props = snap.properties(table)
      val spec = for {
        c <- props.get(TxnCatalog.BucketColumnProp)
        n <- props.get(TxnCatalog.BucketCountProp).flatMap(_.toIntOption)
        bt <- props.get(TxnCatalog.BucketTxnProp).flatMap(_.toLongOption)
        if schema.fieldNames.contains(c)
        entries = snap.dataEntries(table)
        if entries.nonEmpty && entries.forall { case (_, e) =>
          e.dir.stripPrefix("v=").takeWhile(_ != '.').toLongOption
            .contains(bt)
        }
      } yield org.apache.spark.sql.catalyst.catalog.BucketSpec(
        n, Seq(c),
        // declare per-bucket sort order only when the rewrite recorded
        // it (one file per bucket — the shape Spark requires)
        if (props.get(TxnCatalog.BucketSortedProp).contains("true")) Seq(c)
        else Nil)
      if (bucketCache.size > 4096) bucketCache.clear() // bounded
      bucketCache.put(key, spec)
      spec
    }
  }

  private val bucketCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Long),
    Option[org.apache.spark.sql.catalyst.catalog.BucketSpec]]()

  def tableAt(spark: SparkSession, root: String, table: String,
      snap: TxnCatalog.Snapshot): Option[DataFrame] = {
    val data = snap.dataEntries(table)
    if (data.isEmpty) return None
    // merged footer schema — identical to Snapshot.read's view of the
    // table, so evolved partitions surface added columns as nulls
    val schema = schemaOf(spark, root, table, snap).get
    val bucket = bucketSpecOf(spark, root, table, snap, schema)
    composedRead(spark, root, table, snap, data, schema,
      streaming = false, bucket = bucket)
  }

  /** The hive/plain split shared by batch reads ([[tableAt]]) and the
    * streaming source's `getBatch`: HIVE-IMPORTED entries (files that
    * do not physically carry their partition columns —
    * [[TxnCatalog.extHiveDepth]]) plan through a relation whose
    * [[ManifestFileIndex]] synthesizes the declared partition columns
    * per entry (Spark appends them as constant partition values, and
    * `listFiles` prunes on them exactly); everything else keeps the
    * plain relation, whose merged schema surfaces not-yet-materialized
    * partition columns as nulls (or real values once a rewrite
    * materializes them). Each side composes its merge-on-read deletes
    * independently; the union is by name so the split is invisible. */
  private[storage] def composedRead(spark: SparkSession, root: String,
      table: String, snap: TxnCatalog.Snapshot,
      data: Seq[(String, TxnCatalog.Entry)],
      schema: org.apache.spark.sql.types.StructType, streaming: Boolean,
      bucket: Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] =
        None): Option[DataFrame] = {
    import org.apache.spark.sql.types.{StructField, StructType}
    // ADD COLUMN ... DEFAULT: entries predating the alter group per
    // applicable fill set and coalesce the exists-default ABOVE their
    // scan (before deletes — mirrors the direct-read stack exactly)
    val eds = snap.existsDefaults(table)
    def edsFor(e: TxnCatalog.Entry) =
      eds.filter { case (_, txn, _, _) => TxnCatalog.entryDataTxn(e) < txn }
    val edGroups = data.groupBy(d => edsFor(d._2).map(_._1).mkString(","))
      .toSeq.sortBy(_._1)
    val frames = edGroups.flatMap { case (_, es) =>
      val fills = edsFor(es.head._2)
      def filled(df: DataFrame): DataFrame =
        TxnCatalog.fillExistsDefaults(df, fills)
      val (hive, plain) = es.partition { case (_, e) =>
        TxnCatalog.extHiveDepth(e.dir) > 0 }
      val plainFrame = composeWithDeletes(spark, snap, table, plain,
        parts => relationFrame(spark, root, table, snap, parts, schema,
          streaming = streaming, bucket = bucket).map(filled))
      val hiveFrame =
        if (hive.isEmpty) None
        else {
          val hiveCols = TxnCatalog.hivePartCols(snap.properties(table))
          val partSchema = StructType(hiveCols.map { case (n, dt) =>
            StructField(n, dt, nullable = true) })
          val dataSchema = StructType(
            schema.filterNot(f => hiveCols.exists(_._1 == f.name)))
          composeWithDeletes(spark, snap, table, hive,
            parts => relationFrame(spark, root, table, snap, parts,
              dataSchema, streaming = streaming,
              partSchema = partSchema).map(filled))
        }
      Seq(plainFrame, hiveFrame).flatten
    }
    frames.reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  /** A Catalyst-planned frame over a PARTITION SUBSET of `table`: one
    * [[ManifestFileIndex]]-backed HadoopFsRelation (stock parquet scan
    * stack, manifest pruning under `listFiles`). `streaming = true`
    * marks the relation's plan streaming — the shape a v1 streaming
    * Source's `getBatch` must return. None when the subset holds no
    * files. */
  private[storage] def relationFrame(spark: SparkSession, root: String,
      table: String, snap: TxnCatalog.Snapshot, parts: Set[String],
      schema: StructType, streaming: Boolean,
      bucket: Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] =
        None,
      partSchema: StructType = StructType(Nil)): Option[DataFrame] = {
    val index = new ManifestFileIndex(spark, root, table, snap,
      only = Some(parts), dataSchema = Some(schema),
      partSchema = partSchema)
    // manifest-level emptiness check — file listing stays lazy; an
    // entry whose dir holds no parquet files simply scans empty
    if (index.partitionCount == 0) None
    else {
      val relation = HadoopFsRelation(
        location = index,
        partitionSchema = partSchema,
        dataSchema = schema,
        bucketSpec = bucket,
        fileFormat = new ParquetFileFormat(),
        options = Map.empty)(spark)
      Some(
        if (streaming) GraftSqlBridge.ofStreamingRelation(spark, relation)
        else GraftSqlBridge.ofRelation(spark, relation))
    }
  }

  /** Merge-on-read composition shared by batch and streaming reads:
    * group `data` entries by their applicable-delete set, build each
    * group's frame via `frameFor`, anti-join exactly the key lists that
    * apply to it, union the groups by name. Mirrors
    * `Snapshot.readSelected`'s semantics on Catalyst-planned frames. */
  private[storage] def composeWithDeletes(spark: SparkSession,
      snap: TxnCatalog.Snapshot, table: String,
      data: Seq[(String, TxnCatalog.Entry)],
      frameFor: Set[String] => Option[DataFrame]): Option[DataFrame] = {
    if (data.isEmpty) return None
    val dels = snap.deleteEntries(table)
    if (dels.isEmpty) frameFor(data.map(_._1).toSet)
    else {
      val groups = data.groupBy { case (_, e) =>
        dels.collect { case (_, txn, _, _)
          if txn > TxnCatalog.entryDataTxn(e) => txn }.toSet
      }
      val frames = groups.toSeq.sortBy(_._1.toSeq.sorted.mkString(","))
        .flatMap { case (applicable, es) =>
          frameFor(es.map(_._1).toSet).map { df =>
            TxnCatalog.applyDeleteEntries(spark, df,
              dels.filter(d => applicable(d._2)))
          }
        }
      frames.reduceOption(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /** `table` pinned at committed txn `txn` — time travel composed with
    * the Catalyst-planned read (skipping, merge-on-read, the works). */
  def tableAsOf(spark: SparkSession, root: String, table: String,
      txn: Long): Option[DataFrame] =
    tableAt(spark, root, table, TxnCatalog.snapshotAt(spark, root, txn))

  /** Register every table of the CURRENT snapshot as a temp view
    * `<prefix><table>`, all pinned at ONE txn — plain `spark.sql` over
    * the whole lake, consistent across tables, with manifest skipping
    * under every scan. Returns the registered view names. */
  def registerViews(spark: SparkSession, root: String,
      prefix: String = ""): Seq[String] =
    TxnCatalog.snapshot(spark, root).toSeq.flatMap { snap =>
      snap.tables.flatMap { t =>
        tableAt(spark, root, t, snap).map { df =>
          val name = prefix + t
          df.createOrReplaceTempView(name)
          name
        }
      }
    }

  /** The [[ManifestFileIndex]] behind a `table` read — the pruning
    * probe surface for tests and tooling (file counts under a filter). */
  def index(spark: SparkSession, root: String, table: String,
      snap: TxnCatalog.Snapshot): ManifestFileIndex =
    new ManifestFileIndex(spark, root, table, snap)
}
