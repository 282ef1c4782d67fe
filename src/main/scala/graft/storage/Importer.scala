package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** ZERO-COPY ONBOARDING of existing parquet into the lake (Iceberg's
  * `add_files`, Delta's `CONVERT TO DELTA` — without rewriting or even
  * reading the data): each immediate child of the source directory
  * (a parquet file or a flat subdirectory) becomes one manifest entry
  * whose dir field is an EXTERNAL reference (`~ext:<absolute path>`),
  * committed in ONE conditional manifest txn. Nothing is copied,
  * nothing is scanned — onboarding 100 TB costs one directory listing,
  * one footer-level schema check, and one manifest CAS.
  *
  * After import the entries are ordinary lake citizens: reads resolve
  * them through [[TxnCatalog.entryPath]] like any `~ref:` entry,
  * `CALL system.analyze` backfills min/max stats and Blooms so
  * skipping works (the one pass that does read the data — optional,
  * prunability for a scan-everything workload isn't mandatory), and
  * OPTIMIZE/cluster rewrites fold them into owned storage whenever
  * maintenance decides to. [[TxnCatalog.vacuum]] NEVER deletes
  * external paths — the lake does not own them; dropping the last
  * reference simply forgets them.
  *
  * Refused shapes, all at planning cost (a directory listing):
  *  - hive-partitioned layouts (`key=value` subdirs): those files do
  *    not physically carry the partition column, and the lake's
  *    footer-union read contract requires self-contained files —
  *    materialize the column first (one rewrite) or import each leaf
  *    directory as its own table;
  *  - nested subdirectories below the first level (same contract);
  *  - schema conflicts with an existing table that the engine's
  *    width-tolerant footer merge cannot reconcile.
  */
object Importer {

  /** Import `sourcePath`'s parquet as table `table` (created if
    * absent, appended-by-reference if present). Returns the committed
    * txn and the number of entries added. */
  def addFiles(spark: SparkSession, root: String, table: String,
      sourcePath: String, attempts: Int = 5): (Long, Int) = {
    TxnCatalog.checkTableName(table)
    val hconf = spark.sparkContext.hadoopConfiguration
    val src = new Path(sourcePath)
    val fsys = src.getFileSystem(hconf)
    require(fsys.exists(src), s"no such path: $sourcePath")
    require(fsys.getFileStatus(src).isDirectory,
      s"$sourcePath is not a directory — point add_files at the " +
        "directory holding the parquet")
    val children = fsys.listStatus(src).toSeq
      .filterNot(_.getPath.getName.startsWith("."))
      .filterNot(_.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
    require(children.nonEmpty, s"$sourcePath is empty")
    children.foreach { st =>
      val n = st.getPath.getName
      require(!(st.isDirectory && n.contains("=")),
        s"'$n' looks hive-partitioned (key=value): those files do not " +
          "carry the partition column, which the lake's footer-union " +
          "read requires — materialize the column first, or import " +
          "each leaf directory as its own table")
      if (st.isDirectory) {
        val inner = fsys.listStatus(st.getPath).toSeq
          .filterNot(s => s.getPath.getName.startsWith(".") ||
            s.getPath.getName.startsWith("_"))
        require(inner.forall(_.isFile),
          s"'$n' has nested subdirectories — only one level of " +
            "grouping is importable by reference")
        require(inner.nonEmpty, s"'$n' is an empty directory")
      } else {
        require(n.endsWith(".parquet") || n.endsWith(".parq"),
          s"'$n' is not a parquet file")
      }
    }
    val childPaths = children.map(_.getPath.toUri.getPath)
    // ONE footer-level job: the merged schema of everything imported.
    // This is the only data the import touches — footers, not rows.
    val imported = spark.read
      .option("mergeSchema", "true").parquet(childPaths: _*).schema
    require(imported.nonEmpty, "imported files carry no columns")
    var attempt = 0
    while (true) {
      attempt += 1
      val cur = TxnCatalog.snapshot(spark, root)
      cur.filter(_.tables.contains(table)).foreach { snap =>
        require(!snap.entries.contains((table, TxnCatalog.Whole)),
          s"'$table' holds a whole-table snapshot; import needs a " +
            "partitioned table")
        val existing = GraftLake.schemaOf(spark, root, table, snap)
          .getOrElse(throw new IllegalStateException(
            s"cannot read schema of '$table'"))
        // same contract as an evolved append: the union of old and
        // imported footers must merge (width-tolerant); conflicts die
        // here, before anything is committed
        try TxnCatalog.widenMergeSchemas(existing, imported,
          new IllegalArgumentException(
            s"imported schema is incompatible with '$table' " +
              "(only numeric-widening clashes merge)"))
        catch {
          case e: IllegalArgumentException => throw e
          case e: Exception => throw new IllegalArgumentException(
            s"imported schema is incompatible with '$table': " +
              e.getMessage, e)
        }
        ()
      }
      val nextTxn = cur.map(_.txn).getOrElse(0L) + 1
      val taken: Set[String] = cur.toSeq
        .flatMap(_.partitions(table)).toSet
      val entries: Map[(String, String), TxnCatalog.Entry] =
        childPaths.zipWithIndex.map { case (p, i) =>
          // name carries the txn so repeated imports land beside each
          // other; collisions with existing names are re-suffixed
          var part = s"import$nextTxn.$i"
          while (taken.contains(part)) part = s"$part.x"
          (table, part) -> TxnCatalog.Entry(
            dir = TxnCatalog.ExtPrefix + p,
            dataTxn = Some(nextTxn))
        }.toMap
      try {
        val txn = TxnCatalog.publish(spark, root, Nil,
          statsColumns = Nil, drops = Nil,
          expectedTxn = Some(cur.map(_.txn).getOrElse(0L)),
          reconcile = carried => carried ++ entries)(() => ())
        return (txn, entries.size)
      } catch {
        case _: java.io.IOException if attempt < attempts =>
          Thread.sleep(attempt * 20L)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
