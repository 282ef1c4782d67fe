package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table snapshot transactions over bare Parquet — the last gap
  * between [[VersionedTable]] (single-table snapshot overwrites) and a
  * real table format: a writer that must update SEVERAL tables so that
  * readers see either all of the new versions or none of them (the
  * reference's catalog + lineage pair updated inside one MySQL
  * transaction, `mysql_process.py:53-56` and `:83-91`, is exactly this
  * shape).
  *
  * Manifest entries are PARTITION-grain: the key is (table, partition),
  * where unpartitioned catalog tables use the reserved whole-table
  * partition `-`. This is what makes the protocol 100 TB-safe for fact
  * tables — updating 1 of N partitions stages and commits ONLY that
  * partition's data (no whole-table copy), while readers stay
  * snapshot-consistent across partitions AND tables because one manifest
  * still names every live (table, partition, dataDir) triple.
  *
  * Layout under one catalog root:
  * {{{
  *   <root>/<table>/v=<n>.<nonce>/               — whole-table snapshots
  *   <root>/<table>/<partition>/v=<n>.<nonce>/   — partition snapshots
  *   <root>/_txns/<n>                            — committed manifest, txn n
  * }}}
  * A manifest is the FULL (table, partition)→dataDir mapping of the
  * catalog at txn n (updated entries get their new staging dirs, untouched
  * entries carry their previous dirs forward). The manifest rename is the
  * single commit point for the whole transaction:
  *  1. every updated entry's new snapshot is written COMPLETELY into its
  *     own unique staging dir (no writer ever touches another writer's
  *     dirs — the [[VersionedTable]] protocol, per entry);
  *  2. one manifest file listing every live entry is published via
  *     create-temp + atomic rename to `_txns/<n>`. Winners are detected
  *     by read-back (HDFS rename-to-existing fails atomically; local FS
  *     needs the content check); the loser deletes only its own staging
  *     dirs and throws — committed data is never touched;
  *  3. readers resolve max committed txn once and read ONLY dirs that its
  *     manifest names: a reader can never observe table A at txn n and
  *     table B at txn n−1, or partition P at n and partition Q at n−1,
  *     no matter how the writer crashed. [[snapshot]] pins that one
  *     resolution across any number of read calls; the per-call readers
  *     re-resolve latest each call.
  *
  * Scale posture: manifests are driver-side text — one line per LIVE
  * (table, partition), not per version, so a 10 000-partition fact table
  * costs a ~1 MB manifest rewrite per commit (KB for catalogs); data
  * reads are explicit-path Parquet scans with full pushdown, and
  * partition-pruned reads ([[readPartition]]) touch exactly one entry's
  * files. Whole-table snapshots remain the right trade for catalog-sized
  * tables; fact tables commit at partition grain.
  */
object TxnCatalog {

  /** Reserved partition key for whole-table (unpartitioned) snapshots. */
  private val Whole = "-"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def txnsDir(root: String) = s"$root/_txns"

  private def entryPath(root: String, tab: String, part: String, dir: String) =
    if (part == Whole) s"$root/$tab/$dir" else s"$root/$tab/$part/$dir"

  private def checkTableName(t: String): Unit =
    require(t.nonEmpty && !t.contains('/') && !t.contains('\t') &&
      !t.startsWith("_") && !t.startsWith("."), s"illegal table name '$t'")

  private def checkPartitionName(p: String): Unit =
    require(p.nonEmpty && p != Whole && !p.contains('/') && !p.contains('\t') &&
      !p.startsWith("_") && !p.startsWith(".") && !p.startsWith("v="),
      s"illegal partition name '$p'")

  /** Every committed txn whose manifest is still on disk, ascending —
    * the time-travel axis for [[snapshotAt]]. [[vacuum]] trims the old
    * end (outside its keep/minAgeMs window). */
  def txns(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val dir = new Path(txnsDir(root))
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .sorted
  }

  /** Highest committed transaction, or None for an empty catalog. */
  def currentTxn(spark: SparkSession, root: String): Option[Long] =
    txns(spark, root).lastOption

  /** The (table, partition)→dataDir mapping a committed txn's manifest
    * records. Two-field lines (pre-partition manifests) parse as
    * whole-table entries. */
  private def manifest(
      f: org.apache.hadoop.fs.FileSystem, root: String,
      txn: Long): Map[(String, String), String] = {
    val in = f.open(new Path(txnsDir(root), txn.toString))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.linesIterator.filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(t, d)    => (t, Whole) -> d
        case Array(t, p, d) => (t, p) -> d
        case _ => throw new java.io.IOException(
          s"corrupt manifest line in txn $txn: '$line'")
      }
    }.toMap
  }

  /** A catalog view pinned at one committed txn: every read through the
    * same snapshot resolves against the SAME manifest, so a logical read
    * that spans several calls (table A, then table B; or partition by
    * partition) can never mix txns, no matter how many commits land in
    * between. The per-call readers on [[TxnCatalog]] re-resolve the
    * LATEST txn on every call — pin a snapshot whenever one computation
    * reads more than once. A pinned txn's data dirs stay on disk only
    * while [[vacuum]]'s keep/minAgeMs retention covers it: size the
    * retention window to the longest-running reader. */
  final class Snapshot private[storage] (
      spark: SparkSession, root: String, val txn: Long,
      entries: Map[(String, String), String]) {

    /** Tables present in this snapshot. */
    def tables: Seq[String] = entries.keys.map(_._1).toSeq.distinct.sorted

    /** Partitions of `table` in this snapshot (empty for a whole-table
      * snapshot or an absent table). */
    def partitions(table: String): Seq[String] = entries.keys
      .collect { case (t, p) if t == table && p != Whole => p }.toSeq.sorted

    /** Read `table` at this snapshot's txn. A partitioned table reads as
      * the union of its live partition snapshots (the partition key is a
      * data column by contract — explicit version dirs preclude
      * Hive-style dir-name recovery), with schemas MERGED across
      * partitions: batches appended over time may carry evolved schemas
      * (a later batch adds a column), so older partitions surface the
      * new column as null and an incompatible type change fails loudly
      * instead of silently picking one footer's schema. None if absent. */
    def read(table: String): Option[DataFrame] = {
      val paths = entries.toSeq
        .collect { case ((t, p), d) if t == table => entryPath(root, t, p, d) }
        .sorted
      if (paths.isEmpty) None
      else if (paths.sizeIs == 1) Some(spark.read.parquet(paths.head))
      else Some(spark.read.option("mergeSchema", "true").parquet(paths: _*))
    }

    /** Read one partition of `table` at this snapshot's txn — touches
      * ONLY that partition's files (manifest-level partition pruning). */
    def readPartition(table: String, partition: String): Option[DataFrame] = {
      checkPartitionName(partition)
      entries.get((table, partition))
        .map(d => spark.read.parquet(entryPath(root, table, partition, d)))
    }
  }

  /** Pin the latest committed txn for snapshot-consistent multi-call
    * reads. None for an empty catalog. */
  def snapshot(spark: SparkSession, root: String): Option[Snapshot] =
    currentTxn(spark, root).map(t =>
      new Snapshot(spark, root, t, manifest(fs(spark, root), root, t)))

  /** Time travel: pin a SPECIFIC committed txn and read every table and
    * partition exactly as it stood then (audits, reproducing a run,
    * diffing against [[snapshot]]). Reaches only as far back as
    * [[vacuum]]'s keep window — throws if `txn` was never committed or
    * its manifest has been vacuumed. */
  def snapshotAt(spark: SparkSession, root: String, txn: Long): Snapshot = {
    val f = fs(spark, root)
    require(f.exists(new Path(txnsDir(root), txn.toString)),
      s"txn $txn is not committed (or already vacuumed) under $root")
    new Snapshot(spark, root, txn, manifest(f, root, txn))
  }

  /** One changed (table, partition) entry between two committed txns. */
  final case class EntryChange(table: String, partition: String,
      change: String) // "added" | "updated" | "removed"

  /** The (table, partition) entries whose data differs between two
    * committed txns — how an incremental consumer discovers what to
    * reprocess WITHOUT rescanning the catalog: the answer is
    * manifest-sized (driver-side KB), and reading just the changed data
    * is `snapshotAt(toTxn).readPartition` over the `added`/`updated`
    * entries — partition-pruned by construction, so a 1-of-10 000
    * partition commit costs its consumers exactly one partition read.
    * Both manifests must still be inside [[vacuum]]'s keep window.
    * Whole-table entries diff under the reserved partition `-`. */
  def diff(spark: SparkSession, root: String, fromTxn: Long,
      toTxn: Long): Seq[EntryChange] = {
    require(fromTxn <= toTxn, s"diff range is reversed: $fromTxn > $toTxn")
    val f = fs(spark, root)
    for (t <- Seq(fromTxn, toTxn))
      require(f.exists(new Path(txnsDir(root), t.toString)),
        s"txn $t is not committed (or already vacuumed) under $root")
    val (from, to) = (manifest(f, root, fromTxn), manifest(f, root, toTxn))
    val changes =
      to.collect {
        case (k, _) if !from.contains(k) =>
          EntryChange(k._1, k._2, "added")
        case (k, d) if from(k) != d =>
          EntryChange(k._1, k._2, "updated")
      } ++
      from.collect { case (k, _) if !to.contains(k) =>
        EntryChange(k._1, k._2, "removed")
      }
    changes.toSeq.sortBy(c => (c.table, c.partition))
  }

  /** Tables present in the latest committed snapshot. */
  def tables(spark: SparkSession, root: String): Seq[String] =
    snapshot(spark, root).map(_.tables).getOrElse(Nil)

  /** Partitions of `table` in the latest committed snapshot (empty for a
    * whole-table snapshot or an absent table). */
  def partitions(spark: SparkSession, root: String, table: String): Seq[String] =
    snapshot(spark, root).map(_.partitions(table)).getOrElse(Nil)

  /** Read `table` at the latest committed txn. Consistency note: ONE call
    * resolves one manifest, but each call re-resolves the latest — a
    * multi-call read should go through [[snapshot]] to pin a single txn
    * across calls. None if absent. */
  def read(spark: SparkSession, root: String, table: String): Option[DataFrame] =
    snapshot(spark, root).flatMap(_.read(table))

  /** Read one partition of `table` at the latest committed txn — touches
    * ONLY that partition's files (manifest-level partition pruning).
    * Multi-call reads should pin a [[snapshot]] (see [[read]]). */
  def readPartition(spark: SparkSession, root: String, table: String,
      partition: String): Option[DataFrame] =
    snapshot(spark, root).flatMap(_.readPartition(table, partition))

  /** Atomically publish new WHOLE-TABLE snapshots for `updates`
    * (table → DataFrame); untouched tables carry forward. A whole-table
    * commit replaces ALL of a table's entries, including any partition
    * entries. Returns the committed txn number. Concurrent writers race on
    * the manifest rename: exactly one commit per txn number survives, the
    * loser deletes only its own staging dirs and throws. A crash before
    * the rename leaves invisible orphans that [[vacuum]] clears. */
  def commit(spark: SparkSession, root: String,
      updates: Seq[(String, DataFrame)]): Long =
    commitHooked(spark, root, updates)(() => ())

  /** [[commit]] with a test-only interleave seam before the manifest
    * publish (the window a concurrent writer can win the txn number). */
  private[graft] def commitHooked(spark: SparkSession, root: String,
      updates: Seq[(String, DataFrame)])(beforePublish: () => Unit): Long = {
    require(updates.nonEmpty, "commit needs at least one table update")
    require(updates.map(_._1).distinct.size == updates.size,
      "duplicate table in one commit")
    updates.foreach { case (t, _) => checkTableName(t) }
    publish(spark, root,
      updates.map { case (t, df) => (t, Whole, df) },
      // a whole-table snapshot supersedes every entry of that table
      carried => carried.filterNot { case ((t, _), _) =>
        updates.exists(_._1 == t) })(beforePublish)
  }

  /** Atomically publish new snapshots for a set of PARTITIONS
    * (table, partition → DataFrame) across any number of tables; every
    * other (table, partition) entry carries forward unchanged. Updating
    * 1 of a fact table's N partitions stages and rewrites only that
    * partition's data — the whole-table copy is never made. Partition
    * keys are path-safe dir names (commonly Hive-style `k=v`); the
    * partition's key column stays a DATA column so [[read]] unions
    * losslessly. Tables are partitioned or whole, never both: committing
    * a partition to a table holding a whole-table snapshot throws. */
  def commitPartitions(spark: SparkSession, root: String,
      updates: Seq[(String, String, DataFrame)]): Long =
    commitPartitionsHooked(spark, root, updates)(() => ())

  /** [[commitPartitions]] with the test-only pre-publish seam. */
  private[graft] def commitPartitionsHooked(spark: SparkSession, root: String,
      updates: Seq[(String, String, DataFrame)])(
      beforePublish: () => Unit): Long = {
    require(updates.nonEmpty, "commit needs at least one partition update")
    require(updates.map(u => (u._1, u._2)).distinct.size == updates.size,
      "duplicate (table, partition) in one commit")
    updates.foreach { case (t, p, _) =>
      checkTableName(t); checkPartitionName(p)
    }
    publish(spark, root, updates, carried => {
      updates.map(_._1).distinct.foreach { t =>
        require(!carried.contains((t, Whole)),
          s"table '$t' holds a whole-table snapshot; partition commits " +
            "need a partitioned table (or a whole-table commit to replace it)")
      }
      carried
    })(beforePublish)
  }

  /** Shared commit path: stage every update into its own unique dir,
    * splice into the carried-forward manifest (after `reconcile` drops
    * superseded entries), publish via the rename CAS. */
  private def publish(spark: SparkSession, root: String,
      updates: Seq[(String, String, DataFrame)],
      reconcile: Map[(String, String), String] => Map[(String, String), String])(
      beforePublish: () => Unit): Long = {
    val f = fs(spark, root)
    val prev = currentTxn(spark, root)
    val next = prev.getOrElse(0L) + 1L
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // 1. all staging writes finish before anything is published
    val staged: Map[(String, String), String] = updates.map { case (t, p, df) =>
      val dirName = s"v=$next.$nonce"
      df.write.mode("errorifexists").parquet(entryPath(root, t, p, dirName))
      (t, p) -> dirName
    }.toMap
    val carried = reconcile(prev.map(manifest(f, root, _)).getOrElse(Map.empty))
    val entries = (carried ++ staged).toSeq.sortBy(_._1)
      .map { case ((t, p), d) => s"$t\t$p\t$d" }.mkString("", "\n", "\n")
    // 2. one rename commits every table and partition at once
    val tdir = new Path(txnsDir(root))
    f.mkdirs(tdir)
    val tmp = new Path(tdir, s".$next.inprogress.$nonce")
    val out = f.create(tmp, true)
    out.write(entries.getBytes("UTF-8"))
    out.close()
    val marker = new Path(tdir, next.toString)
    beforePublish()
    val won = !f.exists(marker) && f.rename(tmp, marker) &&
      manifest(f, root, next) == (carried ++ staged)
    if (!won) {
      if (f.exists(tmp)) f.delete(tmp, false)
      staged.foreach { case ((t, p), d) =>
        f.delete(new Path(entryPath(root, t, p, d)), true)
      }
      throw new java.io.IOException(
        s"lost the commit race publishing txn manifest $marker")
    }
    next
  }

  /** Drop snapshots referenced only by txns older than the `keep` most
    * recent ones, plus orphan staging dirs of crashed or race-losing
    * attempts at already-committed txn numbers. Data still referenced by
    * any SURVIVING manifest is never touched; manifests are removed AFTER
    * the data they exclusively reference. `minAgeMs` is the retention
    * window against vacuum-vs-long-reader races: a txn is reclaimed only
    * once its successor has been committed at least that long, and an
    * orphan staging dir only once it has sat unreferenced that long (its
    * writer may still be mid-job after losing the race). */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1,
      minAgeMs: Long = 0L): Unit = {
    require(keep >= 1, "must keep at least the current txn")
    val f = fs(spark, root)
    val tdir = new Path(txnsDir(root))
    if (!f.exists(tdir)) return
    val committed = f.listStatus(tdir).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .flatMap(n => scala.util.Try(n.toLong).toOption).sorted
    if (committed.isEmpty) return
    val now = System.currentTimeMillis()
    def successorAge(t: Long): Long = {
      val next = committed.find(_ > t).get
      now - f.getFileStatus(new Path(tdir, next.toString)).getModificationTime
    }
    val dropped = committed.dropRight(keep)
      .filter(t => minAgeMs <= 0L || successorAge(t) >= minAgeMs)
    val survivors = committed.filterNot(dropped.contains)
    val keptRefs: Set[(String, String, String)] = survivors
      .flatMap(t => manifest(f, root, t).toSeq.map { case ((tab, p), d) =>
        (tab, p, d) }).toSet
    dropped.foreach { t =>
      manifest(f, root, t).foreach { case ((tab, p), dir) =>
        if (!keptRefs.contains((tab, p, dir)))
          f.delete(new Path(entryPath(root, tab, p, dir)), true)
      }
      f.delete(new Path(tdir, t.toString), false)
    }
    // orphans: unreferenced v=<n>.<nonce> dirs at committed txn numbers,
    // at both grains (whole-table dirs and per-partition dirs)
    val maxCommitted = committed.last
    val live = keptRefs.map { case (tab, p, dir) => entryPath(root, tab, p, dir) }
    def reclaimOrphans(parent: Path, mkPath: String => String): Unit =
      f.listStatus(parent).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .filterNot(s => live.contains(mkPath(s.getPath.getName)))
        .filter { s =>
          val base = s.getPath.getName.stripPrefix("v=").takeWhile(_ != '.')
          scala.util.Try(base.toLong).toOption.exists(_ <= maxCommitted)
        }
        // retention applies to orphan staging dirs too (see
        // VersionedTable.vacuum): never delete a possibly-still-writing
        // loser's staging dir inside the window
        .filter(s => minAgeMs <= 0L || now - s.getModificationTime >= minAgeMs)
        .foreach(s => f.delete(s.getPath, true))
    f.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .foreach { tdirStatus =>
        val tab = tdirStatus.getPath.getName
        reclaimOrphans(tdirStatus.getPath, d => s"$root/$tab/$d")
        f.listStatus(tdirStatus.getPath).toSeq
          .filter(s => s.isDirectory && !s.getPath.getName.startsWith("v=") &&
            !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
          .foreach { pdir =>
            val part = pdir.getPath.getName
            reclaimOrphans(pdir.getPath, d => s"$root/$tab/$part/$d")
          }
      }
  }
}
