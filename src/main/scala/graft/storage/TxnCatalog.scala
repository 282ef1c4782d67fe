package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table snapshot transactions over bare Parquet — the last gap
  * between [[VersionedTable]] (single-table snapshot overwrites) and a
  * real table format: a writer that must update SEVERAL tables so that
  * readers see either all of the new versions or none of them (the
  * reference's catalog + lineage pair updated inside one MySQL
  * transaction is exactly this shape).
  *
  * Layout under one catalog root:
  * {{{
  *   <root>/<table>/v=<n>.<nonce>/   — immutable data snapshots
  *   <root>/_txns/<n>               — committed manifest for txn n
  * }}}
  * A manifest is the FULL table→dataDir mapping of the catalog at txn n
  * (updated tables get their new staging dirs, untouched tables carry
  * their previous dirs forward). The manifest rename is the single commit
  * point for the whole transaction:
  *  1. every updated table's new snapshot is written COMPLETELY into its
  *     own unique staging dir (no writer ever touches another writer's
  *     dirs — the [[VersionedTable]] protocol, per table);
  *  2. one manifest file listing every table's data dir is published via
  *     create-temp + atomic rename to `_txns/<n>`. Winners are detected
  *     by read-back (HDFS rename-to-existing fails atomically; local FS
  *     needs the content check); the loser deletes only its own staging
  *     dirs and throws — committed data is never touched;
  *  3. readers resolve max committed txn once and read ONLY dirs that its
  *     manifest names: a reader can never observe table A at txn n and
  *     table B at txn n−1, no matter how the writer crashed.
  *
  * Scale posture: manifests are driver-side kilobytes (one line per
  * table — catalogs have tens of tables, not millions); data reads are
  * explicit-path Parquet scans with full pushdown. Snapshots are
  * whole-table copies, the right trade for catalog-sized tables; fact
  * tables want per-partition manifests — same marker protocol, one entry
  * per (table, partition).
  */
object TxnCatalog {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def txnsDir(root: String) = s"$root/_txns"

  /** Highest committed transaction, or None for an empty catalog. */
  def currentTxn(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val dir = new Path(txnsDir(root))
    if (!f.exists(dir)) None
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .sorted.lastOption
  }

  /** The table→dataDir mapping a committed txn's manifest records. */
  private def manifest(
      f: org.apache.hadoop.fs.FileSystem, root: String,
      txn: Long): Map[String, String] = {
    val in = f.open(new Path(txnsDir(root), txn.toString))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(t, d) = line.split('\t')
      t -> d
    }.toMap
  }

  /** Tables present in the latest committed snapshot. */
  def tables(spark: SparkSession, root: String): Seq[String] =
    currentTxn(spark, root)
      .map(t => manifest(fs(spark, root), root, t).keys.toSeq.sorted)
      .getOrElse(Seq.empty)

  /** Read `table` at the latest committed txn — always consistent with
    * every other table read at the same txn. None if absent. */
  def read(spark: SparkSession, root: String, table: String): Option[DataFrame] =
    currentTxn(spark, root).flatMap { t =>
      manifest(fs(spark, root), root, t).get(table)
        .map(dir => spark.read.parquet(s"$root/$table/$dir"))
    }

  /** Atomically publish new snapshots for `updates` (table → DataFrame);
    * untouched tables carry forward. Returns the committed txn number.
    * Concurrent writers race on the manifest rename: exactly one commit
    * per txn number survives, the loser deletes only its own staging dirs
    * and throws. A crash before the rename leaves invisible orphans that
    * [[vacuum]] clears. */
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
    updates.foreach { case (t, _) =>
      require(t.nonEmpty && !t.contains('/') && !t.contains('\t') &&
        !t.startsWith("_"), s"illegal table name '$t'")
    }
    val f = fs(spark, root)
    val prev = currentTxn(spark, root)
    val next = prev.getOrElse(0L) + 1L
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // 1. all staging writes finish before anything is published
    val staged = updates.map { case (t, df) =>
      val dirName = s"v=$next.$nonce"
      df.write.mode("errorifexists").parquet(s"$root/$t/$dirName")
      t -> dirName
    }.toMap
    val carried = prev.map(manifest(f, root, _)).getOrElse(Map.empty)
    val entries = (carried ++ staged).toSeq.sortBy(_._1)
      .map { case (t, d) => s"$t\t$d" }.mkString("", "\n", "\n")
    // 2. one rename commits every table at once
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
      staged.foreach { case (t, d) => f.delete(new Path(s"$root/$t/$d"), true) }
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
    * once its successor has been committed at least that long, so any
    * reader that resolved it within the window still has its files. */
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
    val keptRefs: Set[(String, String)] = survivors
      .flatMap(t => manifest(f, root, t).toSeq).toSet
    dropped.foreach { t =>
      manifest(f, root, t).foreach { case (tab, dir) =>
        if (!keptRefs.contains((tab, dir)))
          f.delete(new Path(s"$root/$tab/$dir"), true)
      }
      f.delete(new Path(tdir, t.toString), false)
    }
    // orphans: unreferenced v=<n>.<nonce> dirs at committed txn numbers
    val maxCommitted = committed.last
    val live = keptRefs.map { case (tab, dir) => s"$tab/$dir" }
    f.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .foreach { tdirStatus =>
        val tab = tdirStatus.getPath.getName
        f.listStatus(tdirStatus.getPath).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
          .filterNot(s => live.contains(s"$tab/${s.getPath.getName}"))
          .filter { s =>
            val base = s.getPath.getName.stripPrefix("v=").takeWhile(_ != '.')
            scala.util.Try(base.toLong).toOption.exists(_ <= maxCommitted)
          }
          .foreach(s => f.delete(s.getPath, true))
      }
  }
}
