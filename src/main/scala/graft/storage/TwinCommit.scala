package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic twin-append over two Parquet tables — the reference commits
  * catalog + lineage in ONE MySQL transaction (`mysql_process.py:53-56`
  * insert_catalog: two INSERTs, one commit). Two bare Parquet appends are
  * not atomic: a crash between them leaves a catalog row whose lineage
  * never arrives.
  *
  * Commit-marker protocol (the classic manifest pattern, no table format
  * needed):
  *  1. each batch writes to its own `batch=<id>` directory under each table
  *     (`errorifexists` — a retried batch id can never half-overwrite);
  *  2. only after BOTH writes succeed is `<commits>/<id>` published via
  *     create-temp + atomic rename (a single-file rename is atomic on
  *     HDFS/POSIX/S3-committer targets);
  *  3. readers resolve the marker directory first and read ONLY committed
  *     batch directories — an unmarked batch is invisible no matter how many
  *     of its files landed.
  *
  * Scale posture: the marker listing is one driver-side `listStatus` of a
  * directory holding one tiny file per batch — thousands of batches cost
  * milliseconds; the data read is explicit-path Parquet, so committed-batch
  * selection doubles as partition pruning.
  */
object TwinCommit {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append `a`→`dirA` and `b`→`dirB` as batch `batchId`, atomically
    * published by the commit marker. Idempotent on replay — the retry
    * contract a streaming foreachBatch sink needs:
    *  - batch already committed (marker exists): no-op, so a re-delivered
    *    micro-batch after a post-commit crash writes nothing twice;
    *  - batch torn (data dirs exist, no marker): the invisible remnants are
    *    deleted and the batch is rewritten cleanly.
    * Throws (and publishes nothing) if either write fails. */
  def append(spark: SparkSession, batchId: String,
      a: DataFrame, dirA: String, b: DataFrame, dirB: String,
      commitsDir: String): Unit = {
    require(!batchId.contains("/"), s"batch id must be path-safe: $batchId")
    val f = fs(spark, commitsDir)
    val marker = new Path(commitsDir, batchId)
    if (f.exists(marker)) return // committed replay — exactly-once no-op
    Seq(dirA, dirB).foreach { dir =>
      val p = new Path(s"$dir/batch=$batchId")
      val df = fs(spark, dir)
      if (df.exists(p)) df.delete(p, true) // torn remnants, never visible
    }
    a.write.mode("errorifexists").parquet(s"$dirA/batch=$batchId")
    b.write.mode("errorifexists").parquet(s"$dirB/batch=$batchId")
    val tmp = new Path(commitsDir, s".$batchId.inprogress")
    val out = f.create(tmp, true)
    out.writeBytes(s"$batchId\n")
    out.close()
    if (!f.rename(tmp, marker))
      throw new java.io.IOException(s"could not publish commit marker $marker")
  }

  /** Committed batch ids, marker-directory order-independent. */
  def committedBatches(spark: SparkSession, commitsDir: String): Seq[String] = {
    val f = fs(spark, commitsDir)
    val dir = new Path(commitsDir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith(".")).sorted
  }

  /** Read one table's committed batches only. Uncommitted (crashed, torn,
    * in-flight) batch directories are never touched. Returns None when no
    * batch has been committed yet (no schema to read). */
  def readCommitted(spark: SparkSession, tableDir: String,
      commitsDir: String): Option[DataFrame] = {
    val f = fs(spark, tableDir)
    val paths = committedBatches(spark, commitsDir)
      .map(id => s"$tableDir/batch=$id")
      .filter(p => f.exists(new Path(p)))
    if (paths.isEmpty) None
    else Some(spark.read.option("basePath", tableDir).parquet(paths: _*))
  }
}
