package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9: JDBC source/sink — the reference's entire catalog lives in a MySQL
  * database reached through a single connection helper
  * (`mysql_process.py:4-11 get_connection`, reads `:64-81`, writes
  * `:46-61`). Re-expressed as a thin passthrough over Spark's JDBC source so
  * Catalyst keeps what it already does well (predicate pushdown into the
  * remote WHERE clause, column pruning into the SELECT list).
  *
  * Scale design: an unpartitioned JDBC read is a SINGLE executor task no
  * matter how large the cluster — always pass `partitionCol` + bounds for
  * any table beyond dim size, which splits the scan into `numPartitions`
  * parallel range queries. Writes batch `batchsize` rows per INSERT round
  * trip; one remote transaction per partition (JDBC-standard semantics —
  * cross-partition atomicity needs the staging/commit-marker pattern of
  * [[graft.pipelines.Pipelines]]).
  *
  * Tested against the in-process Derby engine (on Spark's own classpath) —
  * the same `spark.read.jdbc` path speaks to MySQL/Postgres by swapping the
  * URL/driver.
  */
object Jdbc {

  private def propsOf(options: Map[String, String]): Properties = {
    val p = new Properties()
    options.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Whole-table (or pushdown-subquery) read. `table` may be a table name or
    * a parenthesized subquery alias — `"(SELECT … ) t"` — the reference's
    * get_urllist join could run remotely that way. */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, propsOf(options))

  /** Range-partitioned parallel read: `numPartitions` concurrent range scans
    * on `partitionCol` ∈ [lowerBound, upperBound]. The only JDBC read shape
    * that scales past one task. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(
      url, table, partitionCol, lowerBound, upperBound, numPartitions,
      propsOf(options))

  /** JDBC sink (`mysql_process.py:46-61` insert semantics). `mode` is one of
    * append / overwrite / ignore / errorifexists. */
  def write(df: DataFrame, url: String, table: String,
      mode: String = "append", options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode)
      .option("batchsize", options.getOrElse("batchsize", "1000"))
      .jdbc(url, table, propsOf(options))
}
