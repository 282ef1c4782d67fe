package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test lake (TESTDATA.md). One parquet file per table.
  *
  * Plain `spark.read.parquet` keeps the scan fully Catalyst-managed: filter
  * pushdown, column pruning and partition coalescing all apply — at 100 TB the
  * same call reads a partitioned directory tree and prunes partitions; nothing
  * here assumes single-file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** events.ts normalizes to a session-zoned micros TIMESTAMP whatever the
    * parquet writer produced, so every downstream op (`unix_micros`, window
    * ranges, date buckets) sees one type:
    *  - TIMESTAMP(NANOS) (older driver corpora): Spark's vectorized reader
    *    rejects it — read as raw nanos and integer-truncate to micros
    *    (matches DuckDB's ns ordering; `div` keeps precision above 2^53 ns,
    *    where a double division would round);
    *  - timestamp[us] WITHOUT timezone (current driver corpora): Spark 4
    *    infers TIMESTAMP_NTZ — cast to TIMESTAMP, which under the pinned
    *    UTC session zone preserves the exact microsecond values DuckDB
    *    reads natively;
    *  - micros TIMESTAMP (GenScale output): passes through unchanged.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(
          "ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(
          "ts", df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
