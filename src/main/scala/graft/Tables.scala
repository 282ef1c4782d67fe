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
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    * rejects; read it as raw nanos and integer-truncate to a micros timestamp
    * (matches DuckDB's ns ordering — collisions would need two events in the
    * same microsecond). `ts div 1000` is integer division: a double division
    * would lose precision above 2^53 ns (~1970+104 days).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    // nanos layout reads as raw long under nanosAsLong → truncate to a
    // micros timestamp; a corpus already written in micros (GenScale
    // output) reads as timestamp directly and passes through unchanged
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(
        "ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
