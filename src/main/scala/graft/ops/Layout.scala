package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout optimization: Z-order (Morton) clustering for
  * multi-dimensional data skipping — the lakehouse answer to "queries filter
  * on BOTH user and time, but the table can only be sorted by one".
  *
  * Writing a 100 TB table range-partitioned + sorted by the interleaved
  * Z-value clusters rows so that parquet row-group min/max stats stay tight
  * on EVERY interleaved dimension at once: a filter on any of them prunes
  * row groups, not just the leading sort column. The Z-value itself is pure
  * bit arithmetic (codegen'd, shuffle-free); the only distributed cost is
  * the same range-exchange any sorted write pays.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Plain shift/mask arithmetic — identical in any engine. */
  def interleaveBits(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Repartition-by-range + sort on the Z-value of (aCol, bCol): the write
    * layout that keeps row-group min/max tight on both dimensions. The
    * Z-column is dropped — it only drives the exchange and sort. */
  def zorderBy(df: DataFrame, aCol: String, bCol: String,
      numPartitions: Int, bits: Int = 8): DataFrame = {
    val z = interleaveBits(col(aCol), col(bCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
