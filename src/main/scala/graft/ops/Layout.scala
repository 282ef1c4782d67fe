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

  /** Morton interleave of the low `bits` bits of N ≥ 2 non-negative
    * integer columns: bit i of column j lands at position N·i + j, so a
    * range of Z-values bounds every dimension at once. Plain shift/mask
    * arithmetic — identical in any engine. */
  def interleaveBitsN(cols: Seq[Column], bits: Int = 8): Column = {
    val n = cols.size
    require(n >= 2, "interleave needs at least two columns")
    require(bits >= 1 && n * bits <= 62,
      s"$n × $bits interleaved bits must fit a positive long (≤ 62)")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (n * i + j))
      }
    }.reduce(_ + _)
  }

  /** Two-column [[interleaveBitsN]]: bit i of `a` at position 2i, bit i
    * of `b` at 2i+1. */
  def interleaveBits(a: Column, b: Column, bits: Int = 8): Column =
    interleaveBitsN(Seq(a, b), bits)

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
