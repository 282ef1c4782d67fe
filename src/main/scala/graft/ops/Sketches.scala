package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over integer keys, kept as a DATAFRAME of cells —
  * (row j, bucket, count) — rather than a driver-side array: cells build
  * with one hash aggregate (map-side combined), merge across corpora/days
  * by union + re-aggregate, and stay distributed end to end. At 100 TB the
  * sketch table is depth·width rows no matter the input size — the whole
  * point of a sketch — while the build pass shuffles only those
  * depth·width cells.
  *
  * Hash rows are the EXPLICIT Carter–Wegman family
  * h_j(k) = ((a_j·k + b_j) mod p) mod width with fixed published
  * constants — deliberately not an engine-internal hash, so estimates
  * (including every collision) are reproducible in plain SQL on any
  * engine: the DuckDB oracle rebuilds the sketch cell-for-cell. Standard
  * CMS guarantees: estimate ≥ true count always; overestimate ≤ e·N/width
  * with probability 1 − e^(−depth).
  */
object Sketches {

  /** Fixed CW hash constants (primes; p = 2^31 − 1). a_j·k stays below
    * 2^56 for 31-bit keys — no BIGINT overflow on either engine. */
  val P: Long = 2147483647L
  val A: Seq[Long] = Seq(1299709L, 15485863L, 32452843L, 49979687L, 67867967L)
  val B: Seq[Long] = Seq(7L, 97L, 997L, 9973L, 99991L)

  private def bucketExpr(j: Int, k: org.apache.spark.sql.Column, width: Int) =
    ((lit(A(j)) * k + lit(B(j))) % P) % width

  /** Build the sketch cell table (j, bucket, cnt) for `keyCol` (a
    * non-negative integral column). depth ≤ 5 hash rows. */
  def cmsBuild(df: DataFrame, keyCol: String, width: Int, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= A.length, s"depth must be in [1, ${A.length}]")
    require(width >= 1, "width must be positive")
    val k = col(keyCol).cast("long")
    val hs = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucketExpr(j, k, width).as("bucket")))
    df.select(explode(array(hs: _*)).as("__h"))
      .groupBy(col("__h.j").as("j"), col("__h.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a set of keys: est(k) = min_j cells[j][h_j(k)].
    * A key hashing to an empty cell has true count 0 (CMS never
    * underestimates) — estimated 0 via the left join. */
  def cmsEstimate(keys: DataFrame, cells: DataFrame, keyCol: String,
      width: Int, depth: Int): DataFrame = {
    val k = col(keyCol).cast("long")
    val hs = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucketExpr(j, k, width).as("bucket")))
    keys.select(k.as("k"))
      .select(col("k"), explode(array(hs: _*)).as("__h"))
      .select(col("k"), col("__h.j").as("j"), col("__h.bucket").as("bucket"))
      .join(cells, Seq("j", "bucket"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters: top `k` keys by CMS estimate (ties on key). The
    * candidate keys are the distinct input keys — at stream scale swap in
    * any candidate source (e.g. per-partition local top lists); estimates
    * come from the sketch either way. */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, width: Int, depth: Int,
      topK: Int): DataFrame = {
    val cells = cmsBuild(df, keyCol, width, depth)
    val keys = df.select(col(keyCol).cast("long").as("k")).distinct()
    cmsEstimate(keys, cells, "k", width, depth)
      .orderBy(col("est").desc, col("k"))
      .limit(topK)
  }
}
