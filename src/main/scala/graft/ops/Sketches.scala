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

  /** Explicit 31-bit avalanche mix (two multiply-mod-2³¹ + xorshift
    * rounds, Murmur-finalizer style). HLL needs BIT-uniform hashes — the
    * CW affine family is enough for CMS bucket spread but its values form
    * a lattice (sequential keys below p/a don't even wrap), which skews
    * leading-zero ranks and blows up the estimate 3× (measured). Every
    * step is overflow-safe BIGINT arithmetic + xor + shift, so any SQL
    * engine reproduces it bit-for-bit. */
  def mix31(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val m31 = 2147483648L
    val h0 = pmod(k.cast("long"), lit(m31))
    val h1 = (h0 * 2654435761L) % m31
    val h2 = h1.bitwiseXOR(shiftright(h1, 15))
    val h3 = (h2 * 1103515245L) % m31
    h3.bitwiseXOR(shiftright(h3, 13))
  }

  /** HyperLogLog register table (bucket, M) over integer keys: the 31-bit
    * [[mix31]] hash splits into a `bits`-bit bucket and a (31−bits)-bit
    * suffix whose leading-zero rank feeds the register max. One hash
    * aggregate of ≤ 2^bits rows regardless of input size; registers MERGE
    * by per-bucket max (union two corpora's registers, groupBy max —
    * spec-verified), which is what makes HLL the distributed-
    * COUNT-DISTINCT sketch. */
  def hllRegisters(df: DataFrame, keyCol: String, bits: Int = 6): DataFrame = {
    require(bits >= 1 && bits <= 12, "bits must be in [1, 12]")
    val m = 1 << bits
    val wBits = 31 - bits
    df.select(mix31(col(keyCol)).as("hv"))
      .select((col("hv") % m).as("bucket"), shiftright(col("hv"), bits).as("w"))
      .groupBy("bucket")
      .agg(max(when(col("w") === 0, lit(wBits + 1.0))
        .otherwise(lit(wBits * 1.0) - floor(log2(col("w"))))).as("M"))
  }

  /** HLL estimate from a register table: α·m²/Σ2^(−M) with the standard
    * small-range linear-counting correction (Flajolet et al. 2007). Every
    * term is reproducible cross-engine: 2^(−M) sums are exact binary
    * fractions, α is the published constant for the register count. */
  def hllFromRegisters(regs: DataFrame, bits: Int): DataFrame = {
    val m = 1 << bits
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    regs
      .agg(count(lit(1)).as("nb"),
        coalesce(sum(pow(lit(2.0), -col("M"))), lit(0.0)).as("s2"))
      .select((lit(m) - col("nb")).as("V"),
        ((lit(m * 1.0) - col("nb")) + col("s2")).as("S"))
      .select(col("V"),
        (lit(alpha) * m * m / col("S")).as("E"))
      .select(round(
        when(col("E") <= 2.5 * m && col("V") > 0,
          lit(m * 1.0) * log(lit(m * 1.0) / col("V")))
          .otherwise(col("E")), 6).as("hll_estimate"))
  }

  /** One-shot HLL distinct-count estimate for `keyCol`. */
  def hllEstimate(df: DataFrame, keyCol: String, bits: Int = 6): DataFrame =
    hllFromRegisters(hllRegisters(df, keyCol, bits), bits)

  /** Per-group HLL estimates (the "distinct users per day" shape): one
    * register table keyed by (group, bucket) — ≤ 2^bits rows per group
    * regardless of group size, one hash aggregate for the registers and
    * one for the estimates. The same estimator as [[hllFromRegisters]],
    * applied group-wise: register-count and Σ2^(−M) fold in a single pass,
    * with the linear-counting correction per group. */
  def hllEstimateByGroup(df: DataFrame, groupCol: String, keyCol: String,
      bits: Int = 6): DataFrame = {
    require(bits >= 1 && bits <= 12, "bits must be in [1, 12]")
    val m = 1 << bits
    val wBits = 31 - bits
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val regs = df
      .select(col(groupCol).as("g"), mix31(col(keyCol)).as("hv"))
      .select(col("g"), (col("hv") % m).as("bucket"),
        shiftright(col("hv"), bits).as("w"))
      .groupBy("g", "bucket")
      .agg(max(when(col("w") === 0, lit(wBits + 1.0))
        .otherwise(lit(wBits * 1.0) - floor(log2(col("w"))))).as("M"))
    regs.groupBy("g")
      .agg(count(lit(1)).as("nb"),
        coalesce(sum(pow(lit(2.0), -col("M"))), lit(0.0)).as("s2"))
      .select(col("g"), (lit(m) - col("nb")).as("V"),
        ((lit(m * 1.0) - col("nb")) + col("s2")).as("S"))
      .select(col("g"), col("V"), (lit(alpha) * m * m / col("S")).as("E"))
      .select(col("g").as(groupCol), round(
        when(col("E") <= 2.5 * m && col("V") > 0,
          lit(m * 1.0) * log(lit(m * 1.0) / col("V")))
          .otherwise(col("E")), 6).as("hll_estimate"))
  }
}
