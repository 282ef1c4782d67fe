package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

class LayoutProfileSpec extends GraftSuite {
  import spark.implicits._

  test("interleaveBits: known Morton codes") {
    val df = Seq((3L, 1L), (255L, 0L), (0L, 255L), (0L, 0L)).toDF("a", "b")
    val out = df.select(Layout.interleaveBits($"a", $"b", 8)).as[Long].collect()
    assert(out(0) === 7L)      // a bits at 0,2 (1+4), b bit at 1 (2)
    assert(out(1) === 0x5555L) // a fills even positions
    assert(out(2) === 0xAAAAL) // b fills odd positions
    assert(out(3) === 0L)
  }

  test("zorderBy enables pruning on the non-leading dimension") {
    // 64x64 grid; a filter on b must skip most z-ordered partitions (whose
    // [min_b, max_b] stats exclude the probe) but NO linearly-sorted ones
    // (each spans all of b) — min/max stats are what parquet row groups keep
    val grid = spark.range(4096)
      .select(($"id" / 64).cast("long").as("a"), ($"id" % 64).as("b"))
    def partsContaining(df: org.apache.spark.sql.DataFrame, probe: Long): Long =
      df.withColumn("p", spark_partition_id())
        .groupBy("p").agg(min("b").as("lo"), max("b").as("hi"))
        .filter(lit(probe) >= $"lo" && lit(probe) <= $"hi")
        .count()
    val linear = grid.repartitionByRange(16, $"a").sortWithinPartitions("a")
    val zed = Layout.zorderBy(grid, "a", "b", numPartitions = 16, bits = 6)
    val (zHit, linHit) = (partsContaining(zed, 5L), partsContaining(linear, 5L))
    assert(linHit === 16L, "linear layout: every partition spans all of b")
    assert(zHit <= 8L, s"z-order must prune most partitions on b, hit $zHit")
    assert(zed.count() === 4096)
  }

  test("profile: exact metrics on a known frame, long format") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (2L, "y"), (null, "x"))
      .toDF("n", "s")
    val out = Profile.profile(df, Seq("n", "s"), exactNdv = true)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("n", "count")) === 2.0) // count(col) skips nulls
    assert(out(("n", "nulls")) === 1.0)
    assert(out(("n", "ndv")) === 2.0)
    assert(out(("n", "min")) === 1.0 && out(("n", "max")) === 2.0)
    assert(out(("n", "mean")) === 1.5)
    assert(out(("s", "ndv")) === 2.0)
    assert(!out.contains(("s", "min")), "no min/max for non-numeric")
  }

  test("profile sketch mode stays within HLL error on the fixture") {
    val df = spark.range(10000).select(($"id" % 1000).as("k"))
    val ndv = Profile.profile(df, Seq("k"))
      .filter($"metric" === "ndv").select("value").as[Double].collect().head
    assert(math.abs(ndv - 1000.0) / 1000.0 < 0.1)
  }
}
