package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

class SketchesSpec extends GraftSuite {
  import spark.implicits._

  private def keysDf(counts: Map[Long, Int]) =
    counts.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")

  test("CMS never underestimates, and a wide sketch is exact on this fixture") {
    val counts = Map(1L -> 50, 2L -> 30, 3L -> 20, 7L -> 5, 11L -> 1)
    val df = keysDf(counts)
    // tiny sketch: collisions guaranteed (5 keys, 4 buckets) — est >= true
    val tiny = Sketches.cmsHeavyHitters(df, "k", width = 4, depth = 2, topK = 10)
      .as[(Long, Long)].collect().toMap
    counts.foreach { case (k, n) =>
      assert(tiny(k) >= n, s"CMS underestimated key $k: ${tiny(k)} < $n")
    }
    // wide sketch: no colliding pair on this fixture — estimates exact
    val wide = Sketches.cmsHeavyHitters(df, "k", width = 4096, depth = 3, topK = 10)
      .as[(Long, Long)].collect().toMap
    counts.foreach { case (k, n) => assert(wide(k) === n.toLong) }
  }

  test("CMS cell tables merge by union + re-aggregation (mergeable sketch)") {
    val a = keysDf(Map(1L -> 10, 2L -> 5))
    val b = keysDf(Map(2L -> 7, 3L -> 2))
    val whole = Sketches.cmsBuild(a.union(b), "k", width = 8, depth = 3)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.cmsBuild(a, "k", width = 8, depth = 3)
      .union(Sketches.cmsBuild(b, "k", width = 8, depth = 3))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }

  test("HLL estimate lands within the m=64 error envelope on 1000 distinct keys") {
    val df = (1L to 1000L).toDF("k")
    val est = Sketches.hllEstimate(df, "k", bits = 6)
      .as[Double].collect().head
    // sigma = 1.04/sqrt(64) = 13%; 3 sigma = 39%
    assert(math.abs(est - 1000.0) / 1000.0 < 0.39, s"HLL estimate off: $est")
    // duplicates never move registers: same estimate on a 5x-duplicated input
    val dup = df.union(df).union(df).union(df).union(df)
    val est5 = Sketches.hllEstimate(dup, "k", bits = 6).as[Double].collect().head
    assert(est5 === est)
  }

  test("HLL linear-counting branch engages for tiny cardinalities") {
    val est = Sketches.hllEstimate(Seq(1L, 2L, 3L).toDF("k"), "k", bits = 6)
      .as[Double].collect().head
    assert(est > 0.5 && est < 10.0, s"small-range estimate implausible: $est")
  }

  test("HLL registers merge by per-bucket max") {
    val a = (1L to 400L).toDF("k")
    val b = (300L to 700L).toDF("k")
    val whole = Sketches.hllRegisters(a.union(b), "k", bits = 6)
      .as[(Long, Double)].collect().toSet
    val merged = Sketches.hllRegisters(a, "k", bits = 6)
      .union(Sketches.hllRegisters(b, "k", bits = 6))
      .groupBy("bucket").agg(max("M").as("M"))
      .as[(Long, Double)].collect().toSet
    assert(merged === whole)
  }

  test("per-group HLL equals the single-group estimator run on each slice") {
    val df = (1L to 900L).map(k => (k % 3, k)).toDF("g", "k")
    val grouped = Sketches.hllEstimateByGroup(df, "g", "k", bits = 6)
      .as[(Long, Double)].collect().toMap
    (0L to 2L).foreach { g =>
      val single = Sketches.hllEstimate(df.filter($"g" === g), "k", bits = 6)
        .as[Double].collect().head
      assert(grouped(g) === single, s"group $g diverges from single-group HLL")
    }
  }

  test("heavy hitters surface the true top keys when the sketch is wide enough") {
    val counts = (1L to 100L).map(k => k -> (if (k <= 3) 1000 else 2).toInt).toMap
    val top = Sketches.cmsHeavyHitters(keysDf(counts), "k",
        width = 2048, depth = 3, topK = 3)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(top === Set(1L, 2L, 3L))
  }
}
