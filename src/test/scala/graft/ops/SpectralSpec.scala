package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

class SpectralSpec extends GraftSuite {
  import spark.implicits._

  test("powerIteration recovers a planted dominant direction") {
    // rows = a ± noise around a fixed direction u (deterministic fixture):
    // the top singular direction must align with u
    val d = 8
    val u = Array.tabulate(d)(i => if (i == 2) 0.9 else 0.1)
    val un = math.sqrt(u.map(x => x * x).sum)
    val rows = (1 to 200).map { r =>
      val scaleD = 1.0 + (r % 7) * 0.5
      Tuple1(u.zipWithIndex.map { case (x, i) =>
        (x * scaleD + 0.01 * ((r * 31 + i * 17) % 11 - 5)).toFloat
      }.toSeq)
    }.toDF("embedding")
    val v = Spectral.powerIteration(rows, "embedding", iters = 8)
      .orderBy("i").select("loading").as[Double].collect()
    val cos = v.zip(u).map { case (a, b) => a * b }.sum /
      (math.sqrt(v.map(x => x * x).sum) * un)
    assert(math.abs(cos) > 0.99, s"not aligned with planted direction: |cos|=$cos")
    // unit norm (up to pinning)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4)
  }

  test("powerIteration is invariant to input partitioning (pinned trajectory)") {
    val rows = (1 to 100).map(r =>
      Tuple1(Array.tabulate(4)(i => ((r * 13 + i * 7) % 19 - 9).toFloat).toSeq))
      .toDF("embedding")
    val a = Spectral.powerIteration(rows, "embedding", iters = 4)
      .orderBy("i").select("loading").as[Double].collect().toSeq
    val b = Spectral.powerIteration(rows.repartition(13), "embedding", iters = 4)
      .orderBy("i").select("loading").as[Double].collect().toSeq
    assert(a === b)
  }
}
