package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit runtime-filter (bloom) semi join: the pattern Spark's own
  * row-level runtime filtering injects, exposed as a library operator for
  * the cases AQE can't see (pre-filtered dimension computed by earlier
  * pipeline stages, filter reused across several fact scans).
  *
  * Shape: build a bloom filter over the dimension keys (one aggregate job,
  * sketch sized for `expectedItems`/`fpp`), broadcast it, drop fact rows
  * that cannot join BEFORE the shuffle, then run the exact semi join on the
  * survivors. The bloom pass only removes guaranteed non-matches, so the
  * result is exactly the semi join — false positives cost shuffle bytes,
  * never correctness.
  *
  * Scale: at 100 TB the win is shuffle volume — a 1% fpp filter over a 1%
  * selective dimension cuts fact shuffle ~99%; the sketch itself is
  * O(expectedItems · ln(1/fpp)) bits (~1.2 MB per 1M keys at 1%), well
  * inside broadcast budget. The probe is a scan-side predicate (the one
  * non-codegen'd UDF in this module — it guards a shuffle, not a hot
  * per-row compute path).
  */
object RuntimeFilter {

  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }
}
