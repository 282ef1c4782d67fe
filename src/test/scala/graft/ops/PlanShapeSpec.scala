package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** Physical-plan regression guards for scale-critical operators: the specs
  * assert the plan SHAPE (what would survive 100×), not just the result —
  * a silent fallback to a cartesian or a global sort is a bug even when
  * the answer stays right. */
class PlanShapeSpec extends GraftSuite {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("triangles: degree-oriented join plan never falls back to a cartesian") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val plan = planOf(Graph.triangles(edges, "src", "dst"))
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
  }

  test("weightedSample: top-k runs as TakeOrderedAndProject, not a global sort") {
    val df = (1L to 100L).map(i => (i, 1.0 + i)).toDF("id", "w")
    val plan = planOf(Sampling.weightedSample(df, "id", "w", k = 5))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
  }

  test("editDistancePairs: candidate generation joins on grams, no cross join of the corpus") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cog")).toDF("id", "text")
    val plan = planOf(Dedup.editDistancePairs(docs, "id", "text", maxDist = 1))
    // exactly TWO nested-loop sites are allowed, both with a gated build
    // side: (1) the short×short all-pairs bucket (≤ maxShortBucket rows,
    // fails fast past the gate) and (2) the broadcast of that same gated
    // short tier against the maxDist-wide boundary band (cross-tier
    // recall). The gram candidate join and both verification joins must
    // stay equi-joins — a third nested loop means the corpus itself is
    // being crossed.
    val nlj = plan.split("\n").count(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
    assert(nlj <= 2, s"more than the two gated nested loops in plan:\n$plan")
    assert(plan.contains("HashJoin"), s"no hash join for grams/verification:\n$plan")
  }

  test("nearDupPairsBlockJoin: heavy packed blocks attach via equi-joins") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
    val plan = planOf(Similarity.nearDupPairsBlockJoin(
      emb, "vec_id", "embedding", 0.9, rowsPerBlock = 16))
    // the only cartesian is the B×B pair-key table of ints; the two
    // item-array joins must be hash/sort equi-joins
    val heavyJoins = plan.split("\n").count(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("__b"))
    assert(heavyJoins >= 2, s"expected 2 equi-joins on block ids:\n$plan")
  }
}
