package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injection point: registers graft's native expressions
  * permanently for a session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (cluster-wide,
  * no per-session register() call needed), plus two optimizer rules:
  * [[graft.plans.SpatialJoinRewrite]], which turns the naive
  * cross-join + graft_contains formulation into the J4 grid-bucketed
  * equi-join, and [[graft.plans.MetadataOnlyAgg]], which answers
  * unfiltered count(*)/min/max over a lake frame from the manifest's
  * recorded row counts and column stats. Catalyst's stock optimizations cover every other plan shape
  * this engine produces (SURVEY §4) — rules are injected only where the
  * stock optimizer provably can't get there (a CartesianProduct is
  * semantically opaque to it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - native dot product of two double/float arrays"),
      (exprs: Seq[Expression]) => expressions.DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit simhash of a string array"),
      (exprs: Seq[Expression]) => expressions.SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - k-element minhash signature"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(k, _) =>
          expressions.MinHashSignature(exprs.head, k.toString.toInt)
        case other => throw new IllegalArgumentException(
          s"graft_minhash k must be a literal, got $other")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_contains"),
      info("graft_contains", "graft_contains(ring, x, y) - ray-casting point in polygon"),
      (exprs: Seq[Expression]) => geo.PointInPolygon(exprs.head, exprs(1), exprs(2))))
    ext.injectTableFunction((
      FunctionIdentifier(graft.storage.ChangesTvf.Name),
      info(graft.storage.ChangesTvf.Name,
        "graft_table_changes(ident, fromTxn, toTxn) - CDC rows of a " +
          "graft-lake table in the txn window (fromTxn, toTxn]"),
      (exprs: Seq[Expression]) => graft.storage.ChangesTvf.builder(exprs)))
    ext.injectOptimizerRule(_ => plans.SpatialJoinRewrite)
    ext.injectOptimizerRule(_ => plans.MetadataOnlyAgg)
    ext.injectOptimizerRule(_ => plans.MvRewrite)
    // SQL MERGE INTO over graft-lake catalog tables (keyed shapes via
    // merge-on-read; see graft.storage.GraftMerge). Sessions built
    // without extensions install it at runtime via GraftMerge.install.
    ext.injectPlannerStrategy(_ => new graft.storage.GraftMergeStrategy)
  }
}
