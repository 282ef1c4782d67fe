package graft.plans

import graft.storage.{GraftLake, ManifestFileIndex, MaterializedAgg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent MATERIALIZED-VIEW rewrite: a `GROUP BY` aggregation over
  * a lake table is answered from a [[MaterializedAgg]] view of that
  * table when one exists, matches the query's exact group/aggregate
  * shape, and is provably CURRENT for the scan's pinned snapshot — the
  * k-groups view read replaces the full-table scan + shuffle +
  * aggregation, turning a fact-table rollup into a KB-scale read
  * (Databricks/Calcite materialized-view rewriting, scoped to this
  * catalog's additive views).
  *
  * Soundness gates, every one conservative:
  *  - the aggregate must sit DIRECTLY over the bare
  *    [[ManifestFileIndex]] relation (or an attribute-only projection)
  *    — any Filter, join, or expression in between keeps the scan;
  *  - grouping keys must be plain column references matching the
  *    view's group columns exactly (same set);
  *  - every output must map: a grouping column, `count(*)`,
  *    `sum/min/max(col)` (non-distinct, unfiltered) over a column the
  *    view stores — anything else keeps the scan;
  *  - the view must be CURRENT at the scan's own pinned snapshot
  *    ([[MaterializedAgg.currentViews]]: every source entry at or
  *    before the watermark, no newer deletes, no restore in between) —
  *    a stale view never answers;
  *  - merge-on-read deletes compose above the relation as anti-joins,
  *    so a masked read never presents the bare relation and cannot be
  *    rewritten (the same structural guarantee [[MetadataOnlyAgg]]
  *    relies on).
  *
  * Output attributes keep the aggregate's exprIds (aliased one-to-one),
  * so parent operators resolve unchanged; `sum` columns cast from the
  * view's pinned storage width back to the plan's aggregate type, and
  * non-nullable outputs (count) are re-asserted with [[KnownNotNull]].
  * Injected by [[graft.GraftExtensions]].
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** Post-hoc hook for sessions not built with
    * `spark.sql.extensions=graft.GraftExtensions` (the
    * [[GraftLake]]-level twin of [[graft.storage.GraftMerge.install]]).
    * Idempotent. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite

  private def indexOf(plan: LogicalPlan): Option[ManifestFileIndex] =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case m: ManifestFileIndex => Some(m)
          case _ => None
        }
        case _ => None
      }
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        indexOf(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupExprs, _, child, _)
        if groupExprs.nonEmpty &&
          groupExprs.forall(_.isInstanceOf[AttributeReference]) =>
      indexOf(child).flatMap(rewrite(agg, _)).getOrElse(agg)
  }

  private def rewrite(agg: Aggregate,
      idx: ManifestFileIndex): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val views = MaterializedAgg.currentViews(spark, idx.lakeRoot,
      idx.snapshot, idx.lakeTable)
    if (views.isEmpty) return None
    val groupNames = agg.groupingExpressions
      .map(_.asInstanceOf[AttributeReference].name)
    views.iterator.flatMap { case (view, gcols, aggSpecs) =>
      val exact = gcols.sorted == groupNames.sorted.distinct
      // ROLLUP: grouping by a strict SUBSET of the view's group columns
      // re-aggregates the k-row view (counts/sums re-sum, min/max
      // re-combine) — one view serves every coarser rollup of itself
      val subset = !exact && groupNames.toSet.subsetOf(gcols.toSet)
      if (!exact && !subset) None
      else GraftLake.tableAt(spark, idx.lakeRoot, view, idx.snapshot)
        .flatMap { mvDf =>
          val mvPlan = mvDf.queryExecution.analyzed
          val byName = mvPlan.output.map(a => a.name -> a).toMap
          val stored = aggSpecs.map(_.alias).toSet
          def storedCol(alias: String): Option[Attribute] =
            if (stored(alias)) byName.get(alias) else None
          // the view-side expression for one output; for the rollup
          // path the aggregate re-aggregates instead of projecting
          def exprFor(ne: NamedExpression): Option[Expression] = ne match {
            case a: AttributeReference if groupNames.contains(a.name) =>
              byName.get(a.name)
            case Alias(AggregateExpression(fn, _, false, None, _), _) =>
              def agg2(f: AggregateFunction): Expression =
                f.toAggregateExpression()
              // count(col) answers from the stored non-null count
              // `cnt_<col>` — or from `cnt` (count(*)) when the column
              // is non-nullable by schema, where the two are equal
              def nonNullCnt(a: AttributeReference): Option[Attribute] =
                storedCol(s"cnt_${a.name}").orElse(
                  if (!a.nullable) storedCol("cnt") else None)
              fn match {
                case Count(Seq(Literal(v, _))) if v != null =>
                  storedCol("cnt").map { c =>
                    if (exact) c: Expression
                    else Cast(agg2(Sum(c)), c.dataType)
                  }
                case Count(Seq(a: AttributeReference)) =>
                  nonNullCnt(a).map { c =>
                    if (exact) c: Expression
                    else Cast(agg2(Sum(c)), c.dataType)
                  }
                // avg(col) = sum_<col> / cnt_<col>, both stored
                // additively. Non-decimal inputs only: Spark's Average
                // computes them in DOUBLE, which this division
                // reproduces; the decimal path's precision/rounding
                // rules (DecimalPrecision) are not replicated here, so
                // decimal avg conservatively keeps the scan.
                case Average(a: AttributeReference, _)
                    if !a.dataType.isInstanceOf[
                      org.apache.spark.sql.types.DecimalType] =>
                  for {
                    sc <- storedCol(s"sum_${a.name}")
                    cc <- nonNullCnt(a)
                  } yield {
                    val (se, ce) =
                      if (exact) (sc: Expression, cc: Expression)
                      else (agg2(Sum(sc)), agg2(Sum(cc)))
                    val dbl = org.apache.spark.sql.types.DoubleType
                    val div: Expression =
                      Divide(Cast(se, dbl), Cast(ce, dbl))
                    if (div.dataType == ne.dataType) div
                    else Cast(div, ne.dataType)
                  }
                case Sum(a: AttributeReference, _) =>
                  storedCol(s"sum_${a.name}").map { c =>
                    val e = if (exact) c: Expression else agg2(Sum(c))
                    if (e.dataType == ne.dataType) e
                    else Cast(e, ne.dataType)
                  }
                case Min(a: AttributeReference) =>
                  storedCol(s"min_${a.name}")
                    .map(c => if (exact) c: Expression else agg2(Min(c)))
                case Max(a: AttributeReference) =>
                  storedCol(s"max_${a.name}")
                    .map(c => if (exact) c: Expression else agg2(Max(c)))
                case _ => None
              }
            case _ => None
          }
          val mapped = agg.aggregateExpressions.map { ne =>
            exprFor(ne).map { e =>
              val out = ne.toAttribute
              val e2 =
                if (!out.nullable && e.nullable) KnownNotNull(e) else e
              Alias(e2, ne.name)(exprId = ne.exprId)
            }
          }
          if (!mapped.forall(_.isDefined)) None
          else if (exact) Some(Project(mapped.map(_.get), mvPlan))
          else Some(Aggregate(
            groupNames.distinct.map(byName(_)), mapped.map(_.get), mvPlan))
        }
    }.nextOption()
  }
}
