package graft.plans

import graft.storage.ManifestFileIndex
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** `SELECT count(*) FROM <graft lake frame>` answered from the MANIFEST:
  * when an ungrouped, unfiltered count sits directly over a
  * [[ManifestFileIndex]]-backed relation and every manifest entry
  * carries its exact row count (recorded free at commit time), the whole
  * aggregate collapses to a one-row [[LocalRelation]] — zero file reads,
  * Delta's OptimizeMetadataOnlyQuery for this catalog.
  *
  * Soundness: the rewrite fires ONLY on the bare relation (optionally
  * under an attribute-only Project). Any Filter breaks the match; a
  * merge-on-read read with APPLICABLE equality deletes plans anti-joins
  * above the relation, so masked rows can never be counted from
  * metadata (inapplicable deletes leave the bare relation — and mask
  * nothing). One entry without a recorded count disables the rewrite —
  * a metadata answer is exact or it is not given.
  *
  * Injected by [[graft.GraftExtensions]]; the programmatic equivalent is
  * [[graft.storage.TxnCatalog.Snapshot.rowCount]].
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  /** The manifest index behind `plan`, when `plan` is the bare relation
    * (or an attribute-only projection of it). */
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

  /** count(*) / count(1) — a Count over one non-null literal, no
    * DISTINCT, no FILTER clause. */
  private def isCountStar(e: Expression): Boolean = e match {
    case Alias(c, _) => isCountStar(c)
    case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _) =>
      v != null
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty &&
        exprs.forall(isCountStar) =>
      indexOf(child).flatMap(_.exactRowCount) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(Seq.fill(exprs.size)(n))))
        case None => agg
      }
  }
}
