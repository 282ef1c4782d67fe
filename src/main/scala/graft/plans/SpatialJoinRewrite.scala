package graft.plans

import graft.geo.PointInPolygon
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType, StructType}

/** Optimizer rule: rewrite the NAIVE spatial containment join —
  * `points CROSS JOIN polys WHERE graft_contains(ring, x, y)` — into the
  * grid-bucketed equi-join (SURVEY J4) automatically.
  *
  * The naive formulation plans as CartesianProduct: O(|P|·|V|) pairs, a
  * non-starter at scale. The rewrite buckets the point side into one grid
  * cell per row and explodes the polygon side per bbox-overlapped cell
  * (cell-x and cell-y ranges as two Generate nodes), so the join becomes a
  * hash equi-join on the packed cell id with the exact ray-casting test
  * kept as a post-join conjunct — identical results (a candidate pair
  * meets in exactly one cell: the point's), shuffle-sized by candidates
  * instead of the cross product. This is the rewrite
  * [[graft.geo.SpatialJoin.pointInPolygonJoin]] performs by hand; the rule
  * gives it to ad-hoc SQL (`spark.sql(... graft_contains ...)`) for free.
  *
  * All injected expressions are built as RESOLVED Catalyst nodes (manual
  * `NamedLambdaVariable` binding — the Column API would inject unresolved
  * functions into an already-analyzed plan). Cell size comes from
  * `spark.graft.spatialJoin.cellSize` (default 1.0; set to a typical
  * polygon bbox edge).
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val CellSizeConf = "spark.graft.spatialJoin.cellSize"
  private val Pack = 1000000L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // post-pushdown shape: the predicate already lives in the join condition
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if !alreadyRewritten(j) =>
      findPip(cond, left, right) match {
        case Some((pip, pointsOnLeft)) =>
          val cellSize = conf.getConfString(CellSizeConf, "1.0").toDouble
          val polys = if (pointsOnLeft) right else left
          val cs = Literal(cellSize)

          // point side: floor(x/cs)*Pack + floor(y/cs) — matches Geo.pointCell
          def cellOf(c: Expression): Expression =
            Cast(Floor(Divide(c, cs)), LongType)
          val pointCell = Add(
            Multiply(cellOf(pip.second), Literal(Pack)), cellOf(pip.third))

          // polygon side: explode cell-x and cell-y ranges of the ring bbox
          val ringType = pip.first.dataType.asInstanceOf[ArrayType]
          val elemType = ringType.elementType.asInstanceOf[StructType]
          def fieldOf(name: String): Expression = {
            val v = NamedLambdaVariable("p", elemType, ringType.containsNull)
            ArrayTransform(pip.first,
              LambdaFunction(
                GetStructField(v, elemType.fieldIndex(name), Some(name)), Seq(v)))
          }
          def range(agg: Expression => Expression,
              f: String): Expression = cellOf(agg(fieldOf(f)))
          val cxAttr = AttributeReference("__graft_cx", LongType)()
          val cyAttr = AttributeReference("__graft_cy", LongType)()
          val genX = Generate(
            Explode(Sequence(range(ArrayMin, "x"), range(ArrayMax, "x"), None,
              Some(conf.sessionLocalTimeZone))),
            Nil, outer = false, None, Seq(cxAttr), polys)
          val genY = Generate(
            Explode(Sequence(range(ArrayMin, "y"), range(ArrayMax, "y"), None,
              Some(conf.sessionLocalTimeZone))),
            Nil, outer = false, None, Seq(cyAttr), genX)
          val polyCell = Add(Multiply(cxAttr, Literal(Pack)), cyAttr)

          val (newLeft, newRight) =
            if (pointsOnLeft) (left, genY) else (genY, right)
          val bucketed = Join(newLeft, newRight, Inner,
            Some(And(EqualTo(pointCell, polyCell), cond)), hint)
          // drop the helper cell columns so parents see the original schema
          Project(j.output, bucketed)
        case None => j
      }
  }

  private def alreadyRewritten(j: Join): Boolean =
    (j.left.output ++ j.right.output).exists(_.name.startsWith("__graft_c"))

  /** The PointInPolygon conjunct linking the two sides, if any, and whether
    * the point coordinates come from the left side. */
  private def findPip(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(PointInPolygon, Boolean)] =
    splitConjunctivePredicates(cond).collectFirst {
      case pip: PointInPolygon
          if pip.second.references.subsetOf(left.outputSet) &&
            pip.third.references.subsetOf(left.outputSet) &&
            pip.first.references.subsetOf(right.outputSet) &&
            pip.first.references.nonEmpty =>
        (pip, true)
      case pip: PointInPolygon
          if pip.second.references.subsetOf(right.outputSet) &&
            pip.third.references.subsetOf(right.outputSet) &&
            pip.first.references.subsetOf(left.outputSet) &&
            pip.first.references.nonEmpty =>
        (pip, false)
    }
}
