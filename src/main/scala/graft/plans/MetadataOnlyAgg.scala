package graft.plans

import graft.storage.ManifestFileIndex
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `SELECT count(*) / min(col) / max(col) FROM <graft lake frame>`
  * answered from the MANIFEST: when an ungrouped, unfiltered aggregate
  * of only these shapes sits directly over a [[ManifestFileIndex]]-backed
  * relation and the manifest carries what each needs — row counts for
  * count(*), per-entry column stats for min/max — the whole aggregate
  * collapses to a one-row [[LocalRelation]] with zero file reads:
  * Delta's OptimizeMetadataOnlyQuery for this catalog, extended to the
  * freshness probe (`max(ts)`) every incremental consumer runs.
  *
  * Soundness: the rewrite fires ONLY on the bare relation (optionally
  * under an attribute-only Project). Any Filter breaks the match; a
  * merge-on-read read with APPLICABLE equality deletes plans anti-joins
  * above the relation, so masked rows can never be answered from
  * metadata (inapplicable deletes leave the bare relation — and mask
  * nothing). Min/max fold the RECORDED cast-to-string stats kind-true
  * (numeric as BigDecimal, strings in UTF-8 order, timestamps as
  * micros) and convert back to the column's exact type — Spark's
  * value→string rendering round-trips every supported type, and any
  * entry missing a stat, a kind/type mismatch, NaN/Infinity bounds, or
  * an aggregate shape outside count(1)/min/max disables the whole
  * rewrite: a metadata answer is exact or it is not given. Stats record
  * non-null extremes, matching SQL MIN/MAX null-skipping; an all-null
  * or empty column has no stat and therefore keeps the scan.
  *
  * Injected by [[graft.GraftExtensions]]; programmatic equivalents are
  * [[graft.storage.TxnCatalog.Snapshot.rowCount]] and
  * [[graft.storage.TxnCatalog.Snapshot.columnBounds]].
  */
object MetadataOnlyAgg extends Rule[LogicalPlan] {

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

  /** The manifest value for one aggregate expression, when that
    * aggregate is count(1)/count(*), min(attr), or max(attr) and the
    * manifest can answer it exactly; None disables the rewrite. */
  private def foldValue(e: Expression, idx: ManifestFileIndex): Option[Any] =
    e match {
      case Alias(c, _) => foldValue(c, idx)
      case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
          if v != null =>
        idx.exactRowCount
      // count(col) = Σ(rows − null count) when every entry recorded both
      case AggregateExpression(Count(Seq(a: AttributeReference)), _, false,
          None, _) =>
        idx.exactNonNullCount(a.name)
      case AggregateExpression(Min(a: AttributeReference), _, false, None, _) =>
        idx.exactBounds(a.name).flatMap { case (kind, lo, _) =>
          convert(kind, lo, a.dataType)
        }
      case AggregateExpression(Max(a: AttributeReference), _, false, None, _) =>
        idx.exactBounds(a.name).flatMap { case (kind, _, hi) =>
          convert(kind, hi, a.dataType)
        }
      case _ => None
    }

  /** Rendered stat value → the column type's INTERNAL representation.
    * Every conversion here is an exact inverse of the stat rendering
    * (`cast(value as string)` / unix micros); anything else → None. */
  private def convert(kind: String, v: Any, dt: DataType): Option[Any] =
    (kind, dt) match {
      case ("t", TimestampType) => Some(v) // already micros-since-epoch
      case ("s", StringType) => Some(UTF8String.fromString(v.toString))
      case ("n", _) =>
        val s = v.toString
        dt match {
          case LongType    => s.toLongOption
          case IntegerType => s.toIntOption
          case ShortType   => s.toShortOption
          case ByteType    => s.toByteOption
          case DoubleType  => s.toDoubleOption
          case FloatType   => s.toFloatOption
          case d: DecimalType =>
            try {
              val dec = Decimal(new java.math.BigDecimal(s))
              if (dec.changePrecision(d.precision, d.scale)) Some(dec)
              else None
            } catch { case _: NumberFormatException => None }
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty =>
      indexOf(child) match {
        case Some(idx) =>
          val vals = exprs.map(foldValue(_, idx))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get))))
          else agg
        case None => agg
      }
  }
}
