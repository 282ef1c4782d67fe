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

  /** Runtime injection for sessions built without
    * [[graft.GraftExtensions]] (the [[MvRewrite.install]] twin).
    * `experimental.extraOptimizations` runs after the main optimizer —
    * the relation arrives as a post-pushdown DSv2 ScanRelation there,
    * which [[factsOf]] matches (refusing pushed filters). Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MetadataOnlyAgg))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MetadataOnlyAgg

  /** What a foldable relation must answer from metadata — implemented
    * by the DataFrame path's [[ManifestFileIndex]] (pinned snapshot)
    * and by the SQL-catalog path's (root, table, asOfTxn) coordinates
    * ([[graft.storage.MetadataAggHook]]). All three are exact-or-None:
    * a None anywhere keeps the scan. */
  private sealed trait Facts {
    def rowCount: Option[Long]
    def nonNull(col: String): Option[Long]
    /** (kind, lo, hi) — kind "t" carries micros-since-epoch Longs. */
    def bounds(col: String): Option[(String, Any, Any)]
  }

  private final case class IndexFacts(idx: ManifestFileIndex)
      extends Facts {
    def rowCount: Option[Long] = idx.exactRowCount
    def nonNull(col: String): Option[Long] = idx.exactNonNullCount(col)
    def bounds(col: String): Option[(String, Any, Any)] =
      idx.exactBounds(col)
  }

  /** SQL-catalog facts: `SELECT count(*)/min/max FROM cat.tbl` answers
    * from the manifest like the DataFrame path. The Snapshot helpers
    * already refuse under applicable merge-on-read deletes (equality or
    * DV — masked rows make metadata unknowable), and an entry missing a
    * stat (pre-ADD-COLUMN data whose exists-default fill only exists at
    * read, hive imports without counts) disables the answer — exact or
    * absent, never approximate. */
  private final case class SnapshotFacts(root: String, table: String,
      asOf: Option[Long]) extends Facts {
    import graft.storage.TxnCatalog
    private lazy val snap: Option[TxnCatalog.Snapshot] = scala.util.Try {
      val s = org.apache.spark.sql.SparkSession.active
      asOf.map(TxnCatalog.snapshotAt(s, root, _))
        .orElse(TxnCatalog.snapshot(s, root))
    }.toOption.flatten
    def rowCount: Option[Long] = snap.flatMap(_.rowCount(table))
    def nonNull(col: String): Option[Long] =
      snap.flatMap(_.columnNonNullCount(table, col))
    def bounds(col: String): Option[(String, Any, Any)] =
      snap.flatMap(_.columnBounds(table, col)).flatMap { cs =>
        cs.kind match {
          case "t" =>
            for { lo <- cs.min.toLongOption; hi <- cs.max.toLongOption }
              yield ("t", lo, hi)
          case k => Some((k, cs.min, cs.max))
        }
      }
  }

  /** The metadata facts behind `plan`, when `plan` is the bare relation
    * (or an attribute-only projection of it) — DataFrame path
    * (LogicalRelation over a [[ManifestFileIndex]]) or SQL-catalog path
    * (DSv2 relation/scan over a graft table; a scan with pushed filters
    * refuses in the hook). */
  private def factsOf(plan: LogicalPlan): Option[Facts] =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case m: ManifestFileIndex => Some(IndexFacts(m))
          case _ => None
        }
        case _ => None
      }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        graft.storage.MetadataAggHook.tableCoords(r.table)
          .map((SnapshotFacts.apply _).tupled)
      case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        graft.storage.MetadataAggHook.scanCoords(sr.scan)
          .map((SnapshotFacts.apply _).tupled)
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        factsOf(child)
      case _ => None
    }

  /** The manifest value for one aggregate expression, when that
    * aggregate is count(1)/count(*), min(attr), or max(attr) and the
    * manifest can answer it exactly; None disables the rewrite. */
  private def foldValue(e: Expression, facts: Facts): Option[Any] =
    e match {
      case Alias(c, _) => foldValue(c, facts)
      case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
          if v != null =>
        facts.rowCount
      // count(col) = Σ(rows − null count) when every entry recorded both
      case AggregateExpression(Count(Seq(a: AttributeReference)), _, false,
          None, _) =>
        facts.nonNull(a.name)
      case AggregateExpression(Min(a: AttributeReference), _, false, None, _) =>
        facts.bounds(a.name).flatMap { case (kind, lo, _) =>
          convert(kind, lo, a.dataType)
        }
      case AggregateExpression(Max(a: AttributeReference), _, false, None, _) =>
        facts.bounds(a.name).flatMap { case (kind, _, hi) =>
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
      factsOf(child) match {
        case Some(facts) =>
          val vals = exprs.map(foldValue(_, facts))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get))))
          else agg
        case None => agg
      }
  }
}
