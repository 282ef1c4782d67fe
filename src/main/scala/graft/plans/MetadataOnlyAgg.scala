package graft.plans

import graft.storage.{ManifestFileIndex, TxnCatalog}
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
  * Two further arms extend the same contract: `GROUP BY` columns that
  * are CONSTANT per manifest entry (recorded min == max, zero nulls —
  * identity-partitioned layouts, hive-synthesized import columns) fold
  * per-group, and a deterministic WHERE over such columns prunes
  * entries before either fold (each entry keeps all rows or none, so
  * the survivors are exactly attributable) — `SELECT day, count(*)
  * FROM t WHERE region = 'eu' GROUP BY day` as one driver-side
  * manifest read, Iceberg's `partitions` metadata table as a rewrite.
  *
  * Soundness: the rewrite fires ONLY on the bare relation (optionally
  * under an attribute-only Project, optionally under the ONE
  * constant-column Filter described above). Any other Filter breaks the match; a
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
    * which [[factsOf]] matches; a scan carrying pushed predicates
    * folds through [[FilteredFacts]] (the pushed filters re-derive the
    * surviving entry set) when every predicate references only
    * constant-per-entry columns, and refuses otherwise. Idempotent. */
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
    /** Exact BigDecimal total of the per-entry recorded sums. */
    def colSum(col: String): Option[java.math.BigDecimal]
    /** (kind, lo, hi) — kind "t" carries micros-since-epoch Longs. */
    def bounds(col: String): Option[(String, Any, Any)]
    /** Per live data entry: (column stats, row count) — the entry grain
      * the GROUP BY fold needs. None when merge-on-read deletes may
      * mask rows (SQL path; the DataFrame path is structurally safe —
      * composed deletes put joins above the bare relation). */
    def perEntry: Option[Seq[(Map[String, TxnCatalog.ColStat], Option[Long])]]
  }

  private final case class IndexFacts(idx: ManifestFileIndex)
      extends Facts {
    def rowCount: Option[Long] = idx.exactRowCount
    def nonNull(col: String): Option[Long] = idx.exactNonNullCount(col)
    def colSum(col: String): Option[java.math.BigDecimal] =
      idx.exactSum(col)
    def bounds(col: String): Option[(String, Any, Any)] =
      idx.exactBounds(col)
    def perEntry: Option[Seq[(Map[String, TxnCatalog.ColStat], Option[Long])]] =
      Some(idx.entryFacts)
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
    def colSum(col: String): Option[java.math.BigDecimal] =
      snap.flatMap(_.columnSum(table, col))
    def perEntry: Option[Seq[(Map[String, TxnCatalog.ColStat], Option[Long])]] =
      snap.flatMap(_.entryFactsClean(table))
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

  /** Facts for a scan that carries PUSHED predicates: not the bare
    * table, so every whole-table helper refuses — but the entry grain
    * stays answerable by re-deriving the surviving entry set from the
    * pushed predicates with the SAME bind-and-eval the pre-pushdown
    * Filter arm uses ([[filterEntries]]: every referenced column
    * constant per entry, Catalyst evaluates the substituted tree).
    * This is what lets an `install()`-only session — where
    * `extraOptimizations` runs AFTER pushdown has consumed the Filter
    * into the scan — still fold `count(*) … WHERE region = 'eu'`.
    * Sound regardless of whether the residual Filter also survives
    * above the scan (this catalog keeps every pushed filter residual):
    * re-applying the same deterministic predicate to the kept entries
    * is idempotent. */
  private final case class FilteredFacts(inner: Facts, cond: Expression)
      extends Facts {
    def rowCount: Option[Long] = None
    def nonNull(col: String): Option[Long] = None
    def colSum(col: String): Option[java.math.BigDecimal] = None
    def bounds(col: String): Option[(String, Any, Any)] = None
    def perEntry: Option[Seq[(Map[String, TxnCatalog.ColStat], Option[Long])]] =
      inner.perEntry.flatMap(filterEntries(cond, _))
  }

  /** One pushed [[org.apache.spark.sql.sources.Filter]] → the Catalyst
    * predicate it was translated FROM, re-resolved against the
    * relation's own attributes — so the filtered-fold arm evaluates
    * pushed predicates through the exact same expression machinery as
    * a plan Filter. Pushed values are external Scala types already
    * type-aligned with their column by Spark's translation;
    * `Literal(v)` inverts that rendering. Any untranslatable shape or
    * unresolvable column → None, which refuses the whole fold (an
    * unaccounted pushed predicate could prune rows the fold would
    * still count). */
  private def pushedToExpr(f: org.apache.spark.sql.sources.Filter,
      attrs: Map[String, Attribute]): Option[Expression] = {
    import org.apache.spark.sql.{sources => sf}
    def a(name: String): Option[Attribute] = attrs.get(name)
    def l(v: Any): Option[Expression] =
      scala.util.Try(Literal(v)).toOption
    f match {
      case sf.EqualTo(c, v) => for (x <- a(c); y <- l(v)) yield EqualTo(x, y)
      case sf.EqualNullSafe(c, v) =>
        for (x <- a(c); y <- l(v)) yield EqualNullSafe(x, y)
      case sf.GreaterThan(c, v) =>
        for (x <- a(c); y <- l(v)) yield GreaterThan(x, y)
      case sf.GreaterThanOrEqual(c, v) =>
        for (x <- a(c); y <- l(v)) yield GreaterThanOrEqual(x, y)
      case sf.LessThan(c, v) =>
        for (x <- a(c); y <- l(v)) yield LessThan(x, y)
      case sf.LessThanOrEqual(c, v) =>
        for (x <- a(c); y <- l(v)) yield LessThanOrEqual(x, y)
      case sf.In(c, vs) =>
        val lits = vs.toSeq.map(l)
        if (lits.exists(_.isEmpty)) None
        else a(c).map(x => In(x, lits.map(_.get)))
      case sf.IsNull(c) => a(c).map(IsNull)
      case sf.IsNotNull(c) => a(c).map(IsNotNull)
      case sf.StringStartsWith(c, p) =>
        a(c).map(x => StartsWith(x, Literal(p)))
      case sf.StringEndsWith(c, p) =>
        a(c).map(x => EndsWith(x, Literal(p)))
      case sf.StringContains(c, p) =>
        a(c).map(x => Contains(x, Literal(p)))
      case sf.And(x, y) =>
        for (xe <- pushedToExpr(x, attrs); ye <- pushedToExpr(y, attrs))
          yield And(xe, ye)
      case sf.Or(x, y) =>
        for (xe <- pushedToExpr(x, attrs); ye <- pushedToExpr(y, attrs))
          yield Or(xe, ye)
      case sf.Not(x) => pushedToExpr(x, attrs).map(Not)
      case _ => None
    }
  }

  /** The metadata facts behind `plan`, when `plan` is the bare relation
    * (or an attribute-only projection of it) — DataFrame path
    * (LogicalRelation over a [[ManifestFileIndex]]) or SQL-catalog path
    * (DSv2 relation/scan over a graft table). A scan carrying pushed
    * filters yields [[FilteredFacts]] when every pushed predicate
    * converts back to a bindable Catalyst expression; otherwise None. */
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
        graft.storage.MetadataAggHook.scanCoordsWithFilters(sr.scan)
          .flatMap { case (coords, pushed) =>
            val base = (SnapshotFacts.apply _).tupled(coords)
            if (pushed.isEmpty) Some(base)
            else {
              // resolve pushed column names against the RELATION's full
              // attribute set (a filter column may be pruned out of the
              // scan's output)
              val attrs: Map[String, Attribute] =
                sr.relation.output.map(a => a.name -> (a: Attribute)).toMap
              val exprs = pushed.toSeq.map(pushedToExpr(_, attrs))
              if (exprs.exists(_.isEmpty)) None
              else Some(FilteredFacts(base,
                exprs.map(_.get).reduce(And)))
            }
          }
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
      case AggregateExpression(s @ Sum(a: AttributeReference, _), _, false,
          None, _) =>
        val ansiUnsafe = isAnsiSum(s) && s.dataType == LongType &&
          !facts.perEntry.exists(ansiLongSafe(_, a.name))
        facts.colSum(a.name).flatMap(convertSum(_, s.dataType, ansiUnsafe))
      case AggregateExpression(av: Average, _, false, None, _)
          if avgFoldable(av) =>
        val a = av.child.asInstanceOf[AttributeReference]
        for {
          total <- facts.colSum(a.name)
          n <- facts.nonNull(a.name)
          v <- evalAverage(av, total, n)
        } yield v
      case _ => None
    }

  /** avg folds ONLY for decimal columns: Spark sums integral and
    * floating averages in a DOUBLE buffer, which is evaluation-order-
    * dependent — no recorded total could reproduce a scan's value
    * bit-for-bit. A decimal child keeps exact decimal arithmetic end
    * to end. */
  private def avgFoldable(av: Average): Boolean =
    av.child.isInstanceOf[AttributeReference] &&
      av.child.dataType.isInstanceOf[DecimalType]

  /** avg(decimal) from the manifest by evaluating Spark's OWN
    * [[Average.evaluateExpression]] with the exact recorded total and
    * non-null count substituted for the sum/count buffer attributes —
    * the division, precision, and rounding semantics are Spark's by
    * construction, never a re-implementation that could drift. Refuses
    * when the total does not fit the sum buffer type (there the scan
    * itself overflows) or when evaluation fails (ANSI overflow — the
    * scan surfaces it, a fold must not preempt it). */
  private def evalAverage(av: Average, total: java.math.BigDecimal,
      n: Long): Option[Any] = av.sumDataType match {
    case sdt: DecimalType =>
      val sumDec = Decimal(total)
      if (!sumDec.changePrecision(sdt.precision, sdt.scale)) return None
      val sub = av.evaluateExpression.transform {
        case r: AttributeReference if r.exprId == av.sum.exprId =>
          Literal(sumDec, sdt)
        case r: AttributeReference if r.exprId == av.count.exprId =>
          Literal(n, LongType)
      }
      scala.util.Try(Option(sub.eval(null))).toOption.flatten
    case _ => None
  }

  /** An exact BigDecimal total → the Sum aggregate's result type, or
    * None when it does not FIT — out-of-range keeps the scan, so the
    * fold can never differ from the scan's own final-value overflow
    * behavior (wrap, null, or error — all only reachable via the scan).
    * `ansiUnsafe` refuses an integral sum whose ANSI scan could raise
    * on an order-dependent intermediate PARTIAL sum even though the
    * mathematical total fits Long (e.g. rows reaching Long.MaxValue
    * before a trailing negative) — an error a fold must never
    * suppress; see [[ansiLongSafe]] for the proof obligation. Decimal
    * sums keep folding under ANSI: both the scan buffer and the
    * recorded per-entry sums are Decimal(38,s) — an intermediate
    * exceeding 38 digits while the final fits is unreachable for any
    * realistic row count, and the final-fit check here matches the
    * scan's own result-precision gate. */
  private def convertSum(total: java.math.BigDecimal, dt: DataType,
      ansiUnsafe: Boolean): Option[Any] = dt match {
    case LongType if !ansiUnsafe =>
      try Some(total.longValueExact())
      catch { case _: ArithmeticException => None }
    case d: DecimalType =>
      val dec = Decimal(total)
      if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
    case _ => None
  }

  /** Sum modes whose SCAN outcome can depend on an order-sensitive
    * intermediate partial overflow even when the total fits Long: ANSI
    * raises, TRY (try_sum) returns NULL — either way an outcome the
    * fold must not preempt unless [[ansiLongSafe]] proves no partial
    * can overflow. LEGACY wraps modulo 2⁶⁴, where a fitting total IS
    * the scan's answer in every order. */
  private def isAnsiSum(s: Sum): Boolean =
    s.evalContext.evalMode == EvalMode.ANSI ||
      s.evalContext.evalMode == EvalMode.TRY

  /** Is an ANSI Long-buffer sum over these entries provably free of
    * intermediate overflow in EVERY evaluation order? Sufficient exact
    * bound: every partial sum of any subset of rows in any order lies
    * within ±Σ_entries rows·max(|lo|, |hi|) — when that bound fits
    * Long, no per-row accumulation path can leave Long range, so the
    * fold cannot suppress an error the scan would raise. Any missing
    * row count, missing/unparseable stat, or a bound past Long.MaxValue
    * refuses (false). */
  private def ansiLongSafe(
      es: Seq[(Map[String, TxnCatalog.ColStat], Option[Long])],
      col: String): Boolean = scala.util.Try {
    val bound = es.map { case (st, r) =>
      val s = st(col)
      val mag = new java.math.BigDecimal(s.min).abs
        .max(new java.math.BigDecimal(s.max).abs)
      mag.multiply(java.math.BigDecimal.valueOf(r.get))
    }.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    bound.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) <= 0
  }.getOrElse(false)

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

  /** Stat string → the [[Facts.bounds]] value convention ("t" carries
    * micros-since-epoch Longs); None when a timestamp bound does not
    * parse. */
  private def statVal(kind: String, s: String): Option[Any] =
    if (kind == "t") s.toLongOption else Some(s)

  /** Canonical group-key rendering: numeric stats normalize through
    * BigDecimal (exact for every keyable numeric — float/double are
    * refused as keys) so the SAME value recorded under two scales keys
    * one group. A decimal widening (`ALTER COLUMN TYPE decimal(10,0) →
    * decimal(12,2)`) makes pre-alter entries render `5` while
    * post-alter entries render `5.00`; raw-string keying would split
    * one logical group into two rows with identical output values.
    * Strings and timestamp-micros renderings are already canonical. */
  private def canonKey(kind: String, s: String): String =
    if (kind == "n")
      try new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
      catch { case _: NumberFormatException => s }
    else s

  /** Types usable as a GROUP key or inside a folded WHERE. Float and
    * double are refused: ±0.0 and NaN sit on the fault line between
    * Spark's interpreted orderings and codegen `==` (grouping
    * normalizes -0.0 to 0.0, comparisons don't), so a metadata answer
    * could diverge from a scan's in exactly those corners — and a
    * partition key is never realistically a float. Aggregating min/max
    * OVER doubles stays allowed (bounds fold, no equality involved). */
  private def keyableType(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => false
    case _ => true
  }

  /** Table-level bounds of `col` over ONE group's entries — the
    * per-group [[Facts.bounds]]: every entry must carry the stat,
    * folded kind-true by [[TxnCatalog.foldColStats]]. */
  private def groupBounds(
      es: Seq[(Map[String, TxnCatalog.ColStat], Option[Long])],
      col: String): Option[(String, Any, Any)] = {
    val sts = es.map(_._1.get(col))
    if (sts.exists(_.isEmpty)) None
    else TxnCatalog.foldColStats(sts.flatten).flatMap { cs =>
      for { lo <- statVal(cs.kind, cs.min); hi <- statVal(cs.kind, cs.max) }
        yield (cs.kind, lo, hi)
    }
  }

  /** One output expression's value for ONE group — [[foldValue]]'s
    * shapes evaluated over the group's entries, plus the grouping
    * attributes themselves (constant within the group by construction). */
  private def foldGroupValue(e: Expression, keys: Map[ExprId, Any],
      es: Seq[(Map[String, TxnCatalog.ColStat], Option[Long])])
      : Option[Any] = e match {
    case Alias(c, _) => foldGroupValue(c, keys, es)
    case a: AttributeReference if keys.contains(a.exprId) =>
      keys.get(a.exprId)
    case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
        if v != null =>
      val rs = es.map(_._2)
      if (rs.exists(_.isEmpty)) None else Some(rs.flatten.sum)
    case AggregateExpression(Count(Seq(a: AttributeReference)), _, false,
        None, _) =>
      val per = es.map { case (st, r) =>
        for { rr <- r; s <- st.get(a.name); n <- s.nulls } yield rr - n }
      if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
    // count(DISTINCT c) when EVERY entry holds c constant (recorded
    // min == max): the distinct set is exactly the distinct canonical
    // renderings — "how many days does this table span" at manifest
    // cost. Nulls don't disturb it (DISTINCT skips them; a stat's
    // presence pins the one non-null value); an entry with NO stat
    // could be all-null or unmeasured — indistinguishable, so refuse.
    case AggregateExpression(Count(Seq(a: AttributeReference)), _, true,
        None, _) =>
      val keys = es.map(_._1.get(a.name).filter(st =>
        keyableType(a.dataType) && st.min == st.max &&
          statVal(st.kind, canonKey(st.kind, st.min))
            .flatMap(convert(st.kind, _, a.dataType)).isDefined)
        .map(st => (st.kind, canonKey(st.kind, st.min))))
      if (keys.exists(_.isEmpty)) None
      else Some(keys.flatten.distinct.size.toLong)
    case AggregateExpression(Min(a: AttributeReference), _, false, None, _) =>
      groupBounds(es, a.name).flatMap { case (kind, lo, _) =>
        convert(kind, lo, a.dataType) }
    case AggregateExpression(Max(a: AttributeReference), _, false, None, _) =>
      groupBounds(es, a.name).flatMap { case (kind, _, hi) =>
        convert(kind, hi, a.dataType) }
    case AggregateExpression(s @ Sum(a: AttributeReference, _), _, false,
        None, _) =>
      val ansiUnsafe = isAnsiSum(s) && s.dataType == LongType &&
        !ansiLongSafe(es, a.name)
      groupSum(es, a.name).flatMap(convertSum(_, s.dataType, ansiUnsafe))
    case AggregateExpression(av: Average, _, false, None, _)
        if avgFoldable(av) =>
      val a = av.child.asInstanceOf[AttributeReference]
      val nn = es.map { case (st, r) =>
        for { rr <- r; s <- st.get(a.name); n <- s.nulls } yield rr - n }
      for {
        total <- groupSum(es, a.name)
        n <- if (nn.exists(_.isEmpty)) None else Some(nn.flatten.sum)
        v <- evalAverage(av, total, n)
      } yield v
    case _ => None
  }

  /** Exact BigDecimal total of one group's recorded per-entry sums —
    * Some only when EVERY entry carries one. */
  private def groupSum(
      es: Seq[(Map[String, TxnCatalog.ColStat], Option[Long])],
      col: String): Option[java.math.BigDecimal] = {
    val per = es.map(_._1.get(col).flatMap(_.sum))
    if (per.exists(_.isEmpty)) None
    else scala.util.Try(per.flatten
      .map(new java.math.BigDecimal(_)).reduce(_.add(_))).toOption
  }

  /** `GROUP BY <constant-per-entry columns>` answered from the
    * manifest — Iceberg's `partitions` metadata table as an optimizer
    * rewrite. Every live entry must hold each grouping column CONSTANT
    * (recorded min == max with ZERO recorded nulls — identity-
    * partitioned layouts, hive-synthesized import columns), which
    * attributes each entry to exactly one group; per-group aggregates
    * then fold like the ungrouped arm (count(*) = Σ rows, count(col) =
    * Σ(rows − nulls), min/max from the group's entry stats). Groups are
    * keyed by the RENDERED stat strings — key equality is exactly "same
    * recorded rendering", never a lossy numeric comparison — and any
    * refusal anywhere (missing stat, nulls in a group column, a shape
    * outside the folded set) keeps the scan: exact or not given. */
  private def foldGrouped(groups: Seq[AttributeReference],
      exprs: Seq[NamedExpression],
      entries: Seq[(Map[String, TxnCatalog.ColStat], Option[Long])])
      : Option[Seq[InternalRow]] = {
    val keyed: Seq[Option[(Seq[(String, String)],
        (Map[String, TxnCatalog.ColStat], Option[Long]))]] =
      entries.map { case e @ (stats, _) =>
        val key = groups.map { g =>
          stats.get(g.name).filter(st =>
            keyableType(g.dataType) &&
              st.min == st.max && st.nulls.contains(0L) &&
              statVal(st.kind, canonKey(st.kind, st.min))
                .flatMap(convert(st.kind, _, g.dataType)).isDefined)
            .map(st => (st.kind, canonKey(st.kind, st.min)))
        }
        if (key.exists(_.isEmpty)) None
        else Some((key.map(_.get), e))
      }
    if (keyed.exists(_.isEmpty)) return None
    val rows = keyed.flatten.groupBy(_._1).toSeq
      .sortBy(_._1.map(kv => kv._1 + ":" + kv._2).mkString(" | "))
      .map { case (key, group) =>
        val keyVals: Map[ExprId, Any] = groups.zip(key).map {
          case (g, (kind, s)) =>
            g.exprId -> statVal(kind, s)
              .flatMap(convert(kind, _, g.dataType)).get
        }.toMap
        val vals = exprs.map(foldGroupValue(_, keyVals, group.map(_._2)))
        if (vals.exists(_.isEmpty)) None
        else Some(InternalRow.fromSeq(vals.map(_.get)))
      }
    if (rows.exists(_.isEmpty)) None else Some(rows.map(_.get))
  }

  /** The entries a deterministic predicate over CONSTANT-per-entry
    * columns keeps — partition pruning for metadata answers. Each
    * referenced attribute must be constant in EVERY entry (recorded
    * min == max, zero nulls, convertible); the predicate is then
    * evaluated per entry BY CATALYST ITSELF — every attribute
    * substituted with the entry's constant as a Literal, `eval` on the
    * folded tree — so comparison/coercion semantics can never drift
    * from a real scan's. A constant column means the predicate keeps
    * ALL of an entry's rows or NONE, which is what makes the surviving
    * set exactly attributable. Subqueries, non-determinism, an eval
    * error (e.g. an ANSI cast), or any unattributable entry refuse. */
  private def filterEntries(cond: Expression,
      entries: Seq[(Map[String, TxnCatalog.ColStat], Option[Long])])
      : Option[Seq[(Map[String, TxnCatalog.ColStat], Option[Long])]] = {
    if (!cond.deterministic ||
        cond.exists(_.isInstanceOf[PlanExpression[_]])) return None
    val attrs = cond.references.toSeq
    val out = Seq.newBuilder[(Map[String, TxnCatalog.ColStat], Option[Long])]
    for (e <- entries) {
      val vals: Seq[Option[(ExprId, Any)]] = attrs.map { a =>
        e._1.get(a.name)
          .filter(st => keyableType(a.dataType) &&
            st.min == st.max && st.nulls.contains(0L))
          .flatMap(st => statVal(st.kind, st.min)
            .flatMap(convert(st.kind, _, a.dataType)))
          .map(a.exprId -> _)
      }
      if (vals.exists(_.isEmpty)) return None
      val m = vals.flatten.toMap
      val sub = cond.transform {
        case a: AttributeReference if m.contains(a.exprId) =>
          Literal(m(a.exprId), a.dataType)
      }
      scala.util.Try(sub.eval(null)) match {
        case scala.util.Success(true) => out += e
        case scala.util.Success(_)    => () // false/null: no rows match
        case scala.util.Failure(_)    => return None
      }
    }
    Some(out.result())
  }

  /** An aggregate's value over ZERO entries — the ungrouped empty
    * result SQL mandates: count = 0, min/max = NULL. */
  private def emptyAggValue(e: Expression): Option[Any] = e match {
    case Alias(c, _) => emptyAggValue(c)
    // count over ZERO rows is 0, DISTINCT or not
    case AggregateExpression(Count(_), _, _, None, _) => Some(0L)
    case AggregateExpression(Min(_), _, false, None, _) => Some(null)
    case AggregateExpression(Max(_), _, false, None, _) => Some(null)
    case AggregateExpression(Sum(_, _), _, false, None, _) => Some(null)
    // avg over ZERO rows is NULL for every child type — no arithmetic,
    // no rounding concern, so the empty arm need not be decimal-only
    case AggregateExpression(_: Average, _, false, None, _) => Some(null)
    case _ => None
  }

  /** Fold over an already-filtered entry subset: grouped entries go
    * through [[foldGrouped]]; an ungrouped aggregate over NO surviving
    * entries still returns its one mandated row. */
  private def foldFiltered(groups: Seq[AttributeReference],
      exprs: Seq[NamedExpression],
      kept: Seq[(Map[String, TxnCatalog.ColStat], Option[Long])])
      : Option[Seq[InternalRow]] =
    if (groups.isEmpty && kept.isEmpty) {
      val vals = exprs.map(emptyAggValue)
      if (vals.exists(_.isEmpty)) None
      else Some(Seq(InternalRow.fromSeq(vals.map(_.get))))
    } else foldGrouped(groups, exprs, kept)

  /** Peel attribute-only projections (column pruning inserts them both
    * above and below a Filter). */
  private def underProjects(plan: LogicalPlan): LogicalPlan = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      underProjects(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groups, exprs, child0, _)
        if exprs.nonEmpty &&
          groups.forall(_.isInstanceOf[AttributeReference]) =>
      // an optional Filter over constant-per-entry columns prunes
      // entries; the (grouped or ungrouped) aggregate folds over the
      // survivors — `SELECT day, count(*) … WHERE region = 'eu' GROUP
      // BY day` as one driver-side manifest read
      val (condOpt, base) = underProjects(child0) match {
        case Filter(cond, ch) => (Some(cond), ch)
        case other => (None, other)
      }
      val gattrs = groups.map(_.asInstanceOf[AttributeReference])
      factsOf(base) match {
        case None => agg
        case Some(facts) if condOpt.isEmpty && groups.isEmpty =>
          // whole-table facts: cheaper, and the long-proven arm; shapes
          // only the ENTRY grain can answer (count(DISTINCT c) over a
          // constant-per-entry column) fall back to the grouped
          // machinery with an empty key
          val vals = exprs.map(foldValue(_, facts))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get))))
          else (for {
            entries <- facts.perEntry
            rows <- foldFiltered(Nil, exprs, entries)
          } yield LocalRelation(agg.output, rows)).getOrElse(agg)
        case Some(facts) =>
          (for {
            entries <- facts.perEntry
            kept <- condOpt.fold(
              Option(entries))(filterEntries(_, entries))
            rows <- foldFiltered(gattrs, exprs, kept)
          } yield LocalRelation(agg.output, rows)).getOrElse(agg)
      }
  }
}
