package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/** Incrementally-maintained MATERIALIZED AGGREGATE views over a
  * [[TxnCatalog]] lake — the 100 TB answer to "don't recompute the
  * rollup, fold the delta in" (Databricks/BigQuery materialized views,
  * re-expressed on this catalog's txn axis):
  *
  *  - [[create]] computes `GROUP BY groupCols` with additive aggregates
  *    (count / sum / min / max) over the source table and commits the
  *    result AND its source-txn watermark in ONE txn — data and
  *    how-current-is-it are never observable out of sync.
  *  - [[refresh]] pins one snapshot, classifies what happened to the
  *    source since the watermark, and either folds ONLY the new
  *    partitions into the stored aggregate (additive merge — cost
  *    proportional to the DELTA, not the table) or falls back to a
  *    full recompute when the window contains anything non-additive.
  *    Either way the new view and watermark commit atomically,
  *    conditional on the pinned txn (concurrent refreshes race safely).
  *
  * Incremental classification, derived entirely from manifests:
  *  - ordinary commits newer than the watermark → the delta;
  *  - reorganizations carrying only seen data (`dataTxn <= wm`:
  *    compaction, clustering of old batches, ANALYZE) → ignored, with
  *    removed-entry row counts cross-checked against the reorg outputs
  *    so silent data loss can never masquerade as a reorg;
  *  - anything else — equality deletes or a RESTORE in the window, a
  *    rewritten partition, a reorg folding seen AND unseen batches,
  *    missing row counts — → full recompute (correct, just not
  *    incremental). Deliberately conservative: a wrong aggregate is
  *    worse than a slow refresh.
  *
  * min/max are additive only under growth (appends); they stay correct
  * because every non-append history falls back to the full path.
  * Averages are sum/count at read time, by design.
  */
object MaterializedAgg {

  /** One aggregate column: `op` in count|sum|min|max. `count` with no
    * `col` is `count(*)` (view column `cnt`); with a `col` it is the
    * NON-NULL count `count(col)` (view column `cnt_<col>` — additive
    * like `cnt`, and together with `sum_<col>` it lets [[graft.plans
    * .MvRewrite]] answer `avg(col)` and `count(col)` from the view).
    * Other ops store `<op>_<col>`. */
  final case class AggSpec(op: String, col: String = "") {
    require(Set("count", "sum", "min", "max")(op), s"unknown agg op '$op'")
    def alias: String =
      if (op == "count") { if (col.isEmpty) "cnt" else s"cnt_$col" }
      else s"${op}_$col"
  }

  /** View-table properties: the defining query's pieces plus the
    * source-txn watermark the stored rows are complete AS OF. */
  val SourceProp = "graft.mv.source"
  val GroupProp = "graft.mv.group"
  val AggsProp = "graft.mv.aggs"
  val WatermarkProp = "graft.mv.watermark"

  /** What a [[refresh]] did: `mode` is `noop` | `incremental` | `full`;
    * `partitionsRead` counts the SOURCE partitions scanned (the delta
    * for incremental — the point of the exercise). */
  final case class Refresh(txn: Long, mode: String, partitionsRead: Int)

  /** Create view `view` = `SELECT groupCols, aggs FROM source GROUP BY
    * groupCols`, materialized in the same catalog with its watermark.
    * Throws if `view` already exists. Returns the committed txn. */
  def create(spark: SparkSession, root: String, view: String,
      source: String, groupCols: Seq[String], aggs: Seq[AggSpec],
      attempts: Int = 5): Long = {
    require(groupCols.nonEmpty, "materialized view needs group columns")
    require(aggs.nonEmpty, "materialized view needs aggregates")
    var attempt = 0
    while (true) {
      attempt += 1
      val snap = TxnCatalog.snapshot(spark, root).getOrElse(
        throw new IllegalArgumentException(s"empty catalog under $root"))
      require(!snap.tables.contains(view),
        s"table '$view' already exists; drop it first")
      val src = snap.read(source).getOrElse(
        throw new IllegalArgumentException(s"unknown table '$source'"))
      (groupCols ++ aggs.map(_.col).filter(_.nonEmpty)).foreach { c =>
        require(src.columns.contains(c), s"'$source' has no column '$c'")
      }
      val full = aggregate(src, groupCols, aggs)
      val props = Map(
        SourceProp -> source,
        GroupProp -> groupCols.mkString(","),
        AggsProp -> aggs.map(a => s"${a.op}:${a.col}").mkString(","),
        // the conditional commit lands at exactly snap.txn + 1, and
        // nothing else can land in between: the watermark covers the
        // view's own commit, so the next refresh starts at a clean noop
        WatermarkProp -> (snap.txn + 1).toString)
      try {
        return TxnCatalog.commitWholeWithProperties(spark, root, view,
          full, props, expectedTxn = Some(snap.txn))
      } catch {
        case _: java.io.IOException if attempt < attempts =>
          Thread.sleep(attempt * 20L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Bring `view` up to the current txn. See the classification rules
    * above; returns what ran and how much source it read. */
  def refresh(spark: SparkSession, root: String, view: String,
      attempts: Int = 5): Refresh = {
    var attempt = 0
    while (true) {
      attempt += 1
      val snap = TxnCatalog.snapshot(spark, root).getOrElse(
        throw new IllegalArgumentException(s"empty catalog under $root"))
      val props = snap.properties(view)
      val source = props.getOrElse(SourceProp,
        throw new IllegalArgumentException(
          s"'$view' is not a materialized view (no ${SourceProp})"))
      val groupCols = props(GroupProp).split(',').toSeq
      val aggs = parseAggs(props(AggsProp))
      val wm = props(WatermarkProp).toLong
      if (wm == snap.txn) return Refresh(snap.txn, "noop", 0)

      val delta = incrementalDelta(spark, root, source, wm, snap)
      // every branch commits conditionally on snap.txn, so the commit
      // lands at exactly snap.txn + 1 and the recorded watermark
      // covers it — the next refresh is a clean noop
      val nextWm = Map(WatermarkProp -> (snap.txn + 1).toString)
      try {
        delta match {
          case Some(parts) if parts.isEmpty =>
            // window held only reorgs/metadata: the stored rows are
            // already current — re-commit them with the moved watermark
            // (aggregates are small; correctness needs the conditional)
            val txn = TxnCatalog.commitWholeWithProperties(spark, root,
              view, snap.read(view).get, nextWm,
              expectedTxn = Some(snap.txn))
            return Refresh(txn, "incremental", 0)
          case Some(parts) =>
            val deltaDf =
              snap.readPartitions(source, parts.toSeq.sorted).get
            val merged = merge(snap.read(view).get,
              aggregate(deltaDf, groupCols, aggs), groupCols, aggs)
            val txn = TxnCatalog.commitWholeWithProperties(spark, root,
              view, merged, nextWm, expectedTxn = Some(snap.txn))
            return Refresh(txn, "incremental", parts.size)
          case None =>
            val srcDf = snap.read(source).getOrElse(
              throw new IllegalStateException(
                s"source '$source' of '$view' is gone"))
            val full = aggregate(srcDf, groupCols, aggs)
            val txn = TxnCatalog.commitWholeWithProperties(spark, root,
              view, full, nextWm, expectedTxn = Some(snap.txn))
            return Refresh(txn, "full", snap.dataEntries(source).size)
        }
      } catch {
        case _: java.io.IOException if attempt < attempts =>
          Thread.sleep(attempt * 20L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The views of `source` whose stored rows are EXACTLY the aggregate
    * of `snap`'s source state — the candidates a transparent query
    * rewrite ([[graft.plans.MvRewrite]]) may substitute for the
    * aggregation. Current means: every source data entry was created at
    * or before the view's watermark (reorgs after it disable the claim
    * conservatively), no equality delete and no RESTORE landed after
    * it. Derived from the pinned snapshot alone — no extra manifest IO
    * — and cached per (root, txn, source): a committed txn is
    * immutable. */
  private[graft] def currentViews(spark: SparkSession, root: String,
      snap: TxnCatalog.Snapshot, source: String)
      : Seq[(String, Seq[String], Seq[AggSpec])] = {
    val key = (root, snap.txn, source)
    Option(viewCache.get(key)).getOrElse {
      val found = snap.tables.filter(_ != source).flatMap { t =>
        val props = snap.properties(t)
        if (!props.get(SourceProp).contains(source)) None
        else props.get(WatermarkProp).map(_.toLong).filter { wm =>
          snap.dataEntries(source).forall { case (_, e) =>
            e.dir.stripPrefix("v=").takeWhile(_ != '.').toLongOption
              .exists(_ <= wm)
          } &&
            !snap.deleteEntries(source)
              .exists { case (_, txn, _, _) => txn > wm } &&
            !snap.properties(source).get(TxnCatalog.RestoreTxnProp)
              .map(_.split(':').head.toLong)
              .exists(r => r > wm && r <= snap.txn)
        }.map { _ =>
          (t, props(GroupProp).split(',').toSeq,
            parseAggs(props(AggsProp)))
        }
      }
      if (viewCache.size > 4096) viewCache.clear() // bounded
      viewCache.put(key, found)
      found
    }
  }

  private val viewCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, String), Seq[(String, Seq[String], Seq[AggSpec])]]()

  /** The partitions whose rows are NEW since `wm` — or None when the
    * window is not additively refreshable (see classification above). */
  private def incrementalDelta(spark: SparkSession, root: String,
      source: String, wm: Long,
      snap: TxnCatalog.Snapshot): Option[Set[String]] = {
    // deletes or a restore in the window subtract/revert rows: not additive
    if (snap.deleteEntries(source).exists { case (_, txn, _, _) => txn > wm })
      return None
    if (snap.properties(source).get(TxnCatalog.RestoreTxnProp)
        .map(_.split(':').head.toLong).exists(r => r > wm && r <= snap.txn))
      return None
    val from = TxnCatalog.snapshotAt(spark, root, wm)
    val fromData = from.dataEntries(source).toMap
    val toData = snap.dataEntries(source).toMap
    var delta = Set.empty[String]
    var reorgAddedRows = 0L
    for ((p, e) <- toData if !fromData.get(p).map(_.dir).contains(e.dir)) {
      (e.dataTxn, TxnCatalog.entryDataTxn(e)) match {
        case (Some(dt), _) if dt <= wm =>
          // reorg output of seen data: content already in the view
          e.rows match {
            case Some(r) => reorgAddedRows += r
            case None => return None // can't account: be conservative
          }
        case (Some(_), _) =>
          // a reorg folding unseen (or mixed) data, or a rewrite:
          // its rows overlap the view in an unknowable way
          return None
        case (None, dirTxn) if dirTxn > wm =>
          // a REWRITE reuses its partition name: its new dir holds old
          // rows too, so adding it would double-count — only a
          // partition that did not exist at the watermark is a delta
          if (fromData.contains(p)) return None
          delta += p
        case _ =>
          // an ordinary entry claiming to predate the watermark under a
          // NEW dir: unexpected — recompute rather than guess
          return None
      }
    }
    // removed entries must be fully accounted by reorg outputs, or rows
    // were dropped some other way (deleteWhere emptying a partition,
    // DROP-like maintenance) and addition is wrong
    var removedRows = 0L
    for ((p, e) <- fromData if !toData.get(p).map(_.dir).contains(e.dir)) {
      if (!toData.contains(p)) e.rows match {
        case Some(r) => removedRows += r
        case None => return None
      }
    }
    if (removedRows != reorgAddedRows) return None
    Some(delta)
  }

  /** Parse the [[AggsProp]] rendering back to specs — shared by
    * refresh and the branch-publish MV refresh ([[Branches.publishAll]]). */
  private[storage] def parseAggs(s: String): Seq[AggSpec] =
    s.split(',').toSeq.map { x =>
      val Array(op, c) = x.split(":", 2); AggSpec(op, c)
    }

  private[storage] def aggregate(df: DataFrame, groupCols: Seq[String],
      aggs: Seq[AggSpec]): DataFrame = {
    val cols = aggs.map {
      case AggSpec("count", "") => count(lit(1)).as("cnt")
      case AggSpec("count", c) => count(col(c)).as(s"cnt_$c")
      case AggSpec("sum", c) => normSum(df, c, sum(col(c))).as(s"sum_$c")
      case AggSpec("min", c) => min(col(c)).as(s"min_$c")
      case AggSpec("max", c) => max(col(c)).as(s"max_$c")
      case a => throw new IllegalArgumentException(s"unknown agg $a")
    }
    df.groupBy(groupCols.map(col): _*).agg(cols.head, cols.tail: _*)
      .select((groupCols ++ aggs.map(_.alias)).map(col): _*)
  }

  /** Fold a delta aggregate into the stored view: counts and sums add,
    * min/max combine — grouped again because a delta group may already
    * exist in the view. */
  private def merge(mv: DataFrame, delta: DataFrame,
      groupCols: Seq[String], aggs: Seq[AggSpec]): DataFrame = {
    val both = mv.unionByName(delta)
    val cols = aggs.map {
      case a @ AggSpec("count", _) =>
        sum(col(a.alias)).cast("long").as(a.alias)
      case AggSpec("sum", c) =>
        normSum(both, s"sum_$c", sum(col(s"sum_$c"))).as(s"sum_$c")
      case AggSpec("min", c) => min(col(s"min_$c")).as(s"min_$c")
      case AggSpec("max", c) => max(col(s"max_$c")).as(s"max_$c")
      case a => throw new IllegalArgumentException(s"unknown agg $a")
    }
    both.groupBy(groupCols.map(col): _*).agg(cols.head, cols.tail: _*)
      .select((groupCols ++ aggs.map(_.alias)).map(col): _*)
  }

  /** Pin a STABLE storage type for sums so repeated refreshes don't
    * drift the view's schema (Spark widens decimal sums per level):
    * decimal source → decimal(38, scale); float/double → double;
    * integral → long. Decimal keeps incremental == full == exact. */
  private def normSum(df: DataFrame, c: String, s: Column): Column =
    df.schema(c).dataType match {
      case d: DecimalType => s.cast(DecimalType(38, d.scale))
      case FloatType | DoubleType => s.cast("double")
      case _ => s.cast("long")
    }
}
