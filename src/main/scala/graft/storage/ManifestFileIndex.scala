package graft.storage

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._

import scala.util.control.NonFatal

/** Manifest-stat data skipping placed UNDER Catalyst: a Spark
  * [[FileIndex]] whose `listFiles` evaluates the query's own pushed
  * `dataFilters` against the per-partition column stats and Blooms a
  * [[TxnCatalog]] commit recorded — so a plain `df.where(...)` (or any
  * SQL over a registered view) prunes partitions automatically, with no
  * special read API. This is the integration Delta makes with its
  * TahoeFileIndex: the planner calls `listFiles(partitionFilters,
  * dataFilters)` from `FileSourceScanExec`, and whatever this returns is
  * the scan's input — everything downstream (vectorized parquet reader,
  * row-group pushdown of the SAME filters, whole-stage codegen) is stock
  * Spark, which is the point: one FileIndex implementation buys the
  * whole existing scan stack.
  *
  * Pruning semantics are exactly [[TxnCatalog.Snapshot]]'s `readWhere*`
  * family (shared helpers): conjuncts prune independently, `Or` keeps a
  * partition if either side may match, equality and IN probes consult
  * range stats AND Blooms, one-sided comparisons use the matching stat
  * extreme, `StartsWith` prunes by UTF-8 prefix bounds, and ANY
  * unrecognized expression shape, kind mismatch, or parse failure keeps
  * the partition — pruning is always conservative, never a correctness
  * bet. The index pins one snapshot: planning twice over the same frame
  * can never mix txns (and `refresh` is deliberately a no-op).
  *
  * At 100 TB this is the difference between "skipping if you remembered
  * to call readWhere" and "skipping, period": BI tools, SQL users, and
  * composed DataFrames all hit the manifest index on every query.
  */
final class ManifestFileIndex(
    spark: SparkSession, root: String, table: String,
    snap: TxnCatalog.Snapshot,
    only: Option[Set[String]] = None,
    dataSchema: Option[StructType] = None,
    partSchema: StructType = StructType(Nil)) extends FileIndex {

  import TxnCatalog.ColStat

  /** The lake coordinates this index scans — what a plan-level rewrite
    * (e.g. [[graft.plans.MvRewrite]]) needs to look up derived tables
    * of the SAME pinned snapshot. */
  private[graft] def lakeRoot: String = root
  private[graft] def lakeTable: String = table
  private[graft] def snapshot: TxnCatalog.Snapshot = snap

  /** (partition, stats, rows, dir) per live DATA entry, straight off the
    * manifest — NO filesystem access at construction (equality-delete
    * key lists are not data; `only` restricts to a partition subset for
    * grouped merge-on-read reads). File listing happens lazily, per
    * partition, only for partitions a query actually keeps: at 10 000
    * partitions a fully-pruned query costs a handful of list calls, not
    * 10 000 — the snapshot is immutable, so a memoized list can never
    * drift (ordered by partition name for plan determinism). */
  private val parts: Seq[(String, Map[String, ColStat], Option[Long], Path, String)] =
    snap.dataEntries(table)
      .filter { case (p, _) => only.forall(_(p)) }
      .sortBy(_._1)
      .map { case (p, e) =>
        (p, e.stats, e.rows,
          new Path(TxnCatalog.entryPath(root, table, p, e.dir)), e.dir)
      }

  private val hconf = spark.sparkContext.hadoopConfiguration

  private val listed =
    new java.util.concurrent.ConcurrentHashMap[String, Array[FileStatus]]()

  private def listOne(dir: Path): Array[FileStatus] =
    dir.getFileSystem(hconf).listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)

  /** Memoized listings for a kept subset; the not-yet-listed remainder
    * lists on a bounded thread pool (driver-side fan-out — at scale the
    * survivors of a pruned query are few, but a full scan over many
    * partitions shouldn't serialize thousands of round trips either). */
  private def filesOf(
      sel: Seq[(String, Path)]): Seq[Array[FileStatus]] = {
    val missing = sel.filter { case (p, _) => !listed.containsKey(p) }
    if (missing.sizeIs > 4) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, missing.size))
      try {
        import scala.jdk.CollectionConverters._
        val tasks = missing.map { case (p, d) =>
          new java.util.concurrent.Callable[Unit] {
            override def call(): Unit =
              listed.computeIfAbsent(p, _ => listOne(d))
          }
        }
        pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
      } finally pool.shutdown()
    }
    sel.map { case (p, d) => listed.computeIfAbsent(p, _ => listOne(d)) }
  }

  /** Partitions (manifest entries) behind this index — a pure-metadata
    * count, unlike [[totalFileCount]]. */
  def partitionCount: Int = parts.size

  /** Per-entry (column stats, row count) facts behind this index — the
    * entry grain [[graft.plans.MetadataOnlyAgg]]'s GROUP BY fold needs.
    * Merge-on-read soundness is structural on this path: a funnel with
    * applicable deletes plans anti-joins ABOVE the relation, so the
    * bare-relation match the fold requires can never see masked rows. */
  private[graft] def entryFacts: Seq[(Map[String, ColStat], Option[Long])] =
    liveRowParts.map(p => (p._2, p._3))

  /** [[parts]] minus entries with a RECORDED zero row count (CREATE
    * shells, ALTER schema batches): they hold no values and no nulls,
    * so they contribute nothing to any metadata answer — and their
    * missing column stats must never refuse a fold they can't affect.
    * Entries with UNRECORDED counts stay; each helper treats unknown
    * as fatal for its own shape. */
  private def liveRowParts
      : Seq[(String, Map[String, ColStat], Option[Long], Path, String)] =
    parts.filterNot(_._3.contains(0L))

  /** Exact total rows behind this index, from manifest counts alone —
    * Some only when EVERY entry recorded one (the
    * [[graft.plans.MetadataOnlyAgg]] contract: exact or absent). */
  def exactRowCount: Option[Long] = {
    if (parts.isEmpty) return None
    val counts = liveRowParts.map(_._3)
    if (counts.exists(_.isEmpty)) None
    else Some(counts.flatten.sum)
  }

  /** Exact (min, max) of `column` across every entry, folded kind-true
    * from the manifest stats — as the RENDERED stat values: strings for
    * kinds "n"/"s" (the recorded cast-to-string, which round-trips the
    * source value exactly), micros-since-epoch Longs for kind "t". Some
    * only when EVERY entry carries the stat with one consistent kind
    * and every numeric stat parses (NaN/Infinity refuse — orderings
    * diverge). Stats record NON-NULL extremes, matching SQL MIN/MAX
    * null semantics; an all-null or empty column has no stat → None. */
  def exactBounds(column: String): Option[(String, Any, Any)] = {
    if (parts.isEmpty) return None
    val sts = liveRowParts.map(_._2.get(column))
    if (sts.exists(_.isEmpty)) return None
    val all = sts.flatten
    val kinds = all.map(_.kind).distinct
    if (kinds.sizeIs != 1) return None
    kinds.head match {
      case "n" =>
        try {
          val mins = all.map(s => (scala.math.BigDecimal(s.min), s.min))
          val maxs = all.map(s => (scala.math.BigDecimal(s.max), s.max))
          Some(("n", mins.minBy(_._1)._2, maxs.maxBy(_._1)._2))
        } catch { case _: NumberFormatException => None }
      case "s" =>
        val ord = new Ordering[String] {
          override def compare(a: String, b: String): Int =
            if (TxnCatalog.utf8Lt(a, b)) -1
            else if (TxnCatalog.utf8Lt(b, a)) 1 else 0
        }
        Some(("s", all.map(_.min).min(ord), all.map(_.max).max(ord)))
      case "t" =>
        val lo = all.map(_.min.toLongOption)
        val hi = all.map(_.max.toLongOption)
        if (lo.exists(_.isEmpty) || hi.exists(_.isEmpty)) None
        else Some(("t", lo.flatten.min, hi.flatten.max))
      case _ => None
    }
  }

  /** Exact NON-NULL count of `column` from manifest stats alone — Some
    * only when EVERY entry records both its row count and the column's
    * null count (exact-or-absent; entries written before null counts
    * were recorded, or whose column is all-null/absent and so carries
    * no stat, disable the answer). */
  def exactNonNullCount(column: String): Option[Long] = {
    if (parts.isEmpty) return None
    val per = liveRowParts.map { case (_, stats, rows, _, _) =>
      for { r <- rows; st <- stats.get(column); n <- st.nulls } yield r - n
    }
    if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
  }

  /** EXACT sum of `column` from manifest stats alone — the BigDecimal
    * total of per-entry sums, Some only when EVERY live entry carries
    * one ([[graft.storage.TxnCatalog.Snapshot.columnSum]]'s twin on
    * the DataFrame path; the caller range-checks against the
    * aggregate's result type). */
  def exactSum(column: String): Option[java.math.BigDecimal] = {
    if (parts.isEmpty) return None
    val per = liveRowParts.map(_._2.get(column).flatMap(_.sum))
    if (per.exists(_.isEmpty)) None
    else scala.util.Try(per.flatten
      .map(new java.math.BigDecimal(_)).reduce(_ add _)).toOption
  }

  /** How many partitions have had their files listed so far — the
    * laziness probe for tests. */
  private[graft] def listedPartitionCount: Int = listed.size()

  /** The synthesized PARTITION-VALUE row of one entry, in `partSchema`
    * order — values recovered from the hive-imported dir's trailing
    * `key=value` segments ([[TxnCatalog.extHiveValues]]), typed per the
    * schema (kind-consistent by [[Importer.addFiles]]'s inference);
    * entries without a value for a declared column (owned commits in a
    * mixed table) read NULL. Identity when no partition schema is
    * declared. */
  private def partRow(dir: String): InternalRow = {
    if (partSchema.isEmpty) return InternalRow.empty
    val vals = TxnCatalog.extHiveValues(dir).toMap
    InternalRow.fromSeq(partSchema.map { f =>
      vals.get(f.name).flatten.map[Any] { v =>
        f.dataType match {
          case LongType =>
            v.toLongOption.map(Long.box).orNull
          case _ => org.apache.spark.unsafe.types.UTF8String.fromString(v)
        }
      }.orNull
    })
  }

  /** `partitionFilters` evaluated exactly against an entry's
    * synthesized values — the same bind-and-eval
    * PartitioningAwareFileIndex does over discovered hive layouts;
    * filters referencing anything outside `partSchema` keep the entry
    * (conservative, like every other pruning claim here). */
  private def keepPart(row: InternalRow, filters: Seq[Expression]): Boolean =
    filters.forall { f =>
      if (!f.references.forall(a => partSchema.fieldNames.contains(a.name)))
        true
      else try {
        val bound = f.transform {
          case a: AttributeReference =>
            val i = partSchema.fieldNames.indexOf(a.name)
            BoundReference(i, partSchema(i).dataType, nullable = true)
        }
        Predicate.createInterpreted(bound).eval(row)
      } catch { case NonFatal(_) => true }
    }

  override def rootPaths: Seq[Path] = Seq(new Path(s"$root/$table"))

  override def partitionSchema: StructType = partSchema

  override def refresh(): Unit = () // snapshot-pinned by design

  /** Estimated, per the FileIndex contract — answered from manifest row
    * counts × the schema's estimated row width when every entry carries
    * a count (zero IO, the common case for TxnCatalog-written data);
    * exact from file sizes when everything is already listed; a forced
    * full listing only as the last resort. */
  override def sizeInBytes: Long = {
    val rowWidth = dataSchema.map(s => math.max(s.defaultSize, 1))
    if (parts.forall { case (p, _, _, _, _) => listed.containsKey(p) })
      parts.iterator.flatMap(e => listed.get(e._1)).map(_.getLen).sum
    else if (rowWidth.isDefined && parts.forall(_._3.isDefined))
      parts.iterator.map(_._3.get).sum * rowWidth.get
    else
      filesOf(parts.map(e => (e._1, e._4))).iterator.flatten
        .map(_.getLen).sum
  }

  override def inputFiles: Array[String] =
    filesOf(parts.map(e => (e._1, e._4)))
      .flatten.map(_.getPath.toString).toArray

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = parts.filter { case (_, stats, _, _, _) =>
      stats.isEmpty || dataFilters.forall(f => keep(stats, f))
    }
    if (partSchema.isEmpty) {
      val files = filesOf(kept.map(e => (e._1, e._4))).flatten
      Seq(PartitionDirectory(InternalRow.empty, files.toArray))
    } else {
      // synthesized-partition entries: one PartitionDirectory per
      // distinct value tuple (Spark appends the values as constant
      // partition columns in the scan), partitionFilters evaluated
      // EXACTLY per entry — manifest-level partition pruning
      kept.filter(e => keepPart(partRow(e._5), partitionFilters))
        .groupBy(e => partRow(e._5))
        .toSeq.sortBy(_._2.head._1)
        .map { case (row, es) =>
          PartitionDirectory(row,
            filesOf(es.map(e => (e._1, e._4))).flatten.toArray)
        }
    }
  }

  /** Files surviving `dataFilters` — the test- and tooling-facing probe
    * (same path `listFiles` takes, minus the PartitionDirectory shape). */
  def survivingFileCount(dataFilters: Seq[Expression]): Int =
    listFiles(Nil, dataFilters).map(_.files.size).sum

  /** Exact file count — forces a full listing; tests and tooling only
    * (the planner never calls this). */
  def totalFileCount: Int =
    filesOf(parts.map(e => (e._1, e._4))).map(_.length).sum

  // ---- Catalyst literal -> the JVM shapes the stat helpers expect ----

  /** Internal literal value -> the probe type [[TxnCatalog.mayOverlap]] /
    * [[TxnCatalog.bloomMayContain]] understand; None = no lossless
    * mapping (DATE, NTZ, binary, null literals...) -> never prune. */
  private def jvm(v: Any, dt: DataType): Option[Any] =
    if (v == null) None
    else dt match {
      case StringType => Some(v.toString) // UTF8String
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => Some(v)
      case _: DecimalType =>
        Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        Some(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case _ => None
    }

  /** May any value of the column satisfy `op v`? (one-sided range
    * probes; kind mismatch or unparseable stats keep the partition). */
  private def mayCmp(st: ColStat, v: Any, ge: Boolean,
      strict: Boolean): Boolean =
    try {
      (st.kind, v) match {
        case ("n", n: Number) =>
          // exact decimal compare: double rounding would let a strict
          // probe wrongly prune near 2^53 (stat "9007199254740993" vs
          // probe 9007199254740992L both round to the same double);
          // NaN/Infinity renderings throw -> conservative keep, which
          // also matches Spark sorting NaN greatest
          val probe = exactDecimal(n).getOrElse(return true)
          val cmp =
            if (ge) new java.math.BigDecimal(st.max).compareTo(probe)
            else probe.compareTo(new java.math.BigDecimal(st.min))
          if (strict) cmp > 0 else cmp >= 0
        case ("s", s: String) =>
          // ge: need max >= s (strict: max > s); le: need min <= s
          if (ge) {
            if (strict) TxnCatalog.utf8Lt(s, st.max)
            else !TxnCatalog.utf8Lt(st.max, s)
          } else {
            if (strict) TxnCatalog.utf8Lt(st.min, s)
            else !TxnCatalog.utf8Lt(s, st.min)
          }
        case ("t", x) => TxnCatalog.tsMicros(x).forall { m =>
          val (bound, p) = if (ge) (st.max.toLong, m) else (-st.min.toLong, -m)
          if (strict) bound > p else bound >= p
        }
        case _ => true
      }
    } catch { case NonFatal(_) => true }

  /** A Number probe as an exact BigDecimal; None for NaN/Infinity (no
    * decimal form — keep the partition). */
  private def exactDecimal(n: Number): Option[java.math.BigDecimal] =
    n match {
      case d: java.lang.Double if d.isNaN || d.isInfinite => None
      case f: java.lang.Float if f.isNaN || f.isInfinite => None
      case d: java.lang.Double =>
        Some(new java.math.BigDecimal(java.lang.Double.toString(d)))
      case f: java.lang.Float =>
        Some(new java.math.BigDecimal(java.lang.Float.toString(f)))
      case b: java.math.BigDecimal => Some(b)
      case other => Some(java.math.BigDecimal.valueOf(other.longValue()))
    }

  private def mayEq(st: ColStat, v: Any): Boolean =
    try TxnCatalog.mayOverlap(st, v, v) && TxnCatalog.bloomMayContain(st, v)
    catch { case NonFatal(_) => true }

  /** May any value start with `prefix`? Lower side: if max < prefix (in
    * UTF-8 byte order) no value reaches the prefix. Upper side: the
    * smallest byte string greater than EVERY prefixed string is the
    * prefix with its last non-0xFF byte incremented (trailing 0xFF
    * dropped); if min >= that successor, every value sorts past the
    * prefix range. All-0xFF prefixes have no successor -> keep. */
  private def mayPrefix(st: ColStat, prefix: String): Boolean = {
    if (st.kind != "s") return true
    if (TxnCatalog.utf8Lt(st.max, prefix)) return false
    val p = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = p.length - 1
    while (i >= 0 && (p(i) & 0xff) == 0xff) i -= 1
    if (i < 0) return true
    val succ = java.util.Arrays.copyOf(p, i + 1)
    succ(i) = (succ(i) + 1).toByte
    val mn = st.min.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // keep iff min < succ (byte-wise unsigned)
    var k = 0
    while (k < mn.length && k < succ.length) {
      val d = (mn(k) & 0xff) - (succ(k) & 0xff)
      if (d != 0) return d < 0
      k += 1
    }
    mn.length < succ.length
  }

  /** May this partition contain a row satisfying `e`? Conservative
    * three-valued logic collapsed to "keep unless provably absent". */
  private def keep(stats: Map[String, ColStat], e: Expression): Boolean =
    e match {
      case And(l, r) => keep(stats, l) && keep(stats, r)
      case Or(l, r) => keep(stats, l) || keep(stats, r)
      case EqualTo(a: AttributeReference, Literal(v, dt)) => eqKeep(stats, a.name, v, dt)
      case EqualTo(Literal(v, dt), a: AttributeReference) => eqKeep(stats, a.name, v, dt)
      case EqualNullSafe(a: AttributeReference, Literal(v, dt)) if v != null =>
        eqKeep(stats, a.name, v, dt)
      case EqualNullSafe(Literal(v, dt), a: AttributeReference) if v != null =>
        eqKeep(stats, a.name, v, dt)
      case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
        cmpKeep(stats, a.name, v, dt, ge = true, strict = true)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        cmpKeep(stats, a.name, v, dt, ge = true, strict = false)
      case LessThan(a: AttributeReference, Literal(v, dt)) =>
        cmpKeep(stats, a.name, v, dt, ge = false, strict = true)
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        cmpKeep(stats, a.name, v, dt, ge = false, strict = false)
      // literal-on-the-left comparisons flip
      case GreaterThan(Literal(v, dt), a: AttributeReference) =>
        cmpKeep(stats, a.name, v, dt, ge = false, strict = true)
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        cmpKeep(stats, a.name, v, dt, ge = false, strict = false)
      case LessThan(Literal(v, dt), a: AttributeReference) =>
        cmpKeep(stats, a.name, v, dt, ge = true, strict = true)
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        cmpKeep(stats, a.name, v, dt, ge = true, strict = false)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists { case Literal(v, dt) => eqKeep(stats, a.name, v, dt) }
      case InSet(a: AttributeReference, hset) =>
        hset.exists(v => eqKeep(stats, a.name, v, a.dataType))
      case StartsWith(a: AttributeReference, Literal(v, StringType)) if v != null =>
        stats.get(a.name).forall(mayPrefix(_, v.toString))
      // IS NULL prunes partitions whose recorded null count is zero
      // (legacy stats without a count keep the partition); IS NOT NULL
      // never prunes — a recorded stat implies non-null values exist,
      // and all-null partitions carry no stat at all
      case IsNull(a: AttributeReference) => nullKeep(stats, a.name)
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v == null =>
        nullKeep(stats, a.name)
      case EqualNullSafe(Literal(v, _), a: AttributeReference) if v == null =>
        nullKeep(stats, a.name)
      case _ => true // IsNotNull/casts/UDFs/...: no pruning claim
    }

  private def eqKeep(stats: Map[String, ColStat], name: String,
      v: Any, dt: DataType): Boolean =
    stats.get(name).forall(st => jvm(v, dt).forall(mayEq(st, _)))

  private def cmpKeep(stats: Map[String, ColStat], name: String,
      v: Any, dt: DataType, ge: Boolean, strict: Boolean): Boolean =
    stats.get(name).forall(st => jvm(v, dt).forall(mayCmp(st, _, ge, strict)))

  private def nullKeep(stats: Map[String, ColStat], name: String): Boolean =
    stats.get(name).forall(st => st.nulls.forall(_ > 0))
}
