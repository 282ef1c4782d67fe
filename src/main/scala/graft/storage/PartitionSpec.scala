package graft.storage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Iceberg-style HIDDEN PARTITIONING for the lake catalog: a table
  * declares `PARTITIONED BY (days(ts), bucket(8, k), ...)` once and
  * every INSERT routes rows into transform-derived partitions with no
  * writer-side knowledge — the transform value never becomes a data
  * column (partition names are opaque to readers by the catalog's
  * contract). Pruning rides the existing stats machinery instead of a
  * name parser:
  *
  *  - `identity`/`days`/`months`/`years`/`hours`/`truncate` group rows
  *    so the SOURCE column's per-partition min/max stats are tight by
  *    construction (a day partition spans one day) — the source column
  *    is auto-added to `graft.stats-columns`, so range and point
  *    predicates prune at manifest cost through every existing read
  *    path (readWhere*, ManifestFileIndex, SQL pushdown);
  *  - `bucket(n, c)` groups by hash — min/max is useless there by
  *    design, so `c` is auto-added to `graft.bloom-columns` and point
  *    lookups prune via the per-partition Blooms instead.
  *
  * The spec serializes into TBLPROPERTIES (`graft.partition-spec`), so
  * it survives with the table and every writer (SQL INSERT, overwrite)
  * consults one source of truth. Transform values render engine-side
  * only — they name partitions and group writes; correctness never
  * depends on reparsing them. */
object PartitionSpec {

  /** TBLPROPERTIES key the serialized spec lives under. */
  val Prop = "graft.partition-spec"

  sealed trait PTransform {
    def column: String
    /** Source-column stats class: stats-column or bloom-column. */
    def wantsBloom: Boolean = false
    def render: String
    /** The grouping value for one row, as a string Column. */
    def expr(schema: StructType): Column
  }
  final case class Identity(column: String) extends PTransform {
    def render = s"identity($column)"
    def expr(schema: StructType): Column = col(column).cast(StringType)
  }
  final case class Days(column: String) extends PTransform {
    def render = s"days($column)"
    def expr(schema: StructType): Column =
      date_format(col(column), "yyyy-MM-dd")
  }
  final case class Months(column: String) extends PTransform {
    def render = s"months($column)"
    def expr(schema: StructType): Column =
      date_format(col(column), "yyyy-MM")
  }
  final case class Years(column: String) extends PTransform {
    def render = s"years($column)"
    def expr(schema: StructType): Column = date_format(col(column), "yyyy")
  }
  final case class Hours(column: String) extends PTransform {
    def render = s"hours($column)"
    def expr(schema: StructType): Column =
      date_format(col(column), "yyyy-MM-dd-HH")
  }
  final case class Bucket(n: Int, column: String) extends PTransform {
    override def wantsBloom = true
    def render = s"bucket($n,$column)"
    def expr(schema: StructType): Column =
      concat(lit("b"), pmod(hash(col(column)), lit(n)).cast(StringType))
  }
  final case class Truncate(w: Int, column: String) extends PTransform {
    def render = s"truncate($w,$column)"
    def expr(schema: StructType): Column = schema(column).dataType match {
      case StringType => substring(col(column), 1, w)
      case _ => (col(column) - pmod(col(column), lit(w))).cast(StringType)
    }
  }

  def render(ts: Seq[PTransform]): String = ts.map(_.render).mkString(";")

  private val Fn1 = """(identity|days|months|years|hours)\((\w+)\)""".r
  private val Fn2 = """(bucket|truncate)\((\d+),(\w+)\)""".r

  def parse(spec: String): Seq[PTransform] =
    spec.split(';').filter(_.nonEmpty).toSeq.map {
      case Fn1("identity", c) => Identity(c)
      case Fn1("days", c)     => Days(c)
      case Fn1("months", c)   => Months(c)
      case Fn1("years", c)    => Years(c)
      case Fn1("hours", c)    => Hours(c)
      case Fn2("bucket", n, c)   => Bucket(n.toInt, c)
      case Fn2("truncate", w, c) => Truncate(w.toInt, c)
      case other => throw new IllegalArgumentException(
        s"unparseable partition transform '$other'")
    }

  /** Spark DSv2 transforms → spec; refuses unsupported shapes with the
    * transform named. */
  def fromTransforms(
      ts: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : Seq[PTransform] = {
    import org.apache.spark.sql.connector.expressions._
    def unsupported(t: Transform): Nothing =
      throw new IllegalArgumentException(
        s"unsupported partition transform '${t.describe()}' — supported: " +
          "identity, days, months, years, hours, bucket(n, c), " +
          "truncate(w, c)")
    // the concrete Transform case classes are private[sql]; the public
    // surface is (name, arguments) — match on that
    def ref(t: Transform, e: Expression): String = e match {
      case n: NamedReference if n.fieldNames.length == 1 => n.fieldNames()(0)
      case _ => unsupported(t)
    }
    def intLit(t: Transform, e: Expression): Int = e match {
      case l: Literal[_] => l.value.toString.toInt
      case _ => unsupported(t)
    }
    ts.map { t =>
      (t.name, t.arguments.toSeq) match {
        case ("identity", Seq(c)) => Identity(ref(t, c))
        case ("days", Seq(c))     => Days(ref(t, c))
        case ("months", Seq(c))   => Months(ref(t, c))
        case ("years", Seq(c))    => Years(ref(t, c))
        case ("hours", Seq(c))    => Hours(ref(t, c))
        case ("bucket", Seq(n: Literal[_], c)) =>
          Bucket(intLit(t, n), ref(t, c))
        case ("bucket", Seq(c, n: Literal[_])) =>
          Bucket(intLit(t, n), ref(t, c))
        case ("truncate", Seq(w: Literal[_], c)) =>
          Truncate(intLit(t, w), ref(t, c))
        case ("truncate", Seq(c, w: Literal[_])) =>
          Truncate(intLit(t, w), ref(t, c))
        case _ => unsupported(t)
      }
    }
  }

  /** Spec → Spark DSv2 transforms (for `Table.partitioning()` /
    * DESCRIBE). */
  def toTransforms(ts: Seq[PTransform])
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    ts.map {
      case Identity(c)    => Expressions.identity(c)
      case Days(c)        => Expressions.days(c)
      case Months(c)      => Expressions.months(c)
      case Years(c)       => Expressions.years(c)
      case Hours(c)       => Expressions.hours(c)
      case Bucket(n, c)   => Expressions.bucket(n, c)
      case Truncate(w, c) =>
        Expressions.apply("truncate",
          Expressions.literal(w), Expressions.column(c))
    }.toArray
  }

  /** The single grouping Column for a row — transform renders joined
    * by `,` (hive-escaped into the partition name with everything
    * else). Missing source columns fail loudly at write. */
  def groupExpr(ts: Seq[PTransform], schema: StructType): Column = {
    ts.foreach(t => require(schema.fieldNames.contains(t.column),
      s"partition transform references unknown column '${t.column}'"))
    if (ts.sizeIs == 1) ts.head.expr(schema)
    else concat_ws(",", ts.map(t => coalesce(t.expr(schema),
      lit("__null__"))): _*)
  }

  /** The partition-name label: transform source columns joined by `-`. */
  def label(ts: Seq[PTransform]): String = ts.map(_.column).mkString("-")
}
