package graft.storage

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** `graft_table_changes('<catalog>.<table>', fromTxn, toTxn)` — the
  * change feed ([[TxnCatalog.changeFeed]]) as a SQL table-valued
  * function, Delta's `table_changes` surface on this catalog's txn
  * axis:
  *
  * {{{
  *   SELECT * FROM graft_table_changes('cat.cust', 0, 3)
  *   WHERE _change_type = 'delete'
  * }}}
  *
  * The identifier's first segment names a registered graft catalog
  * (`spark.sql.catalog.<name>` / `...<name>.root`), the last names the
  * table; the txn window is `(fromTxn, toTxn]`, exactly the
  * programmatic feed's convention. The TVF resolves at ANALYSIS time to
  * the feed's ordinary logical plan — unions of manifest-addressed
  * parquet reads with constant `_change_type`/`_txn` columns — so
  * downstream filters/projections push into the scans like any other
  * query; there is no lazy-evaluation seam to keep consistent, because
  * the manifests it reads are immutable committed txns.
  *
  * Arguments must be literals (an identifier and a txn window are
  * catalog coordinates, not row-dependent values — same rule as
  * `VERSION AS OF`). Registered per-session by [[install]] or
  * cluster-wide via `spark.sql.extensions=graft.GraftExtensions`.
  */
object ChangesTvf {

  val Name = "graft_table_changes"

  /** TVF builder: literal args → the change feed's analyzed plan. */
  def builder(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3,
      s"$Name(identifier, fromTxn, toTxn) takes 3 arguments")
    val ident = exprs.head match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$Name: identifier must be a string literal, got ${other.sql}")
    }
    def txnArg(e: Expression, which: String): Long = e match {
      case Literal(v: Integer, IntegerType) => v.toLong
      case Literal(v: java.lang.Long, LongType) => v.longValue()
      case other => throw new IllegalArgumentException(
        s"$Name: $which must be an integer literal, got ${other.sql}")
    }
    val (from, to) = (txnArg(exprs(1), "fromTxn"), txnArg(exprs(2), "toTxn"))
    val parts = ident.split('.')
    require(parts.length >= 2,
      s"$Name: identifier must be '<catalog>.<table>' or " +
        s"'<catalog>.<namespace>.<table>', got '$ident'")
    val spark = SparkSession.active
    val (cat, table) = (parts.head, parts.last)
    val root = spark.conf.getOption(s"spark.sql.catalog.$cat.root")
      .getOrElse(throw new IllegalArgumentException(
        s"$Name: '$cat' is not a registered graft catalog " +
          s"(no spark.sql.catalog.$cat.root)"))
    val df = TxnCatalog.changeFeed(spark, root, table, from, to)
      .getOrElse(throw new IllegalArgumentException(
        s"$Name: unknown table '$table' under $root at txn $to"))
    df.queryExecution.analyzed
  }

  /** Register the TVF in an existing session (the runtime twin of the
    * [[graft.GraftExtensions]] injection). Idempotent. */
  def install(spark: SparkSession): Unit =
    GraftSqlBridge.registerTableFunction(spark, Name, builder)
}
