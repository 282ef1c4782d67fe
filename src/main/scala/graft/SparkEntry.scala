package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every implemented operator from SURVEY.md §2 is registered as a [[QueryDef]]
  * in one of the [[QueryGroup]]s below; this object just flattens them into the
  * (queries, oracleSql) maps the driver consumes.
  */
object SparkEntry {

  private def groups: Seq[QueryGroup] = Seq(
    _root_.graft.queries.RelationalQueries,
    _root_.graft.queries.WindowQueries,
    _root_.graft.queries.GroupingQueries,
    _root_.graft.queries.SetOpQueries,
    _root_.graft.queries.FunctionQueries,
    _root_.graft.queries.ExtensionQueries,
    _root_.graft.queries.GeoQueries,
    _root_.graft.queries.CatalogQueries,
    _root_.graft.queries.StreamingQueries,
    _root_.graft.queries.SqlQueries,
    _root_.graft.queries.TemporalGraphQueries,
    _root_.graft.queries.TextStatsQueries,
    _root_.graft.queries.LayoutQueries,
    _root_.graft.queries.MultimodalQueries,
    _root_.graft.queries.CurationQueries
  )

  private lazy val all: Seq[QueryDef] = {
    val ds = groups.flatMap(_.defs)
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(all.map(q => q.name -> q.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }: _*)
}
