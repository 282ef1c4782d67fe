package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable id; keyed to SURVEY.md §2 inventory rows (j1.., a3.., f5..,
  *               x.. for LLM-pipeline extensions, w.. for windows, st.. for streaming)
  * @param run    the Spark-first implementation: (session, sfDir) => result
  * @param oracle equivalent SQL runnable by DuckDB over the same parquet tables;
  *               None for ops that are not cleanly SQL-expressible (driver then
  *               records a weaker rows-only check; correctness covered by ScalaTest)
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryGroup {
  def defs: Seq[QueryDef]
}
