package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data profiling: one long-format row of (column, metric, value) per
  * column statistic — the lake-health scan run before any 100 TB job is
  * pointed at a table.
  *
  * One pass over the data: ALL per-column aggregates run in a single
  * aggregation (Spark evaluates them columnar in one scan), then the 1×N
  * aggregate row is unpivoted driver-free with a stack-style explode.
  * Distinct counts are approx_count_distinct (HLL++) — an exact distinct
  * per column would be one shuffle EACH; the sketch keeps profiling
  * single-pass at any scale.
  */
object Profile {

  /** Profile the given columns (numeric: count/nulls/ndv/min/max/mean;
    * other types: count/nulls/ndv). Values arrive as doubles (non-numeric
    * min/max omitted rather than stringly-typed).
    *
    * @param exactNdv exact COUNT(DISTINCT) instead of the HLL++ sketch —
    *                 one extra expand+shuffle per column; verification-
    *                 scale only, keep the sketch default at 100 TB
    */
  def profile(df: DataFrame, cols: Seq[String],
      exactNdv: Boolean = false): DataFrame = {
    val fields = df.schema.fields.filter(f => cols.contains(f.name))
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val ndv =
        if (exactNdv) countDistinct(c).cast("double")
        else approx_count_distinct(c).cast("double")
      val base = Seq(
        count(c).cast("double").as(s"${f.name}__count"),
        sum(when(c.isNull, 1L).otherwise(0L)).cast("double").as(s"${f.name}__nulls"),
        ndv.as(s"${f.name}__ndv"))
      f.dataType match {
        case _: NumericType => base ++ Seq(
          min(c).cast("double").as(s"${f.name}__min"),
          max(c).cast("double").as(s"${f.name}__max"),
          avg(c.cast("double")).as(s"${f.name}__mean"))
        case _ => base
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = one.columns.map { n =>
      val Array(column, metric) = n.split("__", 2)
      struct(lit(column).as("colname"), lit(metric).as("metric"),
        col(s"`$n`").as("value"))
    }
    one.select(explode(array(entries: _*)).as("e"))
      .select(col("e.colname"), col("e.metric"), col("e.value"))
  }

  /** Shannon entropy of a categorical column per group: −Σ p·ln p over the
    * category distribution (nats, 6 dp) plus the category count — the
    * diversity/skew signal a corpus-mix dashboard tracks per source or per
    * user. Two hash aggregates keyed on (group, category) then group; the
    * inner counts are exact longs, so both engines divide the identical
    * integers before the only float step. */
  def entropyByGroup(df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val cnt = df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
    val tot = Window.partitionBy(col(groupCol))
    cnt
      .withColumn("__t", sum(col("__c")).over(tot))
      .withColumn("__p", col("__c").cast("double") / col("__t"))
      .groupBy(col(groupCol))
      .agg(round(-sum(col("__p") * log(col("__p"))), 6).as("entropy"),
        count(lit(1)).as("n_categories"))
  }
}
