package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks as builtins: backward as-of join
  * and the keyed interval (range) join — both expressed as single-shuffle
  * declarative plans, no custom physical operator needed.
  *
  * Scale design:
  *  - [[asofJoin]] is the union-sort formulation: tag both sides, union,
  *    one window over (keys) ordered by (time, side) carrying the last
  *    right-side payload forward. ONE shuffle on the key columns, one
  *    within-partition sort — the same work any engine must do; no
  *    broadcast, no per-key loop, skew-bounded by the hottest key exactly
  *    like the equivalent sort-merge join.
  *  - [[rangeJoin]] buckets the time axis: points map to exactly one
  *    bucket, intervals are replicated per overlapped bucket (bounded by
  *    interval span / bucket width), and the join is an equi-join on
  *    (keys, bucket) + exact range filter. A (point, interval) pair can
  *    meet in at most one bucket — the point's — so no post-join dedup, the
  *    same argument as the J4 grid-bucketed spatial join.
  */
object Temporal {

  /** Backward as-of join: for every left row, the latest right row with
    * `right.timeCol <= left.timeCol` on the same key (inclusive), or nulls
    * when none (left outer semantics). The matched right time arrives as
    * `asof_ts`, right payload columns as `asof_<name>`.
    *
    * @param tolerance  max lookback as an interval Column (e.g.
    *                   `expr("INTERVAL 1 HOUR")`); None = unbounded
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, payloadCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(timeCol))
      .withColumn("__side", lit(0))
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(timeCol).as("__t"), lit(1).as("__side"),
        struct((timeCol +: payloadCols).map(col): _*).as("__rv")): _*)
    // union fills the missing side's columns with typed nulls; at equal
    // times the right row sorts first (side desc) so an exactly-
    // simultaneous right row is visible to the left row (<= semantics)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = u
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val gated = tolerance match {
      case Some(tol) =>
        when(col("__m").isNotNull &&
          col("__t") <= col("__m").getField(timeCol) + tol, col("__m"))
      case None => col("__m")
    }
    joined
      .withColumn("__g", gated)
      .select(
        leftCols.map(col) ++
          (col("__g").getField(timeCol).as("asof_ts") +:
            payloadCols.map(n => col("__g").getField(n).as(s"asof_$n"))): _*)
  }

  /** Keyed interval join: (point, interval) pairs on the same key with
    * `startCol <= point.tsCol < endCol` (half-open). `bucketSeconds` should
    * be on the order of a typical interval span — too small replicates
    * intervals, too large floods candidates.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    def bucketOf(t: Column): Column =
      floor(unix_timestamp(t) / bucketSeconds).cast("long")
    val pts = points.withColumn("__bucket", bucketOf(col(tsCol)))
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    pts.join(ivs, keyCols :+ "__bucket")
      .filter(col(startCol) <= col(tsCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
