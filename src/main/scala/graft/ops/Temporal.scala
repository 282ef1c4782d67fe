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

  /** Gap-fill a keyed irregular time series onto a fixed grid with
    * last-observation-carried-forward (LOCF) — the resample/regularize step
    * every downstream window model needs before irregular event data.
    *
    * Per key: slots are `stepSeconds`-wide epoch buckets spanning
    * [min(ts), max(ts)]; each observed slot takes its LATEST observation
    * (deterministic: max by (ts, value)); unobserved slots carry the
    * previous slot's value forward and are flagged `filled = true`.
    * Output: (keys…, `slot_ts` epoch seconds, value, `filled`).
    *
    * Scale shape: one hash aggregate per (key, slot), one tiny per-key
    * bounds aggregate, a bounded `sequence` explode (span/step rows per
    * key — the caller picks `stepSeconds` to keep that sane), and ONE
    * window shuffle on the key for the carry-forward. No self-join, no
    * per-key driver loop; skew is bounded by the hottest key's span like
    * any per-key window.
    */
  def gapFillLocf(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, stepSeconds: Long): DataFrame = {
    val keys = keyCols.map(col)
    val slotted = df.withColumn("__slot",
      (floor(unix_timestamp(col(timeCol)) / stepSeconds) * stepSeconds).cast("long"))
    val perSlot = slotted.groupBy(keys :+ col("__slot"): _*)
      .agg(max_by(col(valueCol), struct(col(timeCol), col(valueCol))).as("__v"))
    val bounds = slotted.groupBy(keys: _*)
      .agg(min("__slot").as("__lo"), max("__slot").as("__hi"))
    val grid = bounds.select(keys :+
      explode(sequence(col("__lo"), col("__hi"), lit(stepSeconds))).as("__slot"): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("__slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perSlot, keyCols :+ "__slot", "left")
      .withColumn("filled", col("__v").isNull)
      .withColumn("__f", last(col("__v"), ignoreNulls = true).over(w))
      .select(keys ++ Seq(col("__slot").as("slot_ts"),
        col("__f").as(valueCol), col("filled")): _*)
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
