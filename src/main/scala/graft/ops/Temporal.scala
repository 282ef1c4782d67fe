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

  /** [[gapFillLocf]]'s LINEAR cousin: unobserved slots interpolate
    * between the surrounding observations instead of carrying the last
    * one — the resampling step before any train-on-regular-grid
    * pipeline. Leading gaps backfill from the first observation,
    * trailing gaps carry the last (no extrapolation). Same scale shape
    * as LOCF: one hash aggregate, a bounded sequence explode, and TWO
    * passes of the same keyed window (one forward, one backward — still
    * a single shuffle; Spark reuses the partitioning and re-sorts).
    * Pure IEEE arithmetic (no libm), so results are bit-reproducible
    * across engines given identical inputs: the interpolation ratio
    * divides explicit doubles. */
  def gapFillLinear(df: DataFrame, keyCols: Seq[String], timeCol: String,
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
    val back = Window.partitionBy(keys: _*).orderBy(col("__slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keys: _*).orderBy(col("__slot"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsSlot = when(col("__v").isNotNull, col("__slot"))
    grid.join(perSlot, keyCols :+ "__slot", "left")
      .withColumn("filled", col("__v").isNull)
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__ps", last(obsSlot, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__ns", first(obsSlot, ignoreNulls = true).over(fwd))
      .withColumn("__f",
        when(col("__v").isNotNull, col("__v"))
          .when(col("__pv").isNull, col("__nv")) // leading gap: backfill
          .when(col("__nv").isNull, col("__pv")) // trailing gap: carry
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((col("__slot") - col("__ps")).cast("double") /
              (col("__ns") - col("__ps")).cast("double"))))
      .select(keys ++ Seq(col("__slot").as("slot_ts"),
        col("__f").as(valueCol), col("filled")): _*)
  }

  /** OHLC resample: per key and epoch period, the first (open), max
    * (high), min (low) and last (close) of `valueCol`, plus the
    * observation count — the canonical downsample of any metered series.
    * First/last are deterministic via min_by/max_by on (ts, value): at
    * duplicate timestamps the larger value wins `close` and the smaller
    * wins `open`, mirrored exactly in the oracle. One hash aggregate. */
  def ohlc(events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      periodSeconds: Long): DataFrame = {
    val period = (floor(unix_timestamp(col(tsCol)) / periodSeconds) *
      periodSeconds).cast("long")
    events
      .groupBy(col(keyCol), period.as("period_start"))
      .agg(
        min_by(col(valueCol), struct(col(tsCol), col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), struct(col(tsCol), col(valueCol))).as("close"),
        count(lit(1)).as("n_obs"))
  }

  /** Cohort retention: keys cohort by their FIRST active period (epoch
    * time / `periodSeconds`, engine-neutral integer arithmetic — no
    * calendar functions to disagree over), then count distinct keys active
    * at each offset after their cohort. Output (cohort, offset, n_active):
    * the retention-curve table behind every engagement dashboard. Two hash
    * aggregates + one join, all keyed on the key column. */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
      periodSeconds: Long): DataFrame = {
    val period = floor(unix_timestamp(col(tsCol)) / periodSeconds).cast("long")
    val act = events.select(col(keyCol).as("k"), period.as("period")).distinct()
    val cohort = act.groupBy("k").agg(min("period").as("cohort"))
    act.join(cohort, Seq("k"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(countDistinct(col("k")).as("n_active"))
  }

  /** Time-decayed aggregate: per key, Σ value · 2^(−Δt/halfLife) at a fixed
    * reference instant — the standard recency-weighted feature (decayed
    * revenue, decayed activity) with half-life semantics. Row-local weight
    * + one hash aggregate; Δt in whole seconds so both engines weigh
    * identically. */
  def decayedSum(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, halfLifeSeconds: Long, refEpochSeconds: Long): DataFrame =
    events
      .groupBy(col(keyCol))
      .agg(round(sum(col(valueCol) *
        pow(lit(2.0),
          -(lit(refEpochSeconds) - unix_timestamp(col(tsCol))).cast("double")
            / halfLifeSeconds)), 6).as("decayed_sum"))

  /** Batch sessionization: assign each event a per-key session id, where a
    * gap of more than `gapSeconds` between consecutive events opens a new
    * session (the batch twin of the streaming session windows in
    * [[graft.streaming.Streams]]). Session ids are 0-based per key in time
    * order — a pure function of the data.
    *
    * ONE shuffle: the lag/cumulative-sum pair runs in a single window pass
    * over (key, time) — the canonical gaps-and-islands formulation; no
    * self-join, no driver state. Adds `session` (long) and keeps all input
    * columns. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull, lit(0))
      .otherwise((unix_timestamp(col(tsCol)) - unix_timestamp(prev) >
        gapSeconds).cast("int"))
    events
      .withColumn("__new", newSession)
      .withColumn("session",
        (sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .cast("long"))
      .drop("__new")
  }

  /** Funnel analysis: per key, the timestamps at which the ordered `steps`
    * were first reached — step i counts only STRICTLY after step i−1 (the
    * greedy earliest chain: first steps(0) event, then the first steps(1)
    * event after it, …), plus a `completed` flag requiring the whole chain
    * inside `windowMicros`. Keys with no steps(0) event are dropped.
    *
    * ONE shuffle: events group to their key, sort row-local
    * (`sort_array`), and a single left fold over the sorted array advances
    * the step cursor — no per-step join chain (the n-step chain costs n
    * shuffles and re-scans; this costs one, the classic sessionize shape).
    * Per-key event counts bound task memory, as with any per-key window.
    * Output: (key, step_0_us … step_{n−1}_us epoch-micros columns — null
    * where the funnel stalled — and `completed`).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowMicros: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val n = steps.size
    // fold state: array of n epoch-micros, -1 = step not reached
    val init = array(Seq.fill(n)(lit(-1L)): _*)
    val sorted = events
      .select(col(keyCol).as("k"),
        struct(unix_micros(col(tsCol)).as("t"), col(typeCol).as("y")).as("ev"))
      .groupBy("k").agg(sort_array(collect_list(col("ev"))).as("evs"))
    val folded = sorted.select(col("k"),
      aggregate(col("evs"), init, (acc, ev) => {
        val t = ev.getField("t"); val y = ev.getField("y")
        // at most one step can fire per event: step i fires iff its type
        // matches, i-1 is reached, i is not, and the event is strictly
        // after step i-1
        steps.indices.foldLeft(acc) { (cur, i) =>
          val fires =
            if (i == 0) y === steps(0) && acc.getItem(0) === -1L
            else y === steps(i) && acc.getItem(i - 1) =!= -1L &&
              acc.getItem(i) === -1L && t > acc.getItem(i - 1)
          when(fires,
            transform(acc, (v, idx) => when(idx === i, t).otherwise(v)))
            .otherwise(cur)
        }
      }).as("st"))
      .filter(col("st").getItem(0) =!= -1L)
    val stepCols = steps.indices.map(i =>
      when(col("st").getItem(i) =!= -1L, col("st").getItem(i))
        .as(s"step_${i}_us"))
    val completed = (col("st").getItem(n - 1) =!= -1L &&
      col("st").getItem(n - 1) - col("st").getItem(0) <= windowMicros)
      .as("completed")
    folded.select(col("k") +: stepCols :+ completed: _*)
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
