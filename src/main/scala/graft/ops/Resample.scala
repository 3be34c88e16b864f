package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: fixed-step resampling with gap fill
  * (last-observation-carried-forward) and trailing range-frame rolling
  * aggregates — the two primitives a metrics/feature pipeline needs to
  * turn an irregular event feed into model-ready series.
  *
  * Scale notes. Both operators shuffle exactly once, on the series key:
  * the per-key grid is generated with `sequence` + `explode` AFTER a
  * keyed min/max aggregate (grid size = span/step per key, never a
  * global cross join), and the LOCF / rolling passes are keyed window
  * functions — no partitionless window, no driver materialization.
  * Timestamps cross into integer epoch seconds via `unix_micros` DIV —
  * pure integer math, so the bucket algebra is reproducible anywhere
  * (a double `epoch()` would drift in the fractional part).
  */
object Resample {

  /** Integer epoch seconds (floor) of a timestamp column. The cast
    * absorbs TIMESTAMP_NTZ inputs (the driver fixtures) — under the
    * UTC session timezone the wall-clock reading is the epoch both
    * engines agree on. */
  def epochSec(ts: Column): Column =
    (unix_micros(ts.cast("timestamp")) / lit(1000000L)).cast("long")

  /** Resample one value series per key onto a fixed `stepSec` grid.
    *
    * Bucket value = the value of the LAST observation in the bucket
    * (max (ts, tieCol)); missing buckets between a key's first and
    * last observation are emitted with `filled = 1` and the value
    * carried forward from the nearest earlier bucket. Values cross as
    * scale4 fixed-point longs so the fill is integer-exact.
    *
    * Output: key, bucket (epoch sec), n_events, filled, v_locf_x1e4.
    */
  def resampleLocf(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, stepSec: Long): DataFrame = {
    require(stepSec > 0, s"resampleLocf: step $stepSec")
    val joined = gridJoined(df, keyCol, tsCol, valueCol, tieCol, stepSec)
    val locf = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(col(keyCol), col("bucket"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      when(col("v_x1e4").isNull, lit(1)).otherwise(lit(0)).as("filled"),
      last(col("v_x1e4"), ignoreNulls = true).over(locf).as("v_locf_x1e4"))
  }

  /** Shared resample plumbing: per-(key, bucket) latest observation +
    * event count, left-joined onto the key's dense min..max bucket
    * grid. Null v_x1e4 marks a gap bucket. */
  private def gridJoined(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, stepSec: Long): DataFrame = {
    val step = lit(stepSec)
    val obs = df.select(col(keyCol), epochSec(col(tsCol)).as("sec"),
      graft.functions.F.scale4(col(valueCol)).as("v_x1e4"), col(tieCol).as("tie"))
      .withColumn("bucket", (col("sec") / step).cast("long") * step)
    // one row per (key, bucket): the latest observation wins; the
    // count aggregates over every row in the bucket
    val rn = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col("sec").desc, col("tie").desc)
    val perBucket = obs
      .withColumn("rn", row_number().over(rn))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn") === 1, col("v_x1e4"))).as("v_x1e4"))
    val grid = perBucket.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("mnb"), max(col("bucket")).as("mxb"))
      .select(col(keyCol),
        explode(sequence(col("mnb"), col("mxb"), step)).as("bucket"))
    grid.join(perBucket, Seq(keyCol, "bucket"), "left")
  }

  /** Linear-interpolation resample onto the same grid as
    * [[resampleLocf]]: gap buckets take the weighted mean of the
    * nearest earlier and later observed buckets,
    *   v = (v_p·(bn−b) + v_n·(b−bp)) div (bn−bp),
    * computed in ×1e4 fixed point with integer floor division —
    * REQUIRES non-negative values (Spark `div` truncates toward zero,
    * SQL `//` floors; they agree only on a non-negative numerator).
    * Leading/trailing gaps fall back to nearest-known (back-/forward-
    * fill). Output: key, bucket, n_events, filled, v_lerp_x1e4. */
  def resampleLerp(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, stepSec: Long): DataFrame = {
    require(stepSec > 0, s"resampleLerp: step $stepSec")
    val joined = gridJoined(df, keyCol, tsCol, valueCol, tieCol, stepSec)
    val byB = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val back = byB.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = byB.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("v_x1e4").isNotNull, col("bucket"))
    val vp = last(col("v_x1e4"), ignoreNulls = true).over(back)
    val bp = last(obsBucket, ignoreNulls = true).over(back)
    val vn = first(col("v_x1e4"), ignoreNulls = true).over(fwd)
    val bn = first(obsBucket, ignoreNulls = true).over(fwd)
    joined.select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("v_x1e4").isNull, lit(1)).otherwise(lit(0)).as("filled"),
        vp.as("vp"), bp.as("bp"), vn.as("vn"), bn.as("bn"))
      .withColumn("v_lerp_x1e4",
        when(col("vp").isNull, col("vn"))
          .when(col("vn").isNull, col("vp"))
          .when(col("bn") === col("bp"), col("vp"))
          .otherwise(expr(
            "(vp * (bn - bucket) + vn * (bucket - bp)) div (bn - bp)")))
      .drop("vp", "bp", "vn", "bn")
  }

  /** Trailing-window anomaly flags, INTEGER-EXACT end to end: over the
    * same keyed RANGE frame as [[rollingRange]], accumulate count n,
    * sum s and sum-of-squares q of the ×100 fixed-point value, then
    * flag rows where the cleared-form z² test
    *   (n·v − s)² > k² · (n·q − s²)   (and n ≥ minN)
    * holds — algebraically z > k without ever forming a float, so the
    * distributed result is bit-reproducible and the oracle replays
    * pure integer ops. Overflow budget: v2 ≤ 1e6 (values ≤ 1e4),
    * frame rows ≤ 1e4 → every product stays under 1e17 < 2⁶³.
    * Output: id, key, sec, n_win, v_x100, is_anomaly. */
  def rollingAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, windowSec: Long, k: Long,
      minN: Long): DataFrame = {
    require(windowSec > 0 && k > 0 && minN >= 2,
      s"rollingAnomaly: $windowSec/$k/$minN")
    val base = df.select(col(idCol), col(keyCol), epochSec(col(tsCol)).as("sec"),
      floor(col(valueCol) * lit(100d) + lit(0.5d)).cast("long").as("v2"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("sec"))
      .rangeBetween(-(windowSec - 1), 0)
    val stats = base.select(col(idCol), col(keyCol), col("sec"), col("v2"),
      count(lit(1)).over(w).as("n"),
      sum(col("v2")).over(w).as("s"),
      sum(col("v2") * col("v2")).over(w).as("q"))
    val lhs = (col("n") * col("v2") - col("s")) * (col("n") * col("v2") - col("s"))
    val rhs = lit(k * k) * (col("n") * col("q") - col("s") * col("s"))
    stats.select(col(idCol), col(keyCol), col("sec"),
      col("n").as("n_win"), col("v2").as("v_x100"),
      when(col("n") >= minN && lhs > rhs, lit(1)).otherwise(lit(0)).as("is_anomaly"))
  }

  /** Trailing time-range rolling aggregate: for every row, the count
    * and scale4-exact sum of `valueCol` over the same key within the
    * last `windowSec` seconds (inclusive of same-second peers — a
    * RANGE frame, so simultaneous events aggregate symmetrically).
    *
    * Output: original row id columns + sec, n_win, sum_v_x1e4.
    */
  def rollingRange(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, s"rollingRange: window $windowSec")
    val base = df.select(col(idCol), col(keyCol), epochSec(col(tsCol)).as("sec"),
      graft.functions.F.scale4(col(valueCol)).as("v_x1e4"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("sec"))
      .rangeBetween(-(windowSec - 1), 0)
    base.select(col(idCol), col(keyCol), col("sec"),
      count(lit(1)).over(w).as("n_win"),
      sum(col("v_x1e4")).over(w).as("sum_v_x1e4"))
  }
}
