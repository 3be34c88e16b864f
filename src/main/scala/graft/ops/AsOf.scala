package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (most-recent-prior) join — the canonical timeseries operator
  * Spark lacks natively (SPARK-22947): for each left row, attach the
  * right row with the greatest `rightTime <= leftTime` within the same
  * key. Composed from existing operators per the custom-operator
  * preference order — a union + keyed carry-forward window:
  *
  *   1. tag both sides and union them (right side = 0, left = 1, so a
  *      right row at the exact same timestamp sorts BEFORE the left
  *      row and is eligible — the `<=` in ASOF semantics);
  *   2. one window per key ordered by (time, side): `last(payload,
  *      ignoreNulls)` carries the latest right-side row forward — the
  *      payload travels as ONE struct so a null field inside a right
  *      row can never mix with an earlier row's value;
  *   3. keep the left rows, unpack the struct.
  *
  * Scale shape: ONE shuffle on the key and a per-key sort — the same
  * cost as any keyed window; no range-explosion, no per-key loop, no
  * broadcast requirement on either side. A pathologically hot key
  * serializes its partition like any window would; carry-forward
  * crosses every row of the key, so salting cannot apply — partition
  * by a finer natural key (e.g. user × day) when a key's history
  * outgrows a task. */
object AsOf {

  /** leftDf(key, leftTime, ...) ⟕ rightDf(key, rightTime, payload...):
    * left rows + `payload` columns from the as-of match (null when no
    * right row precedes). `payloadCols` must exist on the right side
    * and not collide with left columns.
    *
    * Right rows with a NULL `rightTime` are dropped: a row with no
    * timestamp can never be a most-recent-prior match (`null <= t` is
    * never true in predicate-ASOF semantics). Without the filter Spark
    * sorts nulls FIRST ascending, so a null-timestamp row would head
    * every key's window and its payload would carry into left rows
    * that have no genuine prior match. */
  def joinAsOf(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String]): DataFrame =
    joinAsOfImpl(leftDf, rightDf, keyCol, leftTime, rightTime, payloadCols,
      forward = false)

  /** Forward (next-at-or-after) as-of: for each left row, the right
    * row with the SMALLEST `rightTime >= leftTime` within the key —
    * the mirror of [[joinAsOf]], same single-shuffle carry-forward
    * construction traversed in descending time order (right rows sort
    * before left at an equal timestamp, so `>=` includes the exact
    * instant). Null right timestamps are dropped identically. */
  def joinAsOfForward(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String]): DataFrame =
    joinAsOfImpl(leftDf, rightDf, keyCol, leftTime, rightTime, payloadCols,
      forward = true)

  /** Backward as-of with a match-window bound (pandas
    * `merge_asof(tolerance=...)` semantics): the most-recent-prior row
    * still wins, but its payload is nulled when `within(leftTime,
    * rightTime)` is false — a stale quote is NOT a match. Same single
    * shuffle; the bound is a post-window projection, so it composes
    * with any time representation (`within` receives the two time
    * columns and returns a boolean Column). */
  def joinAsOfWithin(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String],
      within: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): DataFrame = {
    require(!leftDf.columns.contains(rightTime),
      s"joinAsOfWithin: right time column $rightTime collides with a left column")
    val j = joinAsOfImpl(leftDf, rightDf, keyCol, leftTime, rightTime,
      payloadCols :+ rightTime, forward = false)
    val keep = col(rightTime).isNotNull && within(col(leftTime), col(rightTime))
    j.select((leftDf.columns.toSeq.map(col) ++
      payloadCols.map(c => when(keep, col(c)).as(c))): _*)
  }

  /** Nearest as-of (pandas `merge_asof(direction='nearest')`): for
    * each left row, whichever of the most-recent-prior and
    * next-at-or-after right rows is closer in absolute time distance —
    * ties go BACKWARD (the prior row), matching the backward-biased
    * convention of the rest of the family. One-sided misses fall back
    * to the side that matched; a null left time matches nothing (as
    * does a null right time, dropped identically to [[joinAsOf]]).
    *
    * Scale shape: ONE shuffle — both carry directions are windows over
    * the same key partitioning (ascending and side-flipped orderings),
    * so the plan is a single Exchange with two local sorts, not two
    * joins. Times must be castable to timestamp (timestamps, NTZ
    * timestamps, or epoch-second numerics); distances compare in
    * microseconds. */
  def joinAsOfNearest(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "joinAsOfNearest: at least one payload column")
    val leftCols = leftDf.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"joinAsOfNearest: payload ${payloadCols.mkString(",")} collides with left columns")
    val t = "_asof_t"; val side = "_asof_side"; val p = "_asof_p"
    // payload struct leads with the right time so the chooser can
    // compare distances without a second pass
    val pType = StructType(rightDf.schema(rightTime) +: payloadCols.map(c => rightDf.schema(c)))
    val taggedRight = rightDf.filter(col(rightTime).isNotNull).select(
      (col(keyCol) +: col(rightTime).as(t) +: lit(0).as(side) +:
        struct((col(rightTime) +: payloadCols.map(col)): _*).as(p) +:
        leftCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(leftDf.schema(c).dataType).as(c))): _*)
    val taggedLeft = leftDf.select(
      (col(keyCol) +: col(leftTime).as(t) +: lit(1).as(side) +:
        lit(null).cast(pType).as(p) +:
        leftCols.filterNot(_ == keyCol).map(col)): _*)
    // backward: right rows sort BEFORE left at an equal instant, so
    // the frame up to current row sees them (`<=`); forward flips the
    // side order so equal-instant right rows land AFTER the left row
    // inside the following frame (`>=`)
    val wB = Window.partitionBy(keyCol).orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCol).orderBy(col(t).asc, col(side).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def micros(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val back = last(col(p), ignoreNulls = true).over(wB)
    val fwd = first(col(p), ignoreNulls = true).over(wF)
    val chosen = {
      val b = col("_asof_b"); val f = col("_asof_f"); val tM = micros(col(t))
      when(col(t).isNull, lit(null).cast(pType))
        .when(b.isNull, f)
        .when(f.isNull, b)
        .otherwise(when(
          tM - micros(b.getField(rightTime)) <= micros(f.getField(rightTime)) - tM,
          b).otherwise(f))
    }
    taggedRight.unionByName(taggedLeft)
      .withColumn("_asof_b", back)
      .withColumn("_asof_f", fwd)
      .filter(col(side) === 1)
      .withColumn(p, chosen)
      .select((col(keyCol) +: leftCols.filterNot(_ == keyCol).map(col)) ++
        payloadCols.map(c => col(s"$p.$c").as(c)): _*)
  }

  private def joinAsOfImpl(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String],
      forward: Boolean): DataFrame = {
    require(payloadCols.nonEmpty, "joinAsOf: at least one payload column")
    val leftCols = leftDf.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"joinAsOf: payload ${payloadCols.mkString(",")} collides with left columns")
    val t = "_asof_t"; val side = "_asof_side"; val p = "_asof_p"
    val pType = StructType(payloadCols.map(c => rightDf.schema(c)))
    val taggedRight = rightDf.filter(col(rightTime).isNotNull).select(
      (col(keyCol) +: col(rightTime).as(t) +: lit(0).as(side) +:
        struct(payloadCols.map(col): _*).as(p) +:
        leftCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(leftDf.schema(c).dataType).as(c))): _*)
    val taggedLeft = leftDf.select(
      (col(keyCol) +: col(leftTime).as(t) +: lit(1).as(side) +:
        lit(null).cast(pType).as(p) +:
        leftCols.filterNot(_ == keyCol).map(col)): _*)
    val tOrd = if (forward) col(t).desc else col(t).asc
    val w = Window.partitionBy(keyCol).orderBy(tOrd, col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn(p, last(col(p), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select((col(keyCol) +: leftCols.filterNot(_ == keyCol).map(col)) ++
        payloadCols.map(c => col(s"$p.$c").as(c)): _*)
  }
}
