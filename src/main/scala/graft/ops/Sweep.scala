package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line concurrency: the capacity-planning primitive ("how many
  * sessions were live at once, and when did the peak happen?").
  *
  * Scale design: the classic +1/−1 delta sweep, but the deltas are
  * AGGREGATED TO THE TIME AXIS FIRST — one hash shuffle over the fact
  * table collapses every interval edge at the same (key, t) into a
  * single net delta, so the inherently-sequential running-sum window
  * runs over |keys × distinct edge times| rows, never |intervals|.
  * With a bounded axis (seconds, minutes) that is the same trick that
  * keeps the drawdown and LOCF operators sane at 100 TB. The window is
  * partitioned by key, so distinct keys sweep in parallel.
  */
object Sweep {

  /** Per-key peak concurrency over half-open intervals
    * [startSec, startSec + durSec): returns (key, peak, peak_at_sec)
    * where peak_at_sec is the EARLIEST time the peak is reached.
    * Half-open means an interval ending at t never overlaps one
    * starting at t — the net delta at t already nets them out. */
  def peakConcurrency(df: DataFrame, keyCol: String, startSec: Column,
      durSec: Long): DataFrame = {
    require(durSec > 0, s"peakConcurrency: durSec must be positive, got $durSec")
    val deltas = df.select(col(keyCol).as("k"), startSec.as("t"), lit(1L).as("d"))
      .unionAll(df.select(col(keyCol).as("k"),
        (startSec + lit(durSec)).as("t"), lit(-1L).as("d")))
      .groupBy("k", "t").agg(sum(col("d")).as("d"))
    val w = Window.partitionBy("k").orderBy("t")
    // peak via a second full-partition window over the SAME partitioning
    // — no self-join, no extra shuffle: one Exchange feeds both frames
    val running = deltas.withColumn("live",
      sum(col("d")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("peak", max(col("live")).over(Window.partitionBy("k")))
    running.filter(col("live") === col("peak"))
      .groupBy(col("k").as(keyCol), col("peak"))
      .agg(min(col("t")).as("peak_at_sec"))
  }
}
