package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over an activity feed: longest run of CONSECUTIVE
  * active calendar days per key (classic streak analytics — the
  * behavioral twin of the id-gap detector in ops/Profile).
  *
  * Algorithm (all integer/date arithmetic, oracle-exact):
  *  1. collapse the feed to distinct (key, day) — one hash aggregate,
  *     map-side combined, so everything downstream sees |keys|×|days|
  *     rows no matter how hot the raw feed is;
  *  2. rn = row_number over (key ORDER BY day); epochday − rn is
  *     constant within a consecutive run (the island id);
  *  3. per island: length + endpoints; per key: ONE more aggregate —
  *     n_active_days = Σ island lengths (islands partition the day
  *     set, so no separate distinct-count pass), and the best island
  *     picked with max(struct(len, −startEpoch, …)) so ties break to
  *     the EARLIEST start deterministically, map-side combined
  *     (no second window, no self-join).
  *
  * Scale shape: shuffle 1 keys the distinct on (key, day); shuffle 2
  * repartitions by key for the window; shuffle 3 moves only one row
  * per island. The per-key window partition is bounded by the calendar
  * (≤ a few thousand days), so no task ever sees more than one key's
  * day list.
  */
object Streaks {

  /** Per-key streak profile: n_active_days, best_streak (days),
    * streak_start / streak_end (the winning island's endpoints). */
  def longestDailyStreak(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val days = df
      .select(col(keyCol),
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date")).as("eday"))
      .groupBy(keyCol, "eday").agg(count(lit(1)).as("_n"))
      .drop("_n")
    val w = Window.partitionBy(keyCol).orderBy(col("eday"))
    val islands = days
      .withColumn("island", col("eday") - row_number().over(w))
      .groupBy(col(keyCol), col("island"))
      .agg(count(lit(1)).as("len"),
        min(col("eday")).as("s"), max(col("eday")).as("e"))
    islands
      .groupBy(col(keyCol))
      .agg(sum(col("len")).as("n_active_days"),
        max(struct(col("len"), (-col("s")).as("ns"), col("s"), col("e")))
          .as("best"))
      .select(col(keyCol), col("n_active_days"),
        col("best.len").as("best_streak"),
        date_add(lit("1970-01-01").cast("date"), col("best.s").cast("int"))
          .as("streak_start"),
        date_add(lit("1970-01-01").cast("date"), col("best.e").cast("int"))
          .as("streak_end"))
  }
}
