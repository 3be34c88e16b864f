package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreaksSpec extends SparkSpec {
  import spark.implicits._

  private def at(day: String) = Timestamp.valueOf(s"$day 10:00:00")

  test("longestDailyStreak: islands split on gaps, ties break to earliest start") {
    // user 1: days 1-3 (streak 3), gap, days 6-7 (streak 2) → best 3
    // user 2: two separate 2-day streaks → TIE, earliest start wins
    // user 3: one day, multiple events that day (distinct collapses)
    val df = Seq(
      (1L, at("2024-01-01")), (1L, at("2024-01-02")), (1L, at("2024-01-03")),
      (1L, at("2024-01-06")), (1L, at("2024-01-07")),
      (2L, at("2024-02-01")), (2L, at("2024-02-02")),
      (2L, at("2024-02-10")), (2L, at("2024-02-11")),
      (3L, at("2024-03-05")), (3L, at("2024-03-05"))
    ).toDF("user_id", "ts")
    val out = Streaks.longestDailyStreak(df, "user_id", "ts")
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_active_days"),
        r.getAs[Long]("best_streak"),
        r.getAs[java.sql.Date]("streak_start").toString,
        r.getAs[java.sql.Date]("streak_end").toString))
    assert(out.toSeq == Seq(
      (1L, 5L, 3L, "2024-01-01", "2024-01-03"),
      (2L, 4L, 2L, "2024-02-01", "2024-02-02"),
      (3L, 1L, 1L, "2024-03-05", "2024-03-05")))
  }

  test("transitionCounts: lag pairs, integer probability, totals per source") {
    // user 1: a→b→b→c ; user 2: a→c. Transitions: a→b, b→b, b→c, a→c.
    val df = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "b"), (4L, 1L, "c"),
      (5L, 2L, "a"), (6L, 2L, "c")
    ).map { case (id, u, s) => (id, new Timestamp(id * 1000L), u, s) }
      .toDF("event_id", "ts", "user_id", "state")
    val out = Transitions.transitionCounts(df, "user_id", "ts", "state", "event_id")
      .orderBy("prev_state", "next_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Long]("total_from"), r.getAs[Long]("p_x1e4")))
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 2L, 5000L),
      ("a", "c", 1L, 2L, 5000L),
      ("b", "b", 1L, 2L, 5000L),
      ("b", "c", 1L, 2L, 5000L)))
  }

  test("ntileProfile: closed-form bucket ids replicate the ntile window exactly") {
    // 10 rows, k=4 → SQL ntile buckets of 3,3,2,2 — the remainder
    // lands on the FIRST buckets. Check against the built-in window
    // (single partition is fine at test scale) across several n/k.
    for ((n, k) <- Seq((10, 4), (7, 3), (3, 5), (12, 4), (1, 2))) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % 19).toDouble))
        .toDF("id", "x")
      val viaOp = Stats.ntileProfile(df, "x", Seq("id"), k)
        .orderBy("bucket").collect()
        .map(r => (r.getInt(0), r.getAs[Long]("n_rows")))
      val viaWindow = df
        .withColumn("bucket", ntile(k).over(Window.orderBy(col("x"), col("id"))))
        .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
        .orderBy("bucket").collect()
        .map(r => (r.getInt(0), r.getAs[Long]("n_rows")))
      assert(viaOp.toSeq == viaWindow.toSeq, s"n=$n k=$k")
    }
  }

  test("ntileProfile: bucket aggregates are exact decimals") {
    val df = Seq((1L, 1.25), (2L, 2.50), (3L, 3.75), (4L, 5.00))
      .toDF("id", "x")
    val out = Stats.ntileProfile(df, "x", Seq("id"), 2)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_rows"),
        r.getAs[java.math.BigDecimal]("x_sum").toPlainString))
    assert(out.toSeq == Seq((1, 2L, "3.75"), (2, 2L, "8.75")))
  }
}
