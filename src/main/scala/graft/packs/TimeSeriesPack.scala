package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables
import graft.ops.{Resample, Stats}

/** Time-series regularization + distribution scoring over the events /
  * lineitem feeds: fixed-step LOCF resampling, trailing range-frame
  * rolling aggregates, and group-wise z-score outlier flags.
  *
  * The resample/rolling fixtures restrict to `user_id < 40` — the
  * sf1 generator shifts user ids per copy, so the filtered slice (and
  * with it the oracle compare) stays the SAME bounded size at every
  * scale factor while the operators underneath still scan the full
  * feed the filter is pushed into.
  */
object TimeSeriesPack extends QueryPack {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").filter(col("user_id") < 40)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hourly LOCF resample per user: grid from per-key min/max bucket,
    // latest-in-bucket value, gaps filled carried-forward.
    "events_resample_locf" -> ((s, dir) =>
      Resample.resampleLocf(events(s, dir), "user_id", "ts", "value",
          "event_id", stepSec = 3600L)
        .orderBy("user_id", "bucket")),
    // Trailing 1-hour rolling count + exact fixed-point sum per user,
    // RANGE frame over integer epoch seconds (same-second peers
    // aggregate symmetrically in both engines).
    "window_rolling_range" -> ((s, dir) =>
      Resample.rollingRange(events(s, dir), "user_id", "ts", "value",
          "event_id", windowSec = 3600L)
        .orderBy("user_id", "sec", "event_id")),
    // Group-wise z-score outliers over the FULL lineitem table
    // (decimal-exact moments, fixed IEEE tree), emitted for a bounded
    // key slice so the compare stays small at any sf.
    "stats_outliers" -> ((s, dir) =>
      Stats.outlierScores(Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice", thresholdX1e4 = 15000L)
        .filter(col("l_orderkey") < 400)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("z_x1e4"), col("is_outlier"))
        .orderBy("l_orderkey", "l_linenumber")),
  )

  /** Shared event-slice CTE: integer epoch seconds + scale4 value. */
  private val evBase =
    """SELECT event_id, user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
      |    CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS v_x1e4
      |  FROM events WHERE user_id < 40""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "events_resample_locf" ->
      s"""WITH base AS ($evBase),
         |obs AS (
         |  SELECT *, (sec // 3600) * 3600 AS bucket,
         |    row_number() OVER (PARTITION BY user_id, (sec // 3600) * 3600
         |                       ORDER BY sec DESC, event_id DESC) AS rn
         |  FROM base),
         |per_bucket AS (
         |  SELECT user_id, bucket, count(*) AS n_events,
         |    max(CASE WHEN rn = 1 THEN v_x1e4 END) AS v_x1e4
         |  FROM obs GROUP BY 1, 2),
         |bounds AS (
         |  SELECT user_id, min(bucket) AS mnb, max(bucket) AS mxb
         |  FROM per_bucket GROUP BY 1),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(mnb, mxb, 3600)) AS bucket
         |  FROM bounds),
         |j AS (
         |  SELECT g.user_id, g.bucket,
         |    coalesce(p.n_events, 0) AS n_events,
         |    CASE WHEN p.v_x1e4 IS NULL THEN 1 ELSE 0 END AS filled,
         |    p.v_x1e4
         |  FROM grid g LEFT JOIN per_bucket p
         |    ON g.user_id = p.user_id AND g.bucket = p.bucket)
         |SELECT user_id, bucket, n_events, filled,
         |  last_value(v_x1e4 IGNORE NULLS) OVER (
         |    PARTITION BY user_id ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf_x1e4
         |FROM j ORDER BY user_id, bucket""".stripMargin,
    "window_rolling_range" ->
      s"""WITH base AS ($evBase)
         |SELECT event_id, user_id, sec,
         |  count(*) OVER w AS n_win,
         |  CAST(sum(v_x1e4) OVER w AS BIGINT) AS sum_v_x1e4
         |FROM base
         |WINDOW w AS (PARTITION BY user_id ORDER BY sec
         |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, sec, event_id""".stripMargin,
    // replays the identical cleared-form IEEE tree over exact moments:
    // z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²)
    "stats_outliers" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(l_extendedprice AS DECIMAL(18,2))) AS sxx
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  CASE WHEN CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE) -
        |            CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE) <= 0
        |    THEN NULL
        |    ELSE CAST(floor(
        |      (CAST(m.n AS DOUBLE) * CAST(l.l_extendedprice AS DOUBLE) -
        |       CAST(m.sx AS DOUBLE)) /
        |      sqrt(CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE) -
        |           CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) * 1e4 + 0.5)
        |      AS BIGINT) END AS z_x1e4,
        |  CASE WHEN CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE) -
        |            CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE) <= 0 THEN 0
        |    WHEN abs(CAST(floor(
        |      (CAST(m.n AS DOUBLE) * CAST(l.l_extendedprice AS DOUBLE) -
        |       CAST(m.sx AS DOUBLE)) /
        |      sqrt(CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE) -
        |           CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) * 1e4 + 0.5)
        |      AS BIGINT)) > 15000 THEN 1 ELSE 0 END AS is_outlier
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        |WHERE l.l_orderkey < 400
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
