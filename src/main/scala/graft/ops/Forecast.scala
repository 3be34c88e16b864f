package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt's linear-trend double exponential smoothing (Holt 1957) — the
  * minimal trend-aware forecaster an operational-metrics pipeline runs
  * over every series it monitors, and the natural next step after the
  * STL decomposition gate: STL explains a series, Holt extrapolates it.
  *
  * The smoothing recurrence is inherently sequential PER SERIES, so the
  * scale axis is the series count, not the series length: each key's
  * ordered values are packed into one array (bounded by the time grid —
  * hours in the observation window — NOT by row count; the per-hour
  * aggregate collapses the feed first) and folded with a higher-order
  * `aggregate` Column lambda. No driver loop, no UDF, no shuffle beyond
  * the one per-key aggregate; a million independent series fold in
  * parallel, which is exactly the 100 TB shape (many series × bounded
  * grid).
  *
  * All state is ×1e4 fixed point with α = aNum/10, β = bNum/10; every
  * division is by the literal 10, and Spark's `div` and DuckDB's `//`
  * both truncate toward zero (verified including negatives — trends go
  * negative), so the fold is bit-identical in both engines.
  *
  * Contract: the seed is (l, b) = (y₀·S, (y₁−y₀)·S) — the classic
  * first-difference slope seed (b = 0 for one-point series) — then
  * every observation from y₁ on applies the update (y₁ re-enters, as
  * in the standard Hyndman formulation):
  *   l' = (aNum·y·S + (10−aNum)·(l + b)) div 10
  *   b' = (bNum·(l' − l) + (10−bNum)·b) div 10
  * and the h-step forecast is l + h·b.
  */
object Forecast {

  /** Fold `series` (one row per key × grid step, PRE-DENSIFIED by the
    * caller — gaps are a data decision, not a forecaster one) into one
    * row per key: observation count, final level/trend, and `horizon`
    * forecasts, all ×1e4 longs. */
  def holtLinear(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String, aNum: Int = 8, bNum: Int = 3,
      horizon: Int = 3): DataFrame = {
    require(aNum > 0 && aNum < 10, s"holtLinear: aNum=$aNum must be in 1..9")
    require(bNum > 0 && bNum < 10, s"holtLinear: bNum=$bNum must be in 1..9")
    require(horizon >= 1, s"holtLinear: horizon=$horizon must be >= 1")
    val packed = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(ordCol).as("t"), col(valCol).cast("long").as("y")))).as("srt"))
      .select(col(keyCol), expr("transform(srt, x -> x.y)").as("vals"))
    val fold = holtFoldExpr(
      arr = "slice(vals, 2, size(vals) - 1)",
      l0 = "vals[0] * 10000L",
      b0 = "CASE WHEN size(vals) >= 2 THEN (vals[1] - vals[0]) * 10000L ELSE 0L END",
      aNum, bNum)
    packed
      .select(col(keyCol), size(col("vals")).cast("long").as("n_obs"),
        expr(fold).as("st"))
      .select(Seq(col(keyCol), col("n_obs"),
        col("st.l").as("level_x1e4"), col("st.b").as("trend_x1e4")) ++
        (1 to horizon).map(h =>
          expr(s"st.l + ${h}L * st.b").as(s"fc${h}_x1e4")): _*)
  }

  /** One-sided upper CUSUM changepoint monitor (Page 1954) — the
    * sequential drift detector next to [[holtLinear]]'s forecaster:
    * S_t = max(0, S_{t−1} + y_t − μ − slack) accumulates only
    * SUSTAINED excess over the series mean; crossing h raises an alarm
    * and resets. A spike one hour tall and a 10% drift ten hours long
    * reach h equally — exactly what a threshold-per-point monitor
    * (events_rolling_anomaly's z-score) cannot see.
    *
    * Same per-series fold shape and ×1e4 fixed point as
    * [[holtLinear]]; μ = mean·1e4 (integer div), slack = μ div
    * slackDiv, h = max(hMult·μ, 1) — all derived per series in one
    * pass, nothing tuned per scale factor. The max-before-reset value
    * is tracked so a never-alarming series still reports how close it
    * came. Output per key: n_obs, mu_x1e4, n_alarms, max_s_x1e4,
    * final_s_x1e4. */
  def cusum(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String, slackDiv: Int = 8, hMult: Int = 4): DataFrame = {
    require(slackDiv >= 1, s"cusum: slackDiv=$slackDiv must be >= 1")
    require(hMult >= 1, s"cusum: hMult=$hMult must be >= 1")
    val packed = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(ordCol).as("t"), col(valCol).cast("long").as("y")))).as("srt"))
      .select(col(keyCol), expr("transform(srt, x -> x.y)").as("vals"))
      .withColumn("mu", expr(
        "aggregate(vals, 0L, (a, y) -> a + y) * 10000L div size(vals)"))
      .withColumn("slack", expr(s"mu div $slackDiv"))
      .withColumn("h", expr(s"greatest(${hMult}L * mu, 1L)"))
    packed
      .select(col(keyCol), size(col("vals")).cast("long").as("n_obs"),
        col("mu").as("mu_x1e4"),
        expr(cusumFoldExpr("0L", "0L", "0L")).as("st"))
      .select(col(keyCol), col("n_obs"), col("mu_x1e4"),
        col("st.na").as("n_alarms"), col("st.mx").as("max_s_x1e4"),
        col("st.s").as("final_s_x1e4"))
  }

  /** [[holtLinear]] plus an EMPIRICAL UNCERTAINTY BAND — a point
    * forecast without one invites over-reaction: the fold additionally
    * emits each step's absolute one-step-ahead error |y_t·S − (l+b)|
    * (what the model would have missed by), and the band is the exact
    * P90 of those errors — the value at deterministic rank
    * ceil(0.9·n), so no distributional assumption and no IEEE quantile
    * at the boundary. Output adds n_err, band_p90_x1e4 and the
    * fc1 ± band interval. Same bounded per-series fold; the error
    * array is series-length, sorted locally per key. */
  def holtLinearWithBand(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String, aNum: Int = 8, bNum: Int = 3): DataFrame = {
    require(aNum > 0 && aNum < 10 && bNum > 0 && bNum < 10,
      s"holtLinearWithBand: aNum=$aNum bNum=$bNum must be in 1..9")
    val packed = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(ordCol).as("t"), col(valCol).cast("long").as("y")))).as("srt"))
      .select(col(keyCol), expr("transform(srt, x -> x.y)").as("vals"))
    val lNext = s"(($aNum * y * 10000L + ${10 - aNum} * (acc.l + acc.b)) div 10)"
    val fold =
      s"""aggregate(
         |  slice(vals, 2, size(vals) - 1),
         |  struct(vals[0] * 10000L AS l,
         |    CASE WHEN size(vals) >= 2
         |      THEN (vals[1] - vals[0]) * 10000L ELSE 0L END AS b,
         |    CAST(array() AS array<bigint>) AS e),
         |  (acc, y) -> struct(
         |    $lNext AS l,
         |    (($bNum * ($lNext - acc.l) + ${10 - bNum} * acc.b) div 10) AS b,
         |    concat(acc.e, array(abs(y * 10000L - (acc.l + acc.b)))) AS e))
         |""".stripMargin
    packed
      .select(col(keyCol), size(col("vals")).cast("long").as("n_obs"),
        expr(fold).as("st"))
      .withColumn("n_err", size(col("st.e")).cast("long"))
      .withColumn("band_p90_x1e4", expr(
        """CASE WHEN size(st.e) = 0 THEN 0L
          |ELSE element_at(array_sort(st.e),
          |  CAST(greatest((size(st.e) * 9 + 9) div 10, 1) AS INT)) END""".stripMargin))
      .select(col(keyCol), col("n_obs"), col("n_err"),
        col("st.l").as("level_x1e4"), col("st.b").as("trend_x1e4"),
        expr("st.l + st.b").as("fc1_x1e4"), col("band_p90_x1e4"),
        expr("st.l + st.b - band_p90_x1e4").as("fc1_lo_x1e4"),
        expr("st.l + st.b + band_p90_x1e4").as("fc1_hi_x1e4"))
  }

  /** The Holt recurrence as an aggregate() fold over `arr`, from a
    * given start state — shared between the batch [[holtLinear]]
    * (seeded from the series head) and the streaming forecaster
    * (state carried across micro-batches). l' appears inside b' too —
    * SQL lambdas have no let-binding, so the expression is spelled
    * twice; codegen's subexpression elimination collapses it. */
  private[graft] def holtFoldExpr(arr: String, l0: String, b0: String,
      aNum: Int = 8, bNum: Int = 3): String = {
    val lNext = s"(($aNum * y * 10000L + ${10 - aNum} * (acc.l + acc.b)) div 10)"
    s"""aggregate(
       |  $arr,
       |  struct(CAST(($l0) AS BIGINT) AS l, CAST(($b0) AS BIGINT) AS b),
       |  (acc, y) -> struct(
       |    $lNext AS l,
       |    (($bNum * ($lNext - acc.l) + ${10 - bNum} * acc.b) div 10) AS b))
       |""".stripMargin
  }

  /** Theil–Sen robust trend (Theil 1950, Sen 1968) — the estimator to
    * reach for when [[holtLinear]]'s level/trend or OLS (agg_linreg)
    * get dragged by outliers: the slope is the MEDIAN of all pairwise
    * slopes, with a ~29% breakdown point (a third of the hours can be
    * garbage before the trend moves).
    *
    * Pairwise means O(grid²) per key — but the grid is TIME-bounded
    * (hours in the window), not row-count-bounded, so the pair relation
    * is a fixed-size equi-self-join per key at any corpus size; the
    * corpus-scale work is the per-hour aggregate the caller already
    * did. Slopes are exact-rational-to-double divisions (two longs
    * < 2⁵³ divide to the identical IEEE double in both engines), and
    * the median is the value at deterministic rank (n+1) div 2 under a
    * fully-keyed order — no tie luck, the oracle selects the same
    * VALUE. Keys with fewer than two points have no pairs and drop.
    * Output (key, n_pairs, slope_x1e6, median_y). */
  def theilSen(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = series.select(col(keyCol).as("k"), col(ordCol).cast("long").as("t"),
      col(valCol).cast("long").as("y"))
    val pairs = d.as("a")
      .join(d.as("b"), col("a.k") === col("b.k") && col("b.t") > col("a.t"))
      .select(col("a.k").as("k"),
        ((col("b.y") - col("a.y")).cast("double") /
          (col("b.t") - col("a.t")).cast("double")).as("slope"),
        col("a.t").as("h1"), col("b.t").as("h2"))
    // Pair/point counts derive from the series SIZE (m points ⇒
    // m(m−1)/2 pairs) — a broadcast of the tiny per-key size table,
    // not a second whole-partition window pass over the pair relation.
    val sizes = broadcast(d.groupBy("k").agg(count(lit(1)).as("m"))
      .select(col("k"), expr("m * (m - 1L) div 2").as("n_pairs"), col("m")))
    val wp = Window.partitionBy("k").orderBy("slope", "h1", "h2")
    val med = pairs
      .withColumn("rn", row_number().over(wp))
      .join(sizes, Seq("k"))
      .filter(col("rn") === expr("(n_pairs + 1L) div 2"))
      .select(col("k"), col("n_pairs"),
        floor(col("slope") * 1000000d + 0.5d).cast("long").as("slope_x1e6"))
    val wn = Window.partitionBy("k").orderBy("y", "t")
    val mn = d
      .withColumn("rn", row_number().over(wn))
      .join(sizes, Seq("k"))
      .filter(col("rn") === expr("(m + 1L) div 2"))
      .select(col("k"), col("y").as("median_y"))
    med.join(mn, Seq("k"))
  }

  /** The CUSUM recurrence as an aggregate() fold over a `vals` array
    * column, parameterized on per-row `mu`/`slack`/`h` columns and a
    * carried-in start state — shared between the batch [[cusum]]
    * (zero start) and the streaming monitor (state carried across
    * micro-batches). The pre-reset value appears in all three state
    * fields — spelled out each time (no let-binding in SQL lambdas),
    * collapsed by CSE. */
  private[graft] def cusumFoldExpr(s0: String, na0: String,
      mx0: String): String = {
    val sPre = "greatest(0L, acc.s + y * 10000L - mu - slack)"
    s"""aggregate(vals,
       |  struct($s0 AS s, $na0 AS na, $mx0 AS mx),
       |  (acc, y) -> struct(
       |    CASE WHEN $sPre >= h THEN 0L ELSE $sPre END AS s,
       |    acc.na + (CASE WHEN $sPre >= h THEN 1L ELSE 0L END) AS na,
       |    greatest(acc.mx, $sPre) AS mx))
       |""".stripMargin
  }
}
