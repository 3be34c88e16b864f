package graft.ops

import graft.SparkSpec

class ForecastSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[Long]): (Long, Long, Long, Long) = {
    val df = vals.zipWithIndex.map { case (y, t) => ("k", t.toLong, y) }
      .toDF("key", "t", "y")
    val r = Forecast.holtLinear(df, "key", "t", "y").collect()(0)
    (r.getAs[Long]("n_obs"), r.getAs[Long]("level_x1e4"),
      r.getAs[Long]("trend_x1e4"), r.getAs[Long]("fc1_x1e4"))
  }

  test("holtLinear: hand-traced fold, seed and two updates") {
    // Hyndman seed: l=10000, b=(3-1)*1e4=20000; y1 then re-enters as
    // the first update (the standard formulation).
    // y=3: l' = (8*3e4 + 2*(1e4+2e4)) div 10 = 30000
    //      b' = (3*(30000-10000) + 7*20000) div 10 = 20000
    // y=2: l' = (8*2e4 + 2*(3e4+2e4)) div 10 = 26000
    //      b' = (3*(26000-30000) + 7*20000) div 10 = 12800
    assert(run(Seq(1L, 3L, 2L)) == (3L, 26000L, 12800L, 38800L))
  }

  test("holtLinear: one-point series has zero trend; flat series stays put") {
    assert(run(Seq(5L)) == (1L, 50000L, 0L, 50000L))
    val (_, l, b, f1) = run(Seq(4L, 4L, 4L, 4L))
    assert(l == 40000L && b == 0L && f1 == 40000L)
  }

  test("holtLinear: negative trend survives the integer fold") {
    // seed: l=50000, b=-40000; update on y=1:
    // l' = (8*1e4 + 2*(50000-40000)) div 10 = 10000
    // b' = (3*(10000-50000) + 7*(-40000)) div 10 = -40000
    assert(run(Seq(5L, 1L)) == (2L, 10000L, -40000L, -30000L))
  }

  test("cusum: hand-traced drift — sustained excess alarms, spikes decay") {
    // Series 1,1,1,1,20,20,20,20: mu = 84e4/8 = 105000, slack = 13125,
    // h = 1*mu. Lows contribute 0; each 20 adds 81875; two consecutive
    // highs cross h -> alarm+reset, twice.
    val df = Seq(1L, 1L, 1L, 1L, 20L, 20L, 20L, 20L).zipWithIndex
      .map { case (y, t) => ("k", t.toLong, y) }.toDF("key", "t", "y")
    val r = Forecast.cusum(df, "key", "t", "y", slackDiv = 8, hMult = 1)
      .collect()(0)
    assert(r.getAs[Long]("mu_x1e4") == 105000L)
    assert(r.getAs[Long]("n_alarms") == 2L)
    assert(r.getAs[Long]("max_s_x1e4") == 163750L)
    assert(r.getAs[Long]("final_s_x1e4") == 0L)
  }

  test("cusum: in-control series never alarms but reports its max excursion") {
    // 0,10,0,0: mu = 25000, slack = 3125, h = 4*mu = 100000.
    val df = Seq(0L, 10L, 0L, 0L).zipWithIndex
      .map { case (y, t) => ("k", t.toLong, y) }.toDF("key", "t", "y")
    val r = Forecast.cusum(df, "key", "t", "y").collect()(0)
    assert(r.getAs[Long]("n_alarms") == 0L)
    assert(r.getAs[Long]("max_s_x1e4") == 71875L) // 10e4 - 28125
    assert(r.getAs[Long]("final_s_x1e4") == 15625L) // decayed twice
  }

  test("holtLinearWithBand: one-step errors and the exact rank-P90 band") {
    // series 1,3,2: errors |3e4-3e4|=0 and |2e4-5e4|=3e4; rank
    // ceil(0.9*2)=2 -> band 30000; fc1 = 38800 (same fold as the trace).
    val df = Seq(1L, 3L, 2L).zipWithIndex
      .map { case (y, t) => ("k", t.toLong, y) }.toDF("key", "t", "y")
    val r = Forecast.holtLinearWithBand(df, "key", "t", "y").collect()(0)
    assert(r.getAs[Long]("n_err") == 2L)
    assert(r.getAs[Long]("band_p90_x1e4") == 30000L)
    assert(r.getAs[Long]("fc1_x1e4") == 38800L)
    assert(r.getAs[Long]("fc1_lo_x1e4") == 8800L)
    assert(r.getAs[Long]("fc1_hi_x1e4") == 68800L)
    // one-point series: no errors, zero band, interval collapses
    val one = Seq(("k", 0L, 5L)).toDF("key", "t", "y")
    val r1 = Forecast.holtLinearWithBand(one, "key", "t", "y").collect()(0)
    assert(r1.getAs[Long]("n_err") == 0L && r1.getAs[Long]("band_p90_x1e4") == 0L)
  }

  test("theilSen: median slope shrugs off the outlier OLS would chase") {
    // y = t on t=0..3, then an outlier 100 at t=4. Six of ten pairwise
    // slopes are exactly 1; the median (rank (10+1) div 2 = 5) is 1.
    val df = Seq(0L, 1L, 2L, 3L, 100L).zipWithIndex
      .map { case (y, t) => ("k", t.toLong, y) }.toDF("key", "t", "y")
    val r = Forecast.theilSen(df, "key", "t", "y").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Long]("slope_x1e6") == 1000000L)
    assert(r.getAs[Long]("median_y") == 2L)
  }

  test("theilSen: single-point keys drop; negative slopes round half-up via floor") {
    val df = (Seq(("lone", 0L, 5L)) ++
      Seq(10L, 7L, 4L).zipWithIndex.map { case (y, t) => ("down", t.toLong, y) })
      .toDF("key", "t", "y")
    val out = Forecast.theilSen(df, "key", "t", "y").collect()
    assert(out.length == 1 && out(0).getString(0) == "down")
    assert(out(0).getAs[Long]("slope_x1e6") == -3000000L)
  }

  test("holtLinear: horizon widens linearly; input order does not matter") {
    val df = Seq(("k", 2L, 2L), ("k", 0L, 1L), ("k", 1L, 3L))
      .toDF("key", "t", "y") // shuffled row order, same series as trace 1
    val r = Forecast.holtLinear(df, "key", "t", "y", horizon = 5).collect()(0)
    assert(r.getAs[Long]("fc1_x1e4") == 38800L)
    assert(r.getAs[Long]("fc5_x1e4") == 26000L + 5 * 12800L)
  }
}
