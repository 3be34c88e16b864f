package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // key 1: observations in buckets 0 and 7200 (gap at 3600);
  // bucket 0 has two rows — the later one (sec=500, id=11) must win.
  // key 2: single observation — one-bucket grid, no fill.
  private def feed = Seq(
    (10L, ts(100L), 1L, 2.5),
    (11L, ts(500L), 1L, 7.25),
    (12L, ts(7300L), 1L, 9.0),
    (20L, ts(4000L), 2L, 3.0))
    .toDF("event_id", "ts", "user_id", "value")

  test("resampleLocf: grid spans min..max bucket, gaps fill carried-forward, latest-in-bucket wins") {
    val out = Resample.resampleLocf(feed, "user_id", "ts", "value", "event_id", 3600L)
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_events"), r.getAs[Int]("filled"), r.getAs[Long]("v_locf_x1e4")))
    assert(out.toSeq == Seq(
      (1L, 0L, 2L, 0, 72500L),    // two obs; sec=500 wins over sec=100
      (1L, 3600L, 0L, 1, 72500L), // gap: filled, value carried forward
      (1L, 7200L, 1L, 0, 90000L),
      (2L, 3600L, 1L, 0, 30000L)))
  }

  test("resampleLerp: gap takes weighted mean of neighbors; edges nearest-fill") {
    // key 1 gap at 3600 sits midway between 72500 (b=0) and 90000
    // (b=7200): (72500*3600 + 90000*3600) div 7200 = 81250
    val out = Resample.resampleLerp(feed, "user_id", "ts", "value", "event_id", 3600L)
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_events"), r.getAs[Int]("filled"), r.getAs[Long]("v_lerp_x1e4")))
    assert(out.toSeq == Seq(
      (1L, 0L, 2L, 0, 72500L),
      (1L, 3600L, 0L, 1, 81250L),
      (1L, 7200L, 1L, 0, 90000L),
      (2L, 3600L, 1L, 0, 30000L)))
  }

  test("resampleLerp: asymmetric gap interpolates by distance, flooring") {
    // obs at b=0 (v=10000) and b=10800 (v=10001): b=3600 →
    // (10000*7200 + 10001*3600) div 10800 = 10000 (floor of 10000.33)
    val f = Seq((1L, ts(10L), 9L, 1.0), (2L, ts(10801L), 9L, 1.0001))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Resample.resampleLerp(f, "user_id", "ts", "value", "event_id", 3600L)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("v_lerp_x1e4")))
    assert(got.toSeq == Seq((0L, 10000L), (3600L, 10000L), (7200L, 10000L), (10800L, 10001L)))
  }

  test("rollingRange: trailing window includes same-second peers, excludes older than windowSec-1") {
    // user 1: secs 100, 500, 7300 — at 500 the 100-row is inside the
    // 3600 s frame; at 7300 neither earlier row is.
    val out = Resample.rollingRange(feed, "user_id", "ts", "value", "event_id", 3600L)
      .orderBy("user_id", "sec").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("n_win"), r.getAs[Long]("sum_v_x1e4")))
    assert(out.toSeq == Seq(
      (10L, 1L, 25000L),
      (11L, 2L, 97500L),
      (12L, 1L, 90000L),
      (20L, 1L, 30000L)))
  }

  test("rollingRange: simultaneous events aggregate symmetrically (RANGE frame peers)") {
    val peers = Seq((1L, ts(50L), 9L, 1.0), (2L, ts(50L), 9L, 2.0))
      .toDF("event_id", "ts", "user_id", "value")
    val out = Resample.rollingRange(peers, "user_id", "ts", "value", "event_id", 60L)
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("n_win"), r.getAs[Long]("sum_v_x1e4")))
    // both rows see both peers — a ROWS frame would have made the
    // result depend on an undefined tie order
    assert(out.toSeq == Seq((2L, 30000L), (2L, 30000L)))
  }

  test("rollingAnomaly: a spike among enough stable peers flags; peers never do") {
    // 9 stable values + one 100.0 spike, all inside one 2 h window.
    // Cleared-form check at the spike (v2=10000, n=10, s=10900,
    // q=100090000): lhs=89100² ≈ 7.9e9 > rhs=4·(n·q−s²) ≈ 3.5e9 → flag.
    // NOTE the spike inflates its own window variance: z² can never
    // exceed n−1, so a lone spike needs n ≥ k²+2 peers to flag at all.
    val rows = (0 until 9).map(i => (i.toLong, ts(i * 60L), 1L, 1.0)) :+
      (99L, ts(540L), 1L, 100.0)
    val df = rows.toDF("event_id", "ts", "user_id", "value")
    val out = Resample.rollingAnomaly(df, "user_id", "ts", "value",
        "event_id", windowSec = 7200L, k = 2L, minN = 3L)
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("is_anomaly")))
    assert(out.last == ((99L, 1)), s"spike not flagged: ${out.toSeq}")
    assert(out.init.forall(_._2 == 0), s"stable rows flagged: ${out.toSeq}")
  }

  test("madGroups: hand-computed median absolute deviation; robust to one wild outlier") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 1000000.0))
      .toDF("g", "x")
    // median = 3.0; |x-3| = {2,1,0,1,999997} → MAD = 1.0 — the wild
    // outlier moves the MAD not at all (stddev would explode)
    val out = Stats.madGroups(df, "g", "x").collect()
    assert(out(0).getAs[Long]("med_x1e4") == 30000L)
    assert(out(0).getAs[Long]("mad_x1e4") == 10000L)
  }

  test("chi2Independence: hand-computed 2x2 table; per-cell floor convention") {
    // o = [[10,20],[20,10]], N=60, marginals all 30, e=15 per cell.
    // Per cell: floor((600-900)^2 * 1e4 / (900*60)) = floor(16666.67)
    // = 16666; x4 cells = 66664 (vs the unfloored 66666.67).
    val rows = Seq.fill(10)(("x", 0)) ++ Seq.fill(20)(("x", 1)) ++
      Seq.fill(20)(("y", 0)) ++ Seq.fill(10)(("y", 1))
    val out = Stats.chi2Independence(rows.toDF("a", "b"), "a", "b").head()
    assert(out.getAs[Long]("n") == 60L)
    assert(out.getAs[Long]("dof") == 1L)
    assert(out.getAs[Long]("chi2_x1e4") == 66664L)
  }

  test("corrGroups: perfect correlation hits 1e6 exactly; zero variance yields null") {
    val df = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),     // y = 2x → r = 1
      ("b", 1.0, 5.0), ("b", 2.0, 3.0), ("b", 3.0, 10.0),    // generic
      ("c", 4.0, 1.0), ("c", 4.0, 2.0))                      // x constant → null
      .toDF("g", "x", "y")
    val out = Stats.corrGroups(df, "g", "x", "y").orderBy("g").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[java.lang.Long]("corr_x1e6")))
    assert(out(0) == (("a", java.lang.Long.valueOf(1000000L))))
    // group b moments: num=15, vx=6, vy=78 — same fixed tree as the engine
    val expB = math.floor(15.0 / math.sqrt(6.0 * 78.0) * 1e6 + 0.5).toLong
    assert(out(1) == (("b", java.lang.Long.valueOf(expB))))
    assert(out(2)._2 == null)
  }

  test("outlierScores: zero-variance group emits null z and flag 0; cleared form matches hand calc") {
    val df = Seq(
      ("a", 10.0), ("a", 20.0), ("a", 30.0),
      ("b", 5.0), ("b", 5.0))
      .toDF("g", "x")
    val out = Stats.outlierScores(df, "g", "x", thresholdX1e4 = 10000L)
      .orderBy("g", "x").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[java.lang.Long]("z_x1e4"), r.getAs[Int]("is_outlier")))
    // group a: cleared form z(10) = (3*10-60)/sqrt(3*1400-60^2)
    //   = -30/sqrt(600) = -1.2247448…; scale4: floor(∓12247.448+0.5)
    assert(out(0) == (("a", java.lang.Long.valueOf(-12247L), 1)))
    assert(out(1) == (("a", java.lang.Long.valueOf(0L), 0)))
    assert(out(2) == (("a", java.lang.Long.valueOf(12247L), 1)))
    assert(out(3)._2 == null && out(3)._3 == 0)
    assert(out(4)._2 == null && out(4)._3 == 0)
  }
}
