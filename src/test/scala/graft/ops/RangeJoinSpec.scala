package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Ground truth: the naive cross join + filter. */
  private def naive(points: Seq[Double], intervals: Seq[(Int, Double, Double)]) =
    (for {
      p <- points
      (id, lo, hi) <- intervals
      if p >= lo && p < hi
    } yield (p, id)).sorted

  private def binned(points: Seq[Double], intervals: Seq[(Int, Double, Double)],
      w: Double) = {
    val pts = points.toDF("p")
    val ivs = intervals.toDF("iid", "lo", "hi")
    RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", w)
      .select("p", "iid").as[(Double, Int)].collect().toSeq.sorted
  }

  test("binned join ≡ cross+filter on overlapping, nested, negative intervals") {
    val intervals = Seq(
      (1, -10.0, 5.0), (2, 0.0, 0.0),   // empty interval matches nothing
      (3, 2.0, 2.5), (4, -100.0, 100.0), // nested inside 4
      (5, 7.0, 7.0 + 1e-9),              // sliver
      (6, 50.0, 60.0))
    val points = Seq(-50.0, -10.0, -0.1, 0.0, 2.0, 2.49, 2.5, 5.0, 7.0, 55.0, 99.999, 100.0)
    for (w <- Seq(0.5, 3.0, 1000.0))
      assert(binned(points, intervals, w) === naive(points, intervals),
        s"binWidth=$w")
  }

  test("boundary semantics: lo inclusive, hi exclusive, exactly on bin edges") {
    val intervals = Seq((1, 10.0, 20.0))
    val points = Seq(9.999, 10.0, 19.999, 20.0)
    // bin width dividing the bounds exactly puts lo/hi ON bin edges
    assert(binned(points, intervals, 10.0) === naive(points, intervals))
    assert(binned(points, intervals, 5.0) === naive(points, intervals))
  }

  test("FP knife-edge: hi/w exactly integral — point just below hi still matches") {
    // 17 * 0.1 rounds UP in FP (1.7000000000000002) so hi/w is exactly
    // 17.0, and the point 1.7's own division 1.7/0.1 ALSO rounds to
    // exactly 17.0: the point lands in bin 17 while a ceil(hi/w)-1
    // replication bound stops at bin 16 — the equi-join would drop a
    // row the exact post-filter keeps. floor(hi/w) must be replicated.
    val hi = 17 * 0.1
    assert(hi / 0.1 == 17.0 && 1.7 / 0.1 == 17.0 && 1.7 < hi,
      "fixture drifted: the FP knife-edge premise no longer holds")
    val intervals = Seq((1, 1.0, hi))
    val points = Seq(1.7)
    assert(naive(points, intervals).nonEmpty)
    assert(binned(points, intervals, 0.1) === naive(points, intervals))
  }

  test("interval side with zero rows / empty result") {
    val pts = Seq(1.0, 2.0).toDF("p")
    val ivs = Seq.empty[(Int, Double, Double)].toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 1.0).count() === 0)
  }

  test("colliding column names are rejected") {
    val pts = Seq(1.0).toDF("p")
    val ivs = Seq((1.0, 0.0, 2.0)).toDF("p", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 1.0)
    }
  }
}
