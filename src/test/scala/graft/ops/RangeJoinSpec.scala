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

  test("extra equi-keys: a point only matches intervals of its own entity") {
    val pts = Seq((1L, 10.0, 100), (2L, 10.0, 200)).toDF("k", "p", "pid")
    val ivs = Seq((1L, 0.0, 20.0, 7), (2L, 15.0, 30.0, 8)).toDF("k", "lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 5.0,
        extraKeys = Seq("k"))
      .select("k", "pid", "iid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // k=1's point 10 is inside k=1's [0,20) but NOT k=2's [15,30);
    // k=2's point 10 matches nothing even though k=1's interval covers it
    assert(out == Set((1L, 100, 7)), out.toString)
    // missing key fails loud
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs.drop("k"), "p", "lo", "hi", 5.0,
        extraKeys = Seq("k"))
    }
  }

  test("property: binned join equals the cross-join definition on random data, any bin width") {
    // The binned construction vs the O(n·m) definition `lo <= p < hi`,
    // across bin widths smaller/comparable/larger than the intervals
    // (replication factor 1..many) and degenerate hi <= lo intervals.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vG = Gen.chooseNum(-40, 40).map(_ / 4.0) // quarter-step grid incl. negatives
    val ptsG = Gen.listOfN(20, vG)
    val ivsG = Gen.listOfN(12, Gen.zip(vG, vG)) // unordered endpoints: ~half degenerate
    val widthG = Gen.oneOf(0.25, 1.0, 3.0, 10.0)
    val prop = Prop.forAll(ptsG, ivsG, widthG) { (ps, ivs0, w) =>
      val ivs = ivs0.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      val pDf = ps.zipWithIndex.map { case (p, i) => (i, p) }.toDF("pid", "p")
      val iDf = ivs.toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(pDf, iDf, "p", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val want = (for {
        (pid, p) <- ps.zipWithIndex.map { case (p, i) => (i, p) }
        (iid, lo, hi) <- ivs if lo <= p && p < hi
      } yield (pid, iid)).toSet
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  // ---- intervalOverlap ----

  /** Ground truth for overlap: cross join + non-empty-intersection test.
    * `max(lo) < min(hi)` — unlike the bare `alo < bhi && blo < ahi`
    * predicate, this correctly excludes empty intervals (`hi <= lo`),
    * whose half-open intersection with anything is empty. */
  private def naiveOverlap(as: Seq[(Int, Double, Double)],
      bs: Seq[(Int, Double, Double)]) =
    (for {
      (aid, alo, ahi) <- as
      (bid, blo, bhi) <- bs
      if math.max(alo, blo) < math.min(ahi, bhi)
    } yield (aid, bid)).sorted

  private def binnedOverlap(as: Seq[(Int, Double, Double)],
      bs: Seq[(Int, Double, Double)], w: Double) = {
    val aDf = as.toDF("aid", "a_lo", "a_hi")
    val bDf = bs.toDF("bid", "b_lo", "b_hi")
    RangeJoin.intervalOverlap(aDf, bDf, "a_lo", "a_hi", "b_lo", "b_hi", w)
      .select("aid", "bid").as[(Int, Int)].collect().toSeq.sorted
  }

  test("overlap join ≡ cross+filter, each pair exactly once (no bin dup)") {
    // Long intervals sharing MANY bins are the dedup trap: without the
    // overlap-start-bin predicate every shared bin re-emits the pair.
    val as = Seq((1, -10.0, 50.0), (2, 0.0, 0.0), (3, 2.0, 2.5), (4, 49.9, 60.0))
    val bs = Seq((10, -100.0, 100.0), (11, 2.4, 2.6), (12, 55.0, 55.0 + 1e-9),
      (13, 5.0, 5.0))
    for (w <- Seq(0.5, 3.0, 1000.0)) {
      val got = binnedOverlap(as, bs, w)
      assert(got === naiveOverlap(as, bs), s"binWidth=$w")
      assert(got.distinct === got, s"duplicate pairs at binWidth=$w")
    }
  }

  test("overlap boundary: touching intervals (a.hi == b.lo) do NOT overlap") {
    val as = Seq((1, 0.0, 10.0))
    val bs = Seq((2, 10.0, 20.0), (3, 9.999, 10.0))
    assert(binnedOverlap(as, bs, 10.0) === Seq((1, 3)))
    assert(binnedOverlap(as, bs, 7.0) === Seq((1, 3)))
  }

  test("overlap extra keys: pairs stay entity-local") {
    val as = Seq((1L, 100, 0.0, 10.0), (2L, 101, 0.0, 10.0)).toDF("k", "aid", "a_lo", "a_hi")
    val bs = Seq((1L, 200, 5.0, 15.0), (2L, 201, 50.0, 60.0)).toDF("k", "bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(as, bs, "a_lo", "a_hi", "b_lo", "b_hi",
        5.0, extraKeys = Seq("k"))
      .select("aid", "bid").as[(Int, Int)].collect().toSet
    assert(got === Set((100, 200))) // 101×200 blocked by key, 101×201 no overlap
  }

  test("property: overlap join equals the cross-join definition on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vG = Gen.chooseNum(-40, 40).map(_ / 4.0)
    val side = Gen.listOfN(12, Gen.zip(vG, vG)) // unordered: ~half degenerate
    val widthG = Gen.oneOf(0.25, 1.0, 3.0, 10.0)
    val prop = Prop.forAll(side, side, widthG) { (as0, bs0, w) =>
      val as = as0.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      val bs = bs0.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      val got = binnedOverlap(as, bs, w)
      got == naiveOverlap(as, bs) && got.distinct == got
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }
}
