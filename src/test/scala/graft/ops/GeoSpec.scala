package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)], maxM: Double): Set[(Long, Long, Long)] = {
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val dlat = math.toRadians(b._2 - a._2) / 2
      val dlon = math.toRadians(b._3 - a._3) / 2
      val t = math.sin(dlat) * math.sin(dlat) +
        math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) *
          math.sin(dlon) * math.sin(dlon)
      2 * 6371000 * math.asin(math.sqrt(t))
    }
    (for {
      a <- pts; b <- pts if a._1 < b._1
      d = math.floor(hav(a, b) + 0.5).toLong if d < maxM
    } yield (a._1, b._1, d)).toSet
  }

  private def run(pts: Seq[(Long, Double, Double)], maxM: Double, cellDeg: Double)
      : Set[(Long, Long, Long)] =
    Geo.radiusJoinPairs(pts.toDF("k", "lat", "lon"), maxM, cellDeg)
      .as[(Long, Long, Long)].collect().toSet

  test("radius join finds boundary-straddling pairs the single-cell join would miss") {
    // two points 0.02° apart straddling the 1.5° cell boundary at lat 0
    val pts = Seq((1L, 0.0, 1.49), (2L, 0.0, 1.51), (3L, 0.0, 30.0))
    val got = run(pts, maxM = 10000, cellDeg = 1.5)
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("diagonal neighbors are probed") {
    val pts = Seq((1L, 1.49, 1.49), (2L, 1.51, 1.51))
    assert(run(pts, 10000, 1.5).size == 1)
  }

  // lat capped at 50°: the 1.5° cell must span ≥ 100 km of longitude at
  // the worst latitude (1.5 · 111.19 · cos(50.3°) ≈ 106 km ≥ 100)
  test("property: grid radius join equals brute force for |lat| <= 50, 100 km, 1.5 deg cells") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ptGen = Gen.listOfN(25, Gen.zip(Gen.choose(-50.0, 50.0), Gen.choose(-180.0, 179.0)))
    val prop = Prop.forAll(ptGen) { raw =>
      // cluster points so some pairs actually fall within range
      val pts = raw.zipWithIndex.flatMap { case ((la, lo), i) =>
        Seq((i * 2L, la, lo), (i * 2L + 1, la + 0.3, lo + 0.4))
      }
      run(pts, 100000, 1.5) == brute(pts, 100000)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(r.passed, r.status.toString)
  }
}
