package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoFenceSpec extends SparkSpec {
  import spark.implicits._

  // CCW unit-ish square, integer coords
  private val square = Seq((10L, -10L), (10L, 10L), (-10L, 10L), (-10L, -10L))

  private def inside(pts: Seq[(Long, Long)], ring: Seq[(Long, Long)]) =
    pts.toDF("x", "y")
      .filter(Geo.insideConvex(col("x"), col("y"), ring))
      .as[(Long, Long)].collect().toSet

  test("interior in, exterior out, boundary counts as inside") {
    val got = inside(Seq((0L, 0L), (10L, 0L), (10L, 10L), (11L, 0L), (0L, -11L)), square)
    assert(got == Set((0L, 0L), (10L, 0L), (10L, 10L)))
  }

  test("hexagon: centroid in, far point out, vertex on boundary in") {
    val hex = Seq((1500L, 0L), (750L, 1300L), (-750L, 1300L),
      (-1500L, 0L), (-750L, -1300L), (750L, -1300L))
    val got = inside(Seq((0L, 0L), (1500L, 0L), (1400L, 1300L), (0L, 1300L)), hex)
    assert(got == Set((0L, 0L), (1500L, 0L), (0L, 1300L)))
  }

  test("bbox filter is a superset of containment") {
    val pts = (-15L to 15L).flatMap(x => (-15L to 15L).map(y => (x, y)))
    val df = pts.toDF("x", "y")
    val boxed = df.filter(Geo.bboxFilter(col("x"), col("y"), square))
      .as[(Long, Long)].collect().toSet
    val in = inside(pts, square)
    assert(in.subsetOf(boxed))
    assert(boxed == pts.filter { case (x, y) =>
      x >= -10 && x <= 10 && y >= -10 && y <= 10 }.toSet)
  }

  test("degenerate ring is rejected") {
    intercept[IllegalArgumentException](
      inside(Seq((0L, 0L)), Seq((0L, 0L), (1L, 1L))))
  }
}
