package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives: haversine distance and the grid-cell
  * radius join — the scale-safe spatial join.
  *
  * The naive "all pairs within R" is a cross join; the grid approach
  * buckets points into cells of side ≥ R (in degrees, at the worst
  * latitude the data allows), replicates ONE side into its 3×3
  * neighborhood, and equi-joins on the cell id. Each pair within R is
  * guaranteed to co-locate in at least one probed cell, so the
  * exact haversine filter afterwards loses nothing; candidate volume
  * is Σ |cell|·|neighborhood| instead of n² — the same banded-join
  * shape as the LSH dedup path, so it scales the same way.
  *
  * Everything is Column composition over codegen'd built-ins
  * (sin/cos/asin/radians) — no UDF, no custom expression needed.
  */
object Geo {

  /** Haversine great-circle distance in meters (doubles; callers
    * wanting an oracle-stable image floor to integer meters). */
  def haversineMeters(latA: Column, lonA: Column, latB: Column, lonB: Column): Column = {
    // expression shape mirrored verbatim by the SQL oracle — keep the
    // operand order stable or IEEE evaluation diverges in the last ulp
    val term = pow(sin(radians(latB - latA) / 2), 2) +
      cos(radians(latA)) * cos(radians(latB)) *
        pow(sin(radians(lonB - lonA) / 2), 2)
    lit(2) * lit(6371000) * asin(sqrt(term))
  }

  /** Integer cell id for a (lat, lon) point on a `cellDeg`-degree grid.
    * One long key: row-major over a 360/cellDeg-wide grid (lon span
    * padded to 360° so neighbors stay adjacent ids). */
  def cellId(lat: Column, lon: Column, cellDeg: Double): Column = {
    val w = math.ceil(360.0 / cellDeg).toLong + 2
    (floor((lat + 90) / cellDeg) * w + floor((lon + 180) / cellDeg)).cast("long")
  }

  /** All pairs of `pts` (cols: k, lat, lon) within `maxMeters`,
    * emitted as (a_key, b_key, dist_m) with a_key < b_key.
    *
    * `cellDeg` must make one cell side ≥ maxMeters at the data's worst
    * latitude: cellDeg ≥ maxMeters / (111_195 · cos(maxAbsLat)) — the
    * caller asserts that bound because only it knows the data's
    * latitude range. Build side replicates ×9 (3×3 neighborhood);
    * probe side buckets once.
    */
  def radiusJoinPairs(pts: DataFrame, maxMeters: Double, cellDeg: Double): DataFrame = {
    val cell = cellId(col("lat"), col("lon"), cellDeg)
    val probe = pts.select(col("k").as("a_key"), col("lat").as("a_lat"),
      col("lon").as("a_lon"), cell.as("cell"))
    val w = math.ceil(360.0 / cellDeg).toLong + 2
    val offsets = for (dy <- -1 to 1; dx <- -1 to 1) yield dy * w + dx
    val build = pts.select(col("k").as("b_key"), col("lat").as("b_lat"),
        col("lon").as("b_lon"), cell.as("c0"))
      .withColumn("cell", explode(array(offsets.map(o => col("c0") + lit(o)): _*)))
    probe.join(build, "cell")
      .filter(col("a_key") < col("b_key"))
      .select(col("a_key"), col("b_key"),
        floor(haversineMeters(col("a_lat"), col("a_lon"), col("b_lat"), col("b_lon"))
          + 0.5).cast("long").as("dist_m"))
      .filter(col("dist_m") < maxMeters)
    // no dedup needed: for an unordered pair exactly one orientation
    // passes a_key < b_key, and within it the build point's 9 distinct
    // neighbor cells contain the probe's cell at most once.
    // Known limit: cells do not wrap at the antimeridian — pairs
    // straddling lon ±180° are not candidates (fine for continental
    // data; wrap-sensitive callers normalize longitudes first).
  }

  /** Containment test against a CONVEX polygon with integer-scaled
    * vertices (e.g. centidegrees): a point is inside iff it lies on
    * the non-negative side of every edge of the counter-clockwise
    * ring. Cross products stay in Long arithmetic — bit-exact on any
    * engine, no ray-casting epsilon cases. Boundary points count as
    * inside (cross = 0).
    *
    * The polygon is a tiny constant, so the predicate folds into the
    * scan as a conjunction of codegen'd comparisons — a geofence over
    * 100 TB of points is a full-scan filter with NO join, and any
    * min/max file index on x/y prunes via the polygon's bbox, which
    * the caller can prepend (`bboxFilter`).
    */
  def insideConvex(x: Column, y: Column, ringCcw: Seq[(Long, Long)]): Column = {
    require(ringCcw.size >= 3, s"insideConvex: need ≥3 vertices, got ${ringCcw.size}")
    val edges = ringCcw.zip(ringCcw.tail :+ ringCcw.head)
    edges.map { case ((x1, y1), (x2, y2)) =>
      (lit(x2 - x1) * (y - lit(y1)) - lit(y2 - y1) * (x - lit(x1))) >= 0
    }.reduce(_ && _)
  }

  /** Bounding-box prefilter for a polygon ring — semantically redundant
    * before [[insideConvex]] but it is the part a min/max manifest or
    * parquet row-group stats can actually prune on. */
  def bboxFilter(x: Column, y: Column, ring: Seq[(Long, Long)]): Column =
    x >= ring.map(_._1).min && x <= ring.map(_._1).max &&
      y >= ring.map(_._2).min && y <= ring.map(_._2).max
}
