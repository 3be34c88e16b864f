package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference triangle-per-vertex counter: enumerate all id-ordered
    * vertex triples whose three edges exist. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val vs = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tris = for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      if es((vs(i), vs(j))) && es((vs(i), vs(k))) && es((vs(j), vs(k)))
    } yield (vs(i), vs(j), vs(k))
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = Graph.canonicalEdges(edges.toDF("a", "b"))
    Graph.triangleCounts(df).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("n_triangles")).toMap
  }

  test("triangleCounts: K4 gives 3 triangles per vertex") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(run(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: path graph has none; duplicate/reversed/self edges canonicalize") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // triangle given twice, once reversed, plus a self loop — still one triangle
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (2L, 2L))
    assert(run(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: star plus one closing edge — hub participates once per closed wedge") {
    // hub 1 to leaves 2..5; close only (2,3)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L))
    assert(run(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("projectByMember: items sharing a member become edges, no self loops") {
    val df = Seq((10L, 1L), (20L, 1L), (30L, 1L), (10L, 2L), (20L, 2L), (40L, 3L))
      .toDF("item", "m")
    val got = Graph.projectByMember(df, "item", "m").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("property: degree-ordered counts equal brute force on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)))
    val prop = Prop.forAll(edgeGen) { raw =>
      val edges = raw.filter { case (a, b) => a != b }
      edges.isEmpty || run(edges) == bruteTriangles(edges)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("bfsLevels: true hop distances, multi-seed min-fold, depth cap, cycles safe") {
    import spark.implicits._
    // path 1-2-3-4-5-6 from seed 1: node 5 is 4 hops away — beyond depth 3
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val got = Graph.bfsLevels(path, Seq(1L).toDF("v"), depth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // triangle with two seeds: the shared neighbor settles at 1, seeds at 0
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val got2 = Graph.bfsLevels(tri, Seq(2L, 3L).toDF("v"), depth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(2L -> 0L, 3L -> 0L, 1L -> 1L))
    // a seed with no edges keeps level 0
    val got3 = Graph.bfsLevels(tri, Seq(9L).toDF("v"), depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3 == Map(9L -> 0L))
  }
}
