package graft.ops

import graft.SparkSpec

/** Gates for Fuzzy.sortedNeighborhood — the Hernández–Stolfo blocking
  * generator: exact agreement with an in-memory windowed-sort
  * reference, the (w−1)·n candidate bound, and the multi-pass
  * boundary-recovery property. */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def engine(recs: Seq[(Long, String)], w: Int, blockLen: Int) =
    Fuzzy.sortedNeighborhood(recs.toDF("k", "v"), "k", "v", w, blockLen)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(1),
        r.getString(3))).toSet

  private def reference(recs: Seq[(Long, String)], w: Int,
      blockLen: Int): Set[(Long, String, Long, String)] =
    recs.groupBy(_._2.take(blockLen)).values.flatMap { blk =>
      val sorted = blk.sortBy(r => (r._2, r._1))
      sorted.indices.flatMap { i =>
        ((i + 1) until math.min(i + w, sorted.length)).map { j =>
          (sorted(i)._1, sorted(i)._2, sorted(j)._1, sorted(j)._2)
        }
      }
    }.toSet

  test("engine == windowed-sort reference; candidate count bounded by (w-1)*n") {
    val rnd = new scala.util.Random(31L)
    val recs = (1L to 40L).map(k =>
      k -> Seq.fill(6)(('a' + rnd.nextInt(3)).toChar).mkString)
    val got = engine(recs, w = 4, blockLen = 2)
    assert(got == reference(recs, 4, 2))
    assert(got.size <= 3 * recs.size)
    assert(got.forall { case (a, _, b, _) => a != b })
  }

  test("multi-pass recovery: a boundary-straddling match is caught by the second key") {
    // "az" and "bz..." fall in different first-char blocks, so the raw
    // pass misses the pair; the reversed pass blocks them together
    val recs = Seq(1L -> "azkq", 2L -> "bzkq", 3L -> "cxxx")
    val raw = engine(recs, w = 3, blockLen = 1)
    assert(!raw.exists(p => Set(p._1, p._3) == Set(1L, 2L)))
    val rev = engine(recs.map { case (k, v) => k -> v.reverse }, w = 3, blockLen = 1)
    assert(rev.exists(p => Set(p._1, p._3) == Set(1L, 2L)),
      s"reversed pass must pair 1 and 2: $rev")
  }
}
